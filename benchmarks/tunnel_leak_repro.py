"""Minimal repro for the host-RSS growth seen in benchmarks/soak.py.

Every host->device transfer through the axon TPU-tunnel client retains its
host-side mirror even after the jax array is deleted: 30 fresh ~100 MB
`jnp.asarray` transfers grow this process's RSS by ~96 MB each (measured:
169 MB -> 3.2 GB), while device HBM and step time stay flat. The train
loop, loader, and engines hold no references (this repro has none at all),
so the soak's linear RSS growth (~1.8 MB per image = one A+B float32 pair
+ the DARTS val stream) is tunnel-client-side, not framework-side; it does
not exist on a real TPU-VM host (no tunnel). Run under the axon tunnel:

    python benchmarks/tunnel_leak_repro.py
"""
import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)
    f = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
    print(f"start rss={rss_mb()}MB", flush=True)
    base = np.random.RandomState(0).rand(128, 256, 256, 3).astype(np.float32)
    for i in range(30):
        host = base + np.float32(i)      # fresh ~100MB host buffer
        dev = jnp.asarray(host)
        s = float(f(dev))                # sync
        del dev, host
        if i % 5 == 0:
            print(f"iter {i} rss={rss_mb()}MB sum={s:.3e}", flush=True)
    print(f"done rss={rss_mb()}MB", flush=True)


if __name__ == "__main__":
    main()
