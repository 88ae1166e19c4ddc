"""Serving LATENCY per family: per-call wall time of the pruned student
generator at small batch (interactive serving), complementing the
throughput-at-large-batch numbers in perf_families.py --infer / bench.py
--infer.

Each call is synced to host (a scalar pull — the only reliable sync over
the axon tunnel, see bench.py), so a measured call includes one
host<->device round trip. The harness therefore also measures the
dispatch/RTT floor with a trivial jitted scalar op and reports it
alongside: on a tunnel-attached host the floor is network-dominated and
the on-host latency a TPU-VM user would see is ~(p50 - rtt_floor_p50).

Families/shapes (reference serving surfaces):
  pix2pix  256^2 -> 256^2, 3.0 GMACs pruned U-Net (bench.py's student)
  cyclegan 256^2 -> 256^2, reference horse2zebra cfgs
  sagan    z=128 -> 64^2
  srgan    24^2 -> 96^2 (4x SR)

Run: python benchmarks/serving_latency.py [--batches 1,8] [--calls 30]
Writes benchmarks/serving_latency_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pix2pix_serve(batch):
    """bench.py's pruned 3.0 GMACs student (same construction, bench.py:99-128)."""
    import jax
    import jax.numpy as jnp
    from gcc_tpu.compress import prune_unet
    from gcc_tpu.models.generators import UnetGenerator

    size, ngf, downs = 256, 32, 8
    rng_np = np.random.RandomState(0)
    g_full = UnetGenerator(ngf=ngf, num_downs=downs)
    shapes = jax.eval_shape(
        lambda k: g_full.init({"params": k, "dropout": k},
                              jnp.zeros((1, size, size, 3))),
        jax.random.PRNGKey(0))["params"]
    params = jax.tree_util.tree_map(
        lambda s: (rng_np.rand(*s.shape).astype(np.float32)
                   * np.exp(rng_np.uniform(-6, 2, s.shape[-1])
                            ).astype(np.float32)), shapes)
    fc, cc, _ = prune_unet(params, mode="scale", ngf=ngf, target_budget_g=3.0,
                           tolerance_g=0.1, num_downs=downs, image_size=size)
    g = UnetGenerator(ngf=ngf, num_downs=downs, filter_cfgs=fc,
                      channel_cfgs=cc, use_dropout=False)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    x = jnp.asarray(np.random.RandomState(2).rand(batch, size, size, 3)
                    * 2 - 1, dtype)
    v = g.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x[:1], train=False)
    fn = jax.jit(lambda x: g.apply(v, x, train=False))
    return fn, x


def _family_serve(name, batch):
    import jax
    from perf_families import build_family

    eng, batch_d, _ = build_family(name, batch)
    state = eng.init_state(jax.random.PRNGKey(0))
    key = {"cyclegan": "A", "sagan": "z", "srgan": "lr"}[name]
    x = batch_d[key]
    if name == "cyclegan":
        return (lambda x: eng.generate(state, x, "AtoB")), x
    return (lambda x: eng.generate(state, x)), x


def _measure(fn, x, calls, chain=10, rtt_ms=0.0):
    import jax
    y = fn(x)
    sync = lambda y: float(jax.tree_util.tree_leaves(y)[0].reshape(-1)[0])
    sync(y)
    lat = []
    for _ in range(calls):
        t0 = time.perf_counter()
        sync(fn(x))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    out = {"p50_ms": round(lat[len(lat) // 2], 3),
           "p90_ms": round(lat[int(len(lat) * 0.9)], 3),
           "min_ms": round(lat[0], 3)}
    if chain:
        # device-side per-call latency with the RTT amortized: `chain`
        # async dispatches, ONE sync — (total - rtt_floor) / chain. More
        # reliable than p50-minus-floor when RTT >> device time.
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            y = x
            for _ in range(chain):
                y = fn(x)
            sync(y)
            dt = (time.perf_counter() - t0) * 1e3
            best = dt if best is None else min(best, dt)
        out["chained_per_call_ms"] = round(
            max(0.0, best - rtt_ms) / chain, 3)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8")
    p.add_argument("--calls", type=int, default=30)
    p.add_argument("--families", default="pix2pix,cyclegan,sagan,srgan")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # dispatch/RTT floor: trivial jitted op, same sync protocol
    tiny = jax.jit(lambda a: a + 1.0)
    floor = _measure(tiny, jnp.float32(0.0), args.calls, chain=0)

    out = {"device": str(jax.devices()[0]),
           "rtt_floor": floor, "calls": args.calls,
           "note": ("per-call latency includes one host<->device sync; on "
                    "this tunnel-attached sandbox the floor is network "
                    "RTT — a TPU-VM host sees ~(p50 - rtt_floor.p50_ms)"),
           "families": {}}
    for name in args.families.split(","):
        for batch in [int(b) for b in args.batches.split(",")]:
            fn, x = (_pix2pix_serve(batch) if name == "pix2pix"
                     else _family_serve(name, batch))
            m = _measure(fn, x, args.calls, rtt_ms=floor["min_ms"])
            m["net_of_floor_p50_ms"] = round(
                max(0.0, m["p50_ms"] - floor["p50_ms"]), 3)
            out["families"][f"{name}@b{batch}"] = m
            print(json.dumps({name: {f"b{batch}": m}}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serving_latency_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
