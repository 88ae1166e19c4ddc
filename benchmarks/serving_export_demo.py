"""Prove the StableHLO serving artifact on real TPU hardware.

Exports the flagship pruned pix2pix student (bench.py's exact 3.0 GMACs
cfg at 256^2) as a bf16 serving artifact, then — in the same process but
through ONLY the jax.export surface (no engine, no flax apply) — runs it on
the chip and checks it against engine.generate. Records artifact size and
a small chained-dispatch throughput number for the artifact path.

Also exports the int8 weight-only variant (--quantize int8 in cli.export:
per-output-channel int8 kernels + scales baked in, dequantized inside the
artifact) and records its size ratio, output PSNR vs the engine, and the
same throughput number on the chip.

Run: python benchmarks/serving_export_demo.py
Writes benchmarks/serving_export_result.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from memory_budget import build_pix2pix
    from gcc_tpu.utils import hlo_export as hx

    eng, _, _ = build_pix2pix(batch=1)
    state = eng.init_state(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    exp = hx.export_generator(eng, state, (1, 256, 256, 3),
                              platforms=("cpu", "tpu"),
                              dtype=jnp.bfloat16)
    data = bytes(exp.serialize())
    t_export = time.perf_counter() - t0

    g = jexport.deserialize(bytearray(data))
    call = jax.jit(g.call)  # jit so repeated calls hit the executable cache

    rng = np.random.RandomState(0)
    batch = 8
    x = jnp.asarray(rng.rand(batch, 256, 256, 3) * 2 - 1, jnp.bfloat16)
    y = call(x)
    _ = float(y.reshape(-1)[0])  # tunnel-safe sync
    ref = eng.generate(state, x)
    err = float(jnp.abs(y.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            y = call(x)
        _ = float(y.reshape(-1)[0])
        times.append(time.perf_counter() - t0)
    ips = batch * 10 / min(times)

    # int8 weight-only variant through the same export-only surface
    exp_q = hx.export_generator(eng, state, (1, 256, 256, 3),
                                platforms=("cpu", "tpu"),
                                dtype=jnp.bfloat16, weight_quant="int8")
    data_q = bytes(exp_q.serialize())
    gq = jexport.deserialize(bytearray(data_q))
    call_q = jax.jit(gq.call)
    yq = call_q(x)
    _ = float(yq.reshape(-1)[0])
    diff = yq.astype(jnp.float32) - ref.astype(jnp.float32)
    err_q = float(jnp.abs(diff).max())
    mse_q = float(jnp.mean(diff * diff))
    psnr_q = round(10 * float(np.log10(4.0 / mse_q)), 1) if mse_q else None
    times_q = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            yq = call_q(x)
        _ = float(yq.reshape(-1)[0])
        times_q.append(time.perf_counter() - t0)
    ips_q = batch * 10 / min(times_q)

    out = {
        "model": "pix2pix student (3.0 GMACs cfg, 256^2)",
        "dtype": "bfloat16",
        "platforms": list(g.platforms),
        "artifact_mb": round(len(data) / 1e6, 2),
        "export_seconds": round(t_export, 1),
        "symbolic_batch_served": batch,
        "max_abs_err_vs_engine": err,
        "artifact_imgs_per_sec_b8": round(ips, 1),
        "int8": {
            "artifact_mb": round(len(data_q) / 1e6, 2),
            "size_ratio_vs_bf16": round(len(data_q) / len(data), 3),
            "max_abs_err_vs_engine": err_q,
            "psnr_vs_engine_db": psnr_q,
            "artifact_imgs_per_sec_b8": round(ips_q, 1),
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serving_export_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
