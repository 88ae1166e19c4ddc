"""Diagnose the fused one-dispatch step's slowdown (e2e_bench fused rung).

r5 measured the FusedCachedStep program at 136 img/s vs 211 for the same
work issued as separate dispatches (materialize, train, arch) — a 1.55x
device-time regression that the lax.optimization_barrier fix did NOT
recover, plus a pathologically long XLA compile. This probe separates the
hypotheses:

  A. duplicated COMPUTE: XLA re-materializes producers per consumer
     despite the barrier -> compiled FLOPs(fused) > FLOPs(parts).
  B. duplicated/extra BYTES: layout changes, copies, un-fused transposes
     -> bytes accessed(fused) >> bytes(parts) at equal FLOPs.
  C. scheduling: equal FLOPs+bytes, time lost anyway (profile shows the
     same fusions, each slower, or serialization gaps).

Method: build the e2e engine + device-cache loaders exactly like
e2e_bench's fused rung, AOT-compile (1) the standalone materializer,
(2) the engine train+arch jits, (3) the fused program; print compile
times and XLA cost analysis (flops, bytes accessed) for each; then (on
request, --time) time and profile N steps of fused vs unfused and dump
the top device ops from the profiler trace.

Run:  python benchmarks/fused_step_diag.py --smoke --cpu   (structure)
      python benchmarks/fused_step_diag.py --time          (on the chip)
Writes benchmarks/fused_step_diag_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bench import make_jpegs  # noqa: E402
from e2e_bench import build_engine  # noqa: E402


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return {"gflops": round(ca.get("flops", 0.0) / 1e9, 2),
            "gbytes": round(ca.get("bytes accessed", 0.0) / 1e9, 3)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--time", action="store_true",
                   help="also time + profile fused vs unfused on device")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fused_step_diag_result.json"))
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gcc_tpu.config import Config
    from gcc_tpu.data.packed import pack_dataset
    from gcc_tpu.data.packed import PackedDataset
    from gcc_tpu.data.device_cache import (DeviceCacheLoader,
                                           FusedCachedStep, InfiniteParams)

    if args.smoke and args.batch == 128:
        args.batch = 8
    eng, size = build_engine(args.smoke, args.batch)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    tmp = tempfile.mkdtemp(prefix="fused_diag_")
    root = os.path.join(tmp, "jpegs")
    n_imgs = 48 if args.smoke else 384
    make_jpegs(root, n_imgs, w=64 if args.smoke else 1024,
               h=32 if args.smoke else 512)
    dcfg = Config(model="pix2pix", dataset_mode="aligned", dataroot=root,
                  phase="train", load_size=size + 30, crop_size=size,
                  batch_size=args.batch, num_threads=2,
                  serial_batches=False)
    packed_root = root + "_packed"
    pack_dataset(dcfg, out_dir=packed_root, num_threads=2)
    dcfg = dcfg.replace(dataroot=packed_root)
    train_dcl = DeviceCacheLoader(PackedDataset(dcfg, seed=0,
                                                out_dtype="uint8"),
                                  args.batch, dtype=dtype, seed=0)
    val_dcl = DeviceCacheLoader(PackedDataset(dcfg, seed=1,
                                              out_dtype="uint8"),
                                args.batch, dtype=dtype, seed=1)

    res = {"smoke": args.smoke, "batch": args.batch,
           "backend": jax.default_backend(), "programs": {}}

    # ---- parts -------------------------------------------------------
    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    tb = {k: v for k, v in next(iter(train_dcl)).items()
          if k in ("A", "B")}
    vb = {k: v for k, v in next(iter(val_dcl)).items()
          if k in ("A", "B")}

    mat = train_dcl._fn(args.batch)
    targs0, _ = next(InfiniteParams(train_dcl))
    t0 = time.perf_counter()
    mat_c = mat.lower(train_dcl._data, *targs0).compile()
    res["programs"]["materializer"] = {
        "compile_s": round(time.perf_counter() - t0, 1), **cost(mat_c)}
    print("materializer:", res["programs"]["materializer"], flush=True)

    t0 = time.perf_counter()
    tr_c = eng._jit_train.lower(state, tb, jnp.float32(2e-4)).compile()
    res["programs"]["train_step"] = {
        "compile_s": round(time.perf_counter() - t0, 1), **cost(tr_c)}
    print("train_step:", res["programs"]["train_step"], flush=True)

    t0 = time.perf_counter()
    ar_c = eng._jit_arch.lower(state, vb, jnp.float32(0.9),
                               jnp.float32(1e-4)).compile()
    res["programs"]["arch_step"] = {
        "compile_s": round(time.perf_counter() - t0, 1), **cost(ar_c)}
    print("arch_step:", res["programs"]["arch_step"], flush=True)

    # ---- fused -------------------------------------------------------
    fstep = FusedCachedStep(eng, train_dcl, val_dcl)
    vargs0, _ = next(InfiniteParams(val_dcl))
    t0 = time.perf_counter()
    fu_c = fstep.jit.lower(state, train_dcl._data, val_dcl._data, targs0,
                           vargs0, jnp.float32(2e-4), jnp.float32(0.9),
                           jnp.float32(1e-4)).compile()
    res["programs"]["fused"] = {
        "compile_s": round(time.perf_counter() - t0, 1), **cost(fu_c)}
    print("fused:", res["programs"]["fused"], flush=True)

    parts = res["programs"]
    sum_gf = (2 * parts["materializer"]["gflops"] + parts["train_step"]
              ["gflops"] + parts["arch_step"]["gflops"])
    sum_gb = (2 * parts["materializer"]["gbytes"] + parts["train_step"]
              ["gbytes"] + parts["arch_step"]["gbytes"])
    res["flops_ratio_fused_vs_parts"] = round(
        parts["fused"]["gflops"] / max(sum_gf, 1e-9), 3)
    res["bytes_ratio_fused_vs_parts"] = round(
        parts["fused"]["gbytes"] / max(sum_gb, 1e-9), 3)
    print(f"flops ratio {res['flops_ratio_fused_vs_parts']}  "
          f"bytes ratio {res['bytes_ratio_fused_vs_parts']}", flush=True)

    # ---- optional device timing + profile ----------------------------
    if args.time:
        def sync(x):
            return float(jax.tree_util.tree_leaves(x)[0])

        ti = InfiniteParams(train_dcl)
        vi = InfiniteParams(val_dcl)
        holder = {"s": state}

        def unfused_step():
            targs, _ = next(ti)
            vargs, _ = next(vi)
            tbb = dict(mat(train_dcl._data, *targs))
            vbb = dict(val_dcl._fn(args.batch)(val_dcl._data, *vargs))
            holder["s"], m = eng.train_arch_step(holder["s"], tbb, vbb,
                                                 2e-4, 0.9)
            return m

        def fused_step():
            targs, _ = next(ti)
            vargs, _ = next(vi)
            holder["s"], m = fstep.train_arch_step(holder["s"], targs,
                                                   vargs, 2e-4, 0.9, 1e-4)
            return m

        for name, fn in (("unfused", unfused_step), ("fused", fused_step)):
            sync(fn())  # warm (compiles cached from AOT? jit re-traces ok)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                m = fn()
            sync(m)
            dt = time.perf_counter() - t0
            res.setdefault("timing", {})[name] = {
                "ms_per_step": round(1e3 * dt / args.steps, 1),
                "imgs_per_sec": round(args.batch * args.steps / dt, 1)}
            print(name, res["timing"][name], flush=True)

            tdir = os.path.join(tmp, f"trace_{name}")
            from sagan_arch_fusions import _trace_top_ops
            with jax.profiler.trace(tdir):
                for _ in range(3):
                    m = fn()
                sync(m)
            res.setdefault("top_ops", {})[name] = _trace_top_ops(tdir, 14)
            for row in res["top_ops"][name][:14]:
                print("   ", row, flush=True)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
