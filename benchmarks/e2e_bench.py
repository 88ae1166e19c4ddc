"""Composed-pipeline benchmark: real Loader -> H2D -> cooperative step.

bench.py times the step on device-resident batches; data_bench.py times the
loader alone. This drives the REAL pix2pix GCC cooperative step (same
engine/shapes as bench.py) from the REAL Loader over synthetic JPEGs on
disk — decode -> transform -> host->device -> train+arch step, with the
loader's thread pool overlapping the device compute (the per-iter
compute/data split the reference prints, train.py:135-160). The DARTS val
batch is drawn from a second loader every iteration, exactly like
train.py:147-151 — the input pipeline must sustain 2x the step's batch
rate.

Reports sustained img/s, the device-resident step rate measured in the
SAME harness, and loader occupancy (their ratio), for five rungs: the PIL
path, the C++ native engine, the packed zero-decode stream, the HBM
device cache, and the device cache with cli.train's fused one-dispatch
step (materializers traced INTO the cooperative step,
data/device_cache.py:FusedCachedStep). Writes e2e_bench_result.json.

Run: python benchmarks/e2e_bench.py [--smoke] [--batch 128] [--steps 30]
     [--threads N] [--n 384] [--only pil,native,packed,device,fused]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_bench import make_jpegs  # noqa: E402


def build_engine(smoke: bool, batch: int, fused_d: bool = False):
    import jax
    import jax.numpy as jnp
    from gcc_tpu.config import Config
    from gcc_tpu.engines.pix2pix import Pix2PixEngine

    if smoke:
        size, ngf, ndf, tngf, tndf, downs = 32, 4, 4, 8, 8, 5
        student_cfgs = (None, None)
    else:
        size, ngf, ndf, tngf, tndf, downs = 256, 32, 128, 64, 128, 8
        from gcc_tpu.compress import prune_unet
        from gcc_tpu.models.generators import UnetGenerator
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
        fc, cc, _ = prune_unet(params, mode="scale", ngf=ngf,
                               target_budget_g=3.0, tolerance_g=0.1,
                               num_downs=downs, image_size=size)
        student_cfgs = (fc, cc)

    cfg = Config(model="pix2pix", ngf=ngf, ndf=ndf, teacher_ngf=tngf,
                 teacher_ndf=tndf, crop_size=size, num_downs=downs,
                 lambda_L1=100.0, gan_mode="hinge", online_distillation=True,
                 darts_discriminator=True, lambda_content=50.0,
                 lambda_gram=1e4, lr=2e-4, arch_lr=1e-4, batch_size=batch,
                 fused_d_batch=fused_d)
    eng = Pix2PixEngine(cfg, filter_cfgs=student_cfgs[0],
                        channel_cfgs=student_cfgs[1])
    return eng, size


def run(args, root: str, native: bool, packed: bool = False,
        device: bool = False, fused_step: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from gcc_tpu.config import Config
    from gcc_tpu.data import create_dataset
    from gcc_tpu.data.loader import InfiniteLoader
    from gcc_tpu.data.packed import device_normalize

    eng, size = build_engine(args.smoke, args.batch)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    dcfg = Config(model="pix2pix", dataset_mode="aligned", dataroot=root,
                  phase="train", load_size=size + 30, crop_size=size,
                  batch_size=args.batch, num_threads=args.threads,
                  native_loader=native, serial_batches=False)
    if packed or device:
        # offline pack (cli.prepare), then zero-decode uint8 streaming with
        # on-device normalization — the VERDICT r3 #1 path
        from gcc_tpu.data.packed import pack_dataset
        packed_root = root.rstrip("/") + "_packed"
        if not os.path.isfile(os.path.join(packed_root, "gcc_pack.json")):
            t0 = time.perf_counter()
            pack_dataset(dcfg, out_dir=packed_root, num_threads=args.threads)
            print(f"pack time: {time.perf_counter() - t0:.1f}s", flush=True)
        dcfg = dcfg.replace(dataroot=packed_root)
    fstep = None
    if device:
        # HBM-resident store: batches materialize on device, the host ships
        # only crop/flip/index params (data/device_cache.py)
        from gcc_tpu.data.packed import PackedDataset
        from gcc_tpu.data.device_cache import (DeviceCacheLoader,
                                               FusedCachedStep,
                                               InfiniteParams)
        t0 = time.perf_counter()
        train_dcl = DeviceCacheLoader(
            PackedDataset(dcfg, seed=0, out_dtype="uint8"), args.batch,
            dtype=dtype, seed=0)
        val_dcl = DeviceCacheLoader(
            PackedDataset(dcfg, seed=1, out_dtype="uint8"), args.batch,
            dtype=dtype, seed=1)
        print(f"device-cache upload: {time.perf_counter() - t0:.1f}s",
              flush=True)
        if fused_step:
            # cli.train's one-dispatch path: the materializers are traced
            # INTO the cooperative step; per iteration the host ships one
            # packed int32 param matrix per stream (FusedCachedStep)
            fstep = FusedCachedStep(eng, train_dcl, val_dcl)
            train_iter = InfiniteParams(train_dcl)
            val_iter = InfiniteParams(val_dcl)
        else:
            train_iter = InfiniteLoader(train_dcl)
            val_iter = InfiniteLoader(val_dcl)
    else:
        train_iter = InfiniteLoader(create_dataset(dcfg, seed=0,
                                                   prefer_uint8=packed))
        val_iter = InfiniteLoader(create_dataset(dcfg, seed=1,
                                                 prefer_uint8=packed))

    def fetch(it):
        b = next(it)
        if not isinstance(b["A"], np.ndarray):
            return {"A": b["A"], "B": b["B"]}  # device-cache: already there
        if b["A"].dtype == np.uint8:
            return device_normalize({"A": b["A"], "B": b["B"]}, dtype)
        return {"A": jnp.asarray(b["A"], dtype), "B": jnp.asarray(b["B"], dtype)}

    def sync(x):
        return float(jax.tree_util.tree_leaves(x)[0])

    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    # warm: compile + fill loader prefetch. The step-only ceiling batch is
    # a device-resident materialized batch in every mode, so `step_only`
    # stays comparable across rungs.
    if fstep is not None:
        tb = {k: v for k, v in next(iter(train_dcl)).items()
              if k in ("A", "B", "z", "real_img", "lr", "hr")}
        vb = {k: v for k, v in next(iter(val_dcl)).items()
              if k in ("A", "B", "z", "real_img", "lr", "hr")}
    else:
        tb, vb = fetch(train_iter), fetch(val_iter)
    for _ in range(2):
        state, m = eng.train_arch_step(state, tb, vb, 2e-4, 0.9)
    sync(m)

    # --- device-resident rate in the SAME harness (step-only ceiling) ---
    t0 = time.perf_counter()
    for _ in range(max(4, args.steps // 4)):
        state, m = eng.train_arch_step(state, tb, vb, 2e-4, 0.9)
    sync(m)
    step_only = args.batch * max(4, args.steps // 4) \
        / (time.perf_counter() - t0)

    # --- composed: loader -> H2D -> step, overlapped ---
    data_wait = 0.0
    if fstep is not None:
        # one-dispatch path: host prepares one packed param matrix per
        # stream; materialize+train+arch is a single compiled program
        targs, _ = next(train_iter)
        vargs, _ = next(val_iter)
        state, m = fstep.train_arch_step(state, targs, vargs, 2e-4, 0.9,
                                         1e-4)  # compile the fused program
        sync(m)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tf0 = time.perf_counter()
            targs, _ = next(train_iter)
            vargs, _ = next(val_iter)
            data_wait += time.perf_counter() - tf0
            state, m = fstep.train_arch_step(state, targs, vargs, 2e-4,
                                             0.9, 1e-4)
        sync(m)
    else:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tf0 = time.perf_counter()
            tb, vb = fetch(train_iter), fetch(val_iter)
            data_wait += time.perf_counter() - tf0
            state, m = eng.train_arch_step(state, tb, vb, 2e-4, 0.9)
        sync(m)
    dt = time.perf_counter() - t0
    sustained = args.batch * args.steps / dt

    return {
        "native_loader": native,
        "packed": packed,
        "device_cache": device,
        "fused_step": fused_step,
        "sustained_imgs_per_sec": round(sustained, 1),
        "step_only_imgs_per_sec": round(step_only, 1),
        "loader_occupancy": round(sustained / step_only, 3),
        "data_wait_frac": round(data_wait / dt, 3),
        "threads": args.threads,
        "batch": args.batch,
        "steps": args.steps,
        "val_stream": "per-iteration (reference train.py:147-151 => 2x "
                      "decode demand)",
        "cpu_count": os.cpu_count(),
        "backend": jax.default_backend(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--threads", type=int, default=max(4, os.cpu_count()))
    p.add_argument("--n", type=int, default=384, help="synthetic JPEGs")
    p.add_argument("--only", default="",
                   help="comma list of configs to run: pil,native,packed "
                        "(default all); merges into the existing JSON")
    args = p.parse_args()

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch = min(args.batch, 4)
        args.steps = min(args.steps, 4)
        args.n = min(args.n, 16)

    results = []
    with tempfile.TemporaryDirectory() as root:
        jroot = os.path.join(root, "jpegs")
        make_jpegs(jroot, args.n, w=1024 if not args.smoke else 64,
                   h=512 if not args.smoke else 32)
        names = {"pil": (False, False, False, False),
                 "native": (True, False, False, False),
                 "packed": (False, True, False, False),
                 "device": (False, False, True, False),
                 "fused": (False, False, True, True)}
        selected = ([names[k] for k in args.only.split(",") if k]
                    if args.only else list(names.values()))
        for native, packed, device, fused in selected:
            if native:
                from gcc_tpu import native as native_mod
                if not native_mod.available():
                    results.append({"native_loader": True,
                                    "skipped": "engine unavailable"})
                    continue
            r = run(args, jroot, native, packed=packed, device=device,
                    fused_step=fused)
            print(json.dumps(r), flush=True)
            results.append(r)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "e2e_bench_result.json")
    if not args.smoke:
        doc = {"ts": time.time(), "runs": []}
        if args.only and os.path.isfile(out_path):
            with open(out_path) as f:
                doc = json.load(f)
            doc["ts"] = time.time()
            done = {(r.get("native_loader"), r.get("packed", False),
                     r.get("device_cache", False), r.get("fused_step", False))
                    for r in results}
            doc["runs"] = [r for r in doc.get("runs", [])
                           if (r.get("native_loader"), r.get("packed", False),
                               r.get("device_cache", False),
                               r.get("fused_step", False)) not in done]
        doc["runs"].extend(results)
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
