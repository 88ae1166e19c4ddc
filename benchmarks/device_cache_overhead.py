"""Decompose the device-cache e2e residual (189 vs 210 img/s, e2e_bench).

e2e_bench's device-cache rung leaves a ~10% gap to the device-resident
step and attributes it loosely to "materializer time + extra dispatches".
This probe measures each suspect separately on the live backend:

  1. step-only rate (device-resident batches)        -- the ceiling
  2. composed rate (fetch train + fetch val + step)  -- the e2e number
  3. host param draw (sample_params python loop)     -- pure host
  4. small-array upload round trips (jnp.asarray of the 4 param arrays)
  5. materializer dispatch (params pre-uploaded)
  6. single packed-upload variant (one (n,4) int32 instead of 4 arrays)

Writes benchmarks/device_cache_overhead_result.json.

Run: python benchmarks/device_cache_overhead.py [--smoke] [--batch 128]
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
from e2e_bench import build_engine  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--n", type=int, default=384)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch = min(args.batch, 4)
        args.steps = min(args.steps, 4)
        args.n = min(args.n, 16)
    from gcc_tpu.config import Config
    from gcc_tpu.data.device_cache import DeviceCacheLoader
    from gcc_tpu.data.loader import InfiniteLoader
    from gcc_tpu.data.packed import PackedDataset, pack_dataset

    eng, size = build_engine(args.smoke, args.batch)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    tmp = tempfile.mkdtemp(prefix="dco_")
    root = os.path.join(tmp, "jpegs")
    make_jpegs(root, n=args.n, w=1024 if not args.smoke else 64,
               h=512 if not args.smoke else 32)
    dcfg = Config(model="pix2pix", dataset_mode="aligned", dataroot=root,
                  phase="train", load_size=size + 30, crop_size=size,
                  batch_size=args.batch, num_threads=4)
    packed_root = root + "_packed"
    pack_dataset(dcfg, out_dir=packed_root, num_threads=4)
    dcfg = dcfg.replace(dataroot=packed_root)

    train_loader = DeviceCacheLoader(PackedDataset(dcfg, seed=0,
                                                   out_dtype="uint8"),
                                     args.batch, dtype=dtype, seed=0)
    val_loader = DeviceCacheLoader(PackedDataset(dcfg, seed=1,
                                                 out_dtype="uint8"),
                                   args.batch, dtype=dtype, seed=1)
    train_iter, val_iter = InfiniteLoader(train_loader), \
        InfiniteLoader(val_loader)

    def sync(x):
        return float(jax.tree_util.tree_leaves(x)[0])

    state = eng.init_state(jax.random.PRNGKey(0), image_size=size)
    tb, vb = next(train_iter), next(val_iter)
    tb = {k: v for k, v in tb.items() if not k.endswith("_paths")}
    vb = {k: v for k, v in vb.items() if not k.endswith("_paths")}
    for _ in range(2):
        state, m = eng.train_arch_step(state, tb, vb, 2e-4, 0.9)
    sync(m)
    res = {"batch": args.batch, "backend": jax.default_backend()}
    N = args.steps

    # 1. step-only ceiling
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = eng.train_arch_step(state, tb, vb, 2e-4, 0.9)
    sync(m)
    res["step_only_ms"] = (time.perf_counter() - t0) / N * 1e3

    # 2. composed
    t0 = time.perf_counter()
    for _ in range(N):
        tb2, vb2 = next(train_iter), next(val_iter)
        tb2 = {k: v for k, v in tb2.items() if not k.endswith("_paths")}
        vb2 = {k: v for k, v in vb2.items() if not k.endswith("_paths")}
        state, m = eng.train_arch_step(state, tb2, vb2, 2e-4, 0.9)
    sync(m)
    res["composed_ms"] = (time.perf_counter() - t0) / N * 1e3

    # 3. host param draw only
    ds = train_loader.dataset
    t0 = time.perf_counter()
    for it in range(N):
        _ = [ds.sample_params(i % len(ds)) for i in range(args.batch * 2)]
    res["param_draw_ms"] = (time.perf_counter() - t0) / N * 1e3

    # 4. upload round trips: the 8 small arrays the loader ships per iter
    j = np.arange(args.batch, dtype=np.int32)
    f = np.zeros(args.batch, bool)
    t0 = time.perf_counter()
    for _ in range(N):
        outs = [jnp.asarray(a) for a in (j, j, j, f, j, j, j, f)]
    jax.block_until_ready(outs)
    res["uploads_8x_ms"] = (time.perf_counter() - t0) / N * 1e3

    # 6-pre. single packed upload (hypothesis: 1 round trip beats 8)
    packed = np.stack([j, j, j, j.astype(np.int32)], 1)  # (n, 4) int32
    both = np.stack([packed, packed])                     # (2, n, 4)
    t0 = time.perf_counter()
    for _ in range(N):
        out = jnp.asarray(both)
    jax.block_until_ready(out)
    res["upload_packed_1x_ms"] = (time.perf_counter() - t0) / N * 1e3

    # 5. materializer dispatch with pre-uploaded params
    i32 = lambda v: jnp.asarray(np.asarray(v, np.int32))  # noqa: E731
    b1 = lambda v: jnp.asarray(np.asarray(v, bool))  # noqa: E731
    params = [ds.sample_params(i) for i in range(args.batch)]
    ja, x, y, fl = (np.array(t) for t in zip(*params))
    dj, dx, dy, dfl = i32(ja), i32(x), i32(y), b1(fl)
    fn = train_loader._fn(args.batch)
    out = fn(train_loader._data["A"], train_loader._data["B"],
             dj, dx, dy, dfl)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(train_loader._data["A"], train_loader._data["B"],
                 dj, dx, dy, dfl)
    jax.block_until_ready(out)
    res["materialize_dispatch_ms"] = (time.perf_counter() - t0) / N * 1e3

    # derived attribution
    res["gap_ms"] = round(res["composed_ms"] - res["step_only_ms"], 3)
    res["per_iter_host_side"] = {
        "param_draw_2x": round(res["param_draw_ms"], 3),
        "uploads": round(res["uploads_8x_ms"], 3),
        "materialize_2x": round(res["materialize_dispatch_ms"] * 2, 3),
    }
    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "device_cache_overhead_result.json")
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
