"""Dataset registry + loader factories (data/__init__.py:18-91).

`dataset_mode` strings map to classes; `synthetic` (or a missing/empty
dataroot) selects procedural data so the pipeline runs without downloads.

create_split_dataset mirrors the reference contract of returning
(train, val) loaders built from the same config (data/__init__.py:52-58 —
the reference's "split" is two loaders over the SAME data unless the dataset
honors split_dataset); the val loader gets a different shuffle seed so the
darts arch step sees differently-ordered batches, as the torch version's
independent DataLoader shuffling does.
"""

from __future__ import annotations

import os

from gcc_tpu.data.datasets import (
    AlignedDataset, SADataset, SRDataset, SyntheticDataset, UnalignedDataset,
)
from gcc_tpu.data.loader import InfiniteLoader, Loader
from gcc_tpu.data.packed import PackedDataset, is_packed_root, pack_dataset

DATASETS = {
    "aligned": AlignedDataset,
    "unaligned": UnalignedDataset,
    "sa": SADataset,
    "sr": SRDataset,
    "synthetic": SyntheticDataset,
}


def find_dataset_using_name(name: str):
    if name not in DATASETS:
        raise NotImplementedError(
            f"dataset mode [{name}] is not implemented "
            f"(available: {sorted(DATASETS)})")
    return DATASETS[name]


def build_dataset(cfg, seed: int = 0, prefer_uint8: bool = False, **kw):
    mode = cfg.dataset_mode
    if mode != "synthetic" and is_packed_root(cfg.dataroot):
        # packed roots (cli.prepare output) are self-describing: zero-decode
        # streaming with the randomized transform remainder online
        return PackedDataset(
            cfg, seed=seed,
            out_dtype="uint8" if prefer_uint8 else "float32", **kw)
    if mode != "synthetic" and (not cfg.dataroot
                                or not os.path.isdir(cfg.dataroot)):
        raise FileNotFoundError(
            f"dataroot [{cfg.dataroot}] does not exist; pass a valid "
            f"--dataroot or use --dataset_mode synthetic")
    return find_dataset_using_name(mode)(cfg, seed=seed, **kw)


def create_dataset(cfg, seed: int = 0, drop_last: bool = False,
                   prefer_uint8: bool = False) -> Loader:
    ds = build_dataset(cfg, seed=seed, prefer_uint8=prefer_uint8)
    return Loader(ds, cfg.batch_size, shuffle=not cfg.serial_batches,
                  num_threads=cfg.num_threads, prefetch=cfg.prefetch,
                  seed=seed, drop_last=drop_last)


def _maybe_device_cache(ds, cfg, seed, drop_last, mesh, logger):
    """Upgrade a packed loader to the HBM-resident path (device_cache.py)
    when --device_cache allows it. Returns None to keep streaming."""
    mode = getattr(cfg, "device_cache", "auto")
    if mode == "off" or not isinstance(ds, PackedDataset):
        return None
    log = logger.info if logger else (lambda *_: None)
    if not ds.device_cacheable():
        if mode == "on":
            raise ValueError(
                "--device_cache on: this packed store is not device-"
                "cacheable (needs uniform item shapes; aligned/unaligned/"
                "sa modes)")
        return None
    import jax
    from gcc_tpu.data.device_cache import DeviceCacheLoader
    from gcc_tpu.utils.memory_guard import device_hbm_bytes
    n_bytes = ds.total_bytes()
    if mode == "auto":
        if jax.default_backend() == "cpu":
            return None
        hbm, _ = device_hbm_bytes()
        if n_bytes > 0.25 * hbm:
            log(f"device_cache auto: store is {n_bytes / 1e9:.2f} GB "
                f"(> 25% of {hbm / 1e9:.1f} GB HBM); keeping the "
                f"streaming path")
            return None
    import jax.numpy as jnp
    dtype = (jnp.bfloat16 if getattr(cfg, "compute_dtype", "bfloat16")
             == "bfloat16" and jax.default_backend() != "cpu"
             else jnp.float32)
    log(f"device_cache: {n_bytes / 1e6:.0f} MB packed store resident in "
        f"device memory; batches materialize on device (zero steady-state "
        f"host->device traffic)")
    return DeviceCacheLoader(
        ds, cfg.batch_size, dtype=dtype, mesh=mesh,
        data_axis=getattr(cfg, "data_axis", "data"),
        shuffle=not cfg.serial_batches, seed=seed, drop_last=drop_last)


def create_split_dataset(cfg, seed: int = 0, mesh=None, logger=None):
    # drop_last keeps train batch shapes static: one compiled step, no
    # retrace on a ragged final batch (the torch loader pays that cost).
    # prefer_uint8: the train entry normalizes on device (cli/train.py
    # set_input), so packed data ships 4x fewer host->device bytes.
    # device_cache (auto): packed stores that fit in HBM skip the host
    # entirely (data/device_cache.py).
    drop_last = cfg.batch_size > 1
    loaders = []
    for s in (seed, seed + 1):
        ds = build_dataset(cfg, seed=s, prefer_uint8=True)
        dl = _maybe_device_cache(ds, cfg, s, drop_last, mesh, logger)
        loaders.append(dl if dl is not None else Loader(
            ds, cfg.batch_size, shuffle=not cfg.serial_batches,
            num_threads=cfg.num_threads, prefetch=cfg.prefetch,
            seed=s, drop_last=drop_last))
    return loaders[0], loaders[1]
