"""HBM-resident dataset cache: the zero-H2D steady-state input path.

The packed pipeline (data/packed.py) already removes per-epoch JPEG decode,
but every batch still crosses host->device. On hosts where that link is the
bottleneck (this sandbox's TPU tunnel measured ~13 MB/s; even PCIe hosts
pay for 2x-batch-rate DARTS streams) the chip idles on transfers. This
module uploads the packed uint8 blobs to device HBM ONCE and materializes
batches entirely on device: the host draws only the randomized transform
parameters (indices / crop offsets / flip bits — a few KB), and one jitted
program does gather -> crop (dynamic_slice) -> flip -> normalize -> cast.

Numerics match the host path: the same LockedRandomState stream drives both
(PackedDataset.sample_params), and the normalize math is device_normalize's
(x/255*2-1, imagenet for 'lr') — float32-exact vs the host formula.

Scope: aligned / unaligned / sa packed stores with uniform item shapes
(PackedDataset.device_cacheable). sr keeps the streaming path (variable HR
shapes + online PIL bicubic). Fits-in-HBM gating is the caller's job
(cli.train auto mode checks total_bytes against the HBM budget).

No reference equivalent: the reference streams every batch through
torch DataLoader + .cuda() copies every iteration (train.py:135-146).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gcc_tpu.data.loader import Loader
from gcc_tpu.data.packed import IMAGENET_MEAN, IMAGENET_STD, PackedDataset


# one upload per (blob file, sharding) per process: the train and DARTS-val
# loaders view the same store, so they share the HBM copy
_BLOB_CACHE: Dict = {}


def _normalize(x, spec, dtype):
    import jax.numpy as jnp
    x = x.astype(jnp.float32) / 255.0
    if spec == "imagenet":
        x = (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) \
            / jnp.asarray(IMAGENET_STD, jnp.float32)
    else:
        x = x * 2.0 - 1.0
    return x.astype(dtype)


class DeviceCacheLoader(Loader):
    """Loader over a device_cacheable PackedDataset with HBM-resident blobs.

    Yields dicts of DEVICE arrays (already normalized to `dtype`) plus the
    host-side *_paths lists. Epoch keying, shuffle and batch order are
    inherited from Loader; the per-item rng stream is the dataset's own
    (sample_params), so a given (seed, epoch, index order) produces the
    same pixels as the streaming path.

    mesh: optional jax.sharding.Mesh — blobs are replicated across it and
    batches come out sharded on the data axis, so multi-chip training reads
    its shards over ICI instead of host links.
    """

    def __init__(self, dataset: PackedDataset, batch_size: int,
                 dtype=None, mesh=None, data_axis: str = "data", **kw):
        import jax
        import jax.numpy as jnp
        if not isinstance(dataset, PackedDataset) \
                or not dataset.device_cacheable():
            raise ValueError("DeviceCacheLoader needs a device_cacheable "
                             "PackedDataset (uniform item shapes, "
                             "aligned/unaligned/sa)")
        super().__init__(dataset, batch_size, **kw)
        self.dtype = dtype or (jnp.float32 if jax.default_backend() == "cpu"
                               else jnp.bfloat16)
        self.mesh = mesh
        shapes = dataset.uniform_shapes()
        sharding = None
        self._out_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(mesh, P())
            self._out_sharding = NamedSharding(mesh, P(data_axis))
        self._data = {}
        for key, (h, w, c) in shapes.items():
            mm = dataset._mm[key]
            ck = (getattr(mm, "filename", None), (h, w, c), str(sharding))
            cached = _BLOB_CACHE.get(ck)
            if cached is None or cached.is_deleted():
                cached = jax.device_put(
                    np.asarray(mm).reshape(-1, h, w, c), sharding)
                if ck[0] is not None:
                    _BLOB_CACHE[ck] = cached
            self._data[key] = cached
        self._fns: Dict = {}

    # -- jitted materializers (keyed by batch size) ------------------------
    def _fn(self, n: int):
        import jax
        import jax.numpy as jnp
        from functools import partial
        if n in self._fns:
            return self._fns[n]
        ds, cfg = self.dataset, self.dataset.cfg
        cs, dtype = int(cfg.crop_size), self.dtype
        mode = ds.mode
        shapes = ds.uniform_shapes()

        def crop_flip(data, j, x, y, flip, do_crop):
            img = data[j]  # (n, h, w, c) gather
            if do_crop:
                img = jax.vmap(lambda im, yy, xx: jax.lax.dynamic_slice(
                    im, (yy, xx, 0), (cs, cs, im.shape[-1])))(img, y, x)
            return jnp.where(flip[:, None, None, None], img[:, :, ::-1], img)

        if mode == "aligned":
            h, w, _ = shapes["A"]
            do_crop = "crop" in cfg.preprocess and (h > cs or w > cs)

            def fn(dA, dB, j, x, y, flip):
                return {"A": _normalize(crop_flip(dA, j, x, y, flip,
                                                  do_crop), "m11", dtype),
                        "B": _normalize(crop_flip(dB, j, x, y, flip,
                                                  do_crop), "m11", dtype)}
        elif mode == "unaligned":
            do = {k: "crop" in cfg.preprocess
                  and (shapes[k][0] > cs or shapes[k][1] > cs)
                  for k in ("A", "B")}

            def fn(dA, dB, jA, xA, yA, fA, jB, xB, yB, fB):
                return {"A": _normalize(crop_flip(dA, jA, xA, yA, fA,
                                                  do["A"]), "m11", dtype),
                        "B": _normalize(crop_flip(dB, jB, xB, yB, fB,
                                                  do["B"]), "m11", dtype)}
        else:  # sa

            def fn(dR, j, z):
                return {"real_img": _normalize(dR[j], "m11", dtype),
                        "z": z}

        jfn = (jax.jit(fn) if self._out_sharding is None
               else jax.jit(fn, out_shardings=self._out_sharding))
        self._fns[n] = jfn
        return jfn

    def _device_batch(self, idx_batch) -> Dict:
        import jax.numpy as jnp
        ds = self.dataset
        params = [ds.sample_params(int(i)) for i in idx_batch]
        n = len(params)
        i32 = lambda v: jnp.asarray(np.asarray(v, np.int32))  # noqa: E731
        b1 = lambda v: jnp.asarray(np.asarray(v, bool))  # noqa: E731
        if ds.mode == "aligned":
            j, x, y, flip = (np.array(t) for t in zip(*params))
            out = self._fn(n)(self._data["A"], self._data["B"],
                              i32(j), i32(x), i32(y), b1(flip))
            paths = [ds._paths["A"][int(v)] for v in j]
            out["A_paths"], out["B_paths"] = paths, list(paths)
        elif ds.mode == "unaligned":
            pA = np.array([p[0] for p in params])
            pB = np.array([p[1] for p in params])
            out = self._fn(n)(self._data["A"], self._data["B"],
                              i32(pA[:, 0]), i32(pA[:, 1]), i32(pA[:, 2]),
                              b1(pA[:, 3]),
                              i32(pB[:, 0]), i32(pB[:, 1]), i32(pB[:, 2]),
                              b1(pB[:, 3]))
            out["A_paths"] = [ds._paths["A"][int(v)] for v in pA[:, 0]]
            out["B_paths"] = [ds._paths["B"][int(v)] for v in pB[:, 0]]
        else:  # sa
            j = np.array([p[0] for p in params])
            z = jnp.asarray(np.stack([p[1] for p in params]))
            out = self._fn(n)(self._data["real"], i32(j), z)
            out["img_path"] = [ds._paths["real"][int(v)] for v in j]
        return out

    def __iter__(self):
        for b in self._index_batches():
            yield self._device_batch(b)
