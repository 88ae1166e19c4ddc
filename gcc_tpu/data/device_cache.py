"""HBM-resident dataset cache: the zero-H2D steady-state input path.

The packed pipeline (data/packed.py) already removes per-epoch JPEG decode,
but every batch still crosses host->device. On hosts where that link is the
bottleneck (this sandbox's TPU tunnel measured ~13 MB/s; even PCIe hosts
pay for 2x-batch-rate DARTS streams) the chip idles on transfers. This
module uploads the packed uint8 blobs to device HBM ONCE and materializes
batches entirely on device: the host draws only the randomized transform
parameters (indices / crop offsets / flip bits — a few KB), and one jitted
program does gather -> crop+flip (row/col index gathers) -> normalize ->
cast.

Two consumption modes:

- **DeviceCacheLoader** iterates device batches: per batch, ONE packed
  int32 parameter upload + ONE materializer dispatch. (Round trips, not
  bytes, are the cost on link-latency-bound hosts — the packed matrix
  replaces what used to be four separate index/offset/flip uploads.)
- **FusedCachedStep** goes further for training: the materializers for the
  train batch AND the DARTS val batch are traced INTO the engine's
  cooperative step, so a full GCC iteration is ONE dispatch with one small
  host->device parameter transfer (benchmarks/device_cache_overhead.py
  measures the per-round-trip cost this removes).

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

from typing import Dict, Optional, Tuple

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

    # -- packed transform parameters ---------------------------------------
    def param_batch(self, idx_batch) -> Tuple[tuple, Dict]:
        """Draw the batch's randomized transform parameters as ONE packed
        int32 matrix (plus the float32 z for sa) and the host-side paths.

        Returns (device_args, paths): device_args feeds traced_fn()/the
        per-batch jit as a single small transfer — on link-latency-bound
        hosts the per-transfer round trip, not the bytes, is the cost, so
        the matrix replaces the four (eight for unaligned) per-batch
        uploads the first version of this loader shipped."""
        ds = self.dataset
        params = [ds.sample_params(int(i)) for i in idx_batch]
        if ds.mode == "aligned":
            pm = np.array([(j, x, y, int(f)) for j, x, y, f in params],
                          np.int32).reshape(len(params), 4)
            paths = [ds._paths["A"][int(r)] for r in pm[:, 0]]
            return (pm,), {"A_paths": paths, "B_paths": list(paths)}
        if ds.mode == "unaligned":
            pm = np.array([(*a[:3], int(a[3]), *b[:3], int(b[3]))
                           for a, b in params],
                          np.int32).reshape(len(params), 8)
            return (pm,), {
                "A_paths": [ds._paths["A"][int(r)] for r in pm[:, 0]],
                "B_paths": [ds._paths["B"][int(r)] for r in pm[:, 4]]}
        # sa
        pm = np.array([(p[0],) for p in params], np.int32)
        z = np.stack([p[1] for p in params]).astype(np.float32)
        return (pm, z), {"img_path": [ds._paths["real"][int(r)]
                                      for r in pm[:, 0]]}

    # -- pure materializer ---------------------------------------------------
    def traced_fn(self):
        """Pure function (data_dict, pm[, z]) -> engine batch dict.

        Traceable inside a larger jit (FusedCachedStep) or jitted alone
        (_fn). When the loader has a mesh, outputs carry a
        with_sharding_constraint on the data axis so XLA SPMD reads shards
        over ICI."""
        import jax
        import jax.numpy as jnp
        ds, cfg = self.dataset, self.dataset.cfg
        cs, dtype, mode = int(cfg.crop_size), self.dtype, ds.mode
        shapes = ds.uniform_shapes()
        constraint = self._out_sharding

        def finish(b):
            if constraint is None:
                return b
            return {k: jax.lax.with_sharding_constraint(v, constraint)
                    for k, v in b.items()}

        def crop_flip(data, j, x, y, flip, do_crop):
            img = data[j]  # (n, h, w, c) gather
            if not do_crop:
                return jnp.where(flip[:, None, None, None],
                                 img[:, :, ::-1], img)
            # Crop+flip as row/col index gathers (take_along_axis), NOT
            # vmap(dynamic_slice): the latter lowers to a sequential while
            # loop building the batch via dynamic-update-slice, and inside
            # a larger jit (FusedCachedStep) XLA loses the loop carry's
            # in-place aliasing and copies the whole batch buffer once per
            # image — measured 6x the standalone materializer cost, -28%
            # end-to-end (benchmarks/fused_step_diag.py, r5). Index gathers
            # carry no loop state and fuse cleanly; elements are identical
            # (the flip folds into the column indices: cropped-then-flipped
            # [i, k] = im[y+i, x+cs-1-k]).
            ar = jnp.arange(cs, dtype=jnp.int32)
            iy = y[:, None].astype(jnp.int32) + ar
            img = jnp.take_along_axis(img, iy[:, :, None, None], axis=1)
            ix = x[:, None].astype(jnp.int32) + jnp.where(
                flip[:, None], cs - 1 - ar, ar)
            return jnp.take_along_axis(img, ix[:, None, :, None], axis=2)

        if mode == "aligned":
            h, w, _ = shapes["A"]
            do_crop = "crop" in cfg.preprocess and (h > cs or w > cs)

            def fn(data, pm):
                j, x, y = pm[:, 0], pm[:, 1], pm[:, 2]
                flip = pm[:, 3].astype(bool)
                return finish({
                    "A": _normalize(crop_flip(data["A"], j, x, y, flip,
                                              do_crop), "m11", dtype),
                    "B": _normalize(crop_flip(data["B"], j, x, y, flip,
                                              do_crop), "m11", dtype)})
        elif mode == "unaligned":
            do = {k: "crop" in cfg.preprocess
                  and (shapes[k][0] > cs or shapes[k][1] > cs)
                  for k in ("A", "B")}

            def fn(data, pm):
                fA, fB = pm[:, 3].astype(bool), pm[:, 7].astype(bool)
                return finish({
                    "A": _normalize(crop_flip(data["A"], pm[:, 0], pm[:, 1],
                                              pm[:, 2], fA, do["A"]),
                                    "m11", dtype),
                    "B": _normalize(crop_flip(data["B"], pm[:, 4], pm[:, 5],
                                              pm[:, 6], fB, do["B"]),
                                    "m11", dtype)})
        else:  # sa

            def fn(data, pm, z):
                return finish({
                    "real_img": _normalize(data["real"][pm[:, 0]],
                                           "m11", dtype),
                    "z": z})
        return fn

    def _fn(self, n: int):
        """Jitted standalone materializer, cached per batch size."""
        import jax
        if n not in self._fns:
            self._fns[n] = jax.jit(self.traced_fn())
        return self._fns[n]

    def _device_batch(self, idx_batch) -> Dict:
        dargs, paths = self.param_batch(idx_batch)
        out = dict(self._fn(len(idx_batch))(self._data, *dargs))
        out.update(paths)
        return out

    def __iter__(self):
        for b in self._index_batches():
            yield self._device_batch(b)

    def iter_param_batches(self):
        """Epoch stream of (device_args, paths) — the FusedCachedStep input
        (same shuffle/rng stream as __iter__, no materializer dispatch)."""
        for b in self._index_batches():
            yield self.param_batch(b)


class InfiniteParams:
    """Endless param-batch stream over a DeviceCacheLoader (the fused-path
    analogue of loader.InfiniteLoader for the DARTS val stream)."""

    def __init__(self, loader: DeviceCacheLoader):
        self.loader = loader
        self._it = loader.iter_param_batches()

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = self.loader.iter_param_batches()
            return next(self._it)


class FusedCachedStep:
    """ONE dispatch per training iteration from HBM-resident data.

    Traces the device-cache materializers for the train batch (and, with a
    val loader, the DARTS val batch) INTO the engine's cooperative step:
    per iteration the host ships one packed int32 parameter matrix per
    stream and issues a single compiled program that gathers/crops/flips/
    normalizes both batches and runs train(+arch). Versus the unfused
    device-cache path this removes two materializer dispatches and their
    output round trips per iteration — decisive on dispatch-latency-bound
    links (benchmarks/device_cache_overhead.py), free elsewhere.

    Numerics are IDENTICAL to the unfused path (same traced materializer,
    same engine step; tests/test_device_cache.py pins fused == unfused
    state bitwise on CPU).

    The reference runs loader -> .cuda() copies -> model.optimize_parameters
    as separate host-driven phases every iteration (train.py:135-151).
    """

    def __init__(self, engine, train_loader: DeviceCacheLoader,
                 val_loader: Optional[DeviceCacheLoader] = None,
                 swap_ab: bool = False):
        import jax
        import jax.numpy as jnp
        self.engine = engine
        self.tl, self.vl = train_loader, val_loader
        self._jnp = jnp
        mat_t = train_loader.traced_fn()
        mat_v = val_loader.traced_fn() if val_loader is not None else None

        def _swap(b):
            # --direction BtoA (cli.train set_input; models/Pix2Pix.py:453)
            if swap_ab and "A" in b:
                b = dict(b)
                b["A"], b["B"] = b["B"], b["A"]
            # optimization_barrier: materialize the batch ONCE. Without it
            # XLA's fusion pass treats the gather/crop/normalize chain as
            # cheap and duplicates it into every consumer of the batch (G,
            # D, distill taps), re-reading the HBM blobs per consumer —
            # measured 5x the standalone materializer's device time
            # (e2e_bench fused rung, r5). The barrier is numerics-free.
            return jax.lax.optimization_barrier(b)

        if val_loader is not None:
            def fused(state, tdata, vdata, targs, vargs, lr, ema_beta,
                      arch_lr):
                state, m = engine._train_step(
                    state, _swap(mat_t(tdata, *targs)), lr)
                state, am = engine._arch_step(
                    state, _swap(mat_v(vdata, *vargs)), ema_beta, arch_lr)
                return state, {**m, **am}
        else:
            def fused(state, tdata, targs, lr):
                return engine._train_step(
                    state, _swap(mat_t(tdata, *targs)), lr)
        self.jit = jax.jit(fused, donate_argnums=0)

    def train_arch_step(self, state, targs, vargs, lr, ema_beta, arch_lr):
        jnp = self._jnp
        return self.jit(state, self.tl._data, self.vl._data, targs, vargs,
                        jnp.float32(lr), jnp.float32(ema_beta),
                        jnp.float32(arch_lr))

    def train_step(self, state, targs, lr):
        return self.jit(state, self.tl._data, targs, self._jnp.float32(lr))
