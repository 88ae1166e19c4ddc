"""Spatial partitioning (SP): shard the image H axis across a mesh axis.

The reference is single-device, so its serving ceiling is one GPU's memory
(models/SRGAN.py:139-197 upsamples 4x: a 2048x2048 HR output needs the full
activation stack of a 512x512 LR input on one card). Here the image itself
becomes a sharded axis: activations are laid out
``P('data', 'spatial', None, None)`` over a 2-D device mesh, so a batch is
split over 'data' AND each image's rows are split over 'spatial'.

TPU-idiomatic design: we do NOT hand-write halo exchange. XLA's SPMD
partitioner natively supports spatially-partitioned convolution — given the
input/output sharding annotations below it inserts the boundary
collective-permutes (halos for 3x3/9x9 kernels, resharding around strided
stages) on ICI automatically, and overlaps them with compute. Hand-rolled
ppermute halos would just re-implement the compiler pass, worse.

What this buys on a real slice:
  * serving images whose activation footprint exceeds one chip's HBM
    (SRResNet at scale-4 keeps full-resolution feature maps through 16
    residual blocks — the dominant memory term scales as H*W*64);
  * latency scaling for single large images, where batch parallelism is
    useless (batch=1).

Per-sample normalizations remain exact: InstanceNorm means over (H, W)
become partial sums + an all-reduce over the 'spatial' axis, inserted by
XLA; BatchNorm in eval mode uses running stats (no cross-device traffic).
Numerical equivalence sharded-vs-unsharded is pinned by
tests/test_parallel.py::test_spatial_*.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_spatial: int,
                 axes: Tuple[str, str] = ("data", "spatial")) -> Mesh:
    """(n_data x n_spatial) mesh over the first n_data*n_spatial devices.

    Row-major over `jax.devices()`: adjacent devices share a 'spatial' row,
    so the frequent traffic (conv halos every layer) rides neighbor ICI
    links while the rare traffic (none at inference; grad all-reduce in
    training) crosses rows.
    """
    n = n_data * n_spatial
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_spatial), axes)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: batch over 'data', image rows over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial", None, None))


def shard_batch_spatial(batch: Any, mesh: Mesh) -> Any:
    """Place every array batch-over-'data' and H-over-'spatial'."""
    s = spatial_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


_JIT_CACHE: dict = {}
_JIT_CACHE_MAX = 32


def auto_shards(h: int, n_spatial: int) -> int:
    """Largest shard count <= n_spatial that divides the image height.

    `device_put` requires the sharded dim to divide evenly; eval images have
    arbitrary heights (e.g. SRDataset test crops are only multiples of the
    upscale factor, datasets.py:139-141), so callers degrade to the best
    divisor instead of crashing (worst case 1 = unsharded)."""
    for k in range(min(h, max(1, n_spatial)), 0, -1):
        if h % k == 0:
            return k
    return 1


def jit_spatial_forward(module, mesh: Mesh, train: bool = False):
    """Compile `module.apply` with activations spatially sharded.

    Returns fn(variables, x) -> y where x and y are laid out
    P('data','spatial') and variables are replicated. Memoized on
    (id(module), mesh, train) — cfg-driven modules carry list attributes,
    so Flax's structural hash is unavailable; the cache holds a strong
    reference to the module to keep its id stable. Bounded FIFO so a
    process that churns through engines cannot accumulate executables."""
    key = (id(module), mesh, train)
    hit = _JIT_CACHE.get(key)
    if hit is not None:
        return hit[1]
    rep = NamedSharding(mesh, P())
    act = spatial_sharding(mesh)

    @partial(jax.jit, in_shardings=(rep, act), out_shardings=act)
    def fwd(variables, x):
        return module.apply(variables, x, train=train)

    if len(_JIT_CACHE) >= _JIT_CACHE_MAX:
        _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
    _JIT_CACHE[key] = (module, fwd)
    return fwd


def spatial_apply(module, variables, x, mesh: Optional[Mesh] = None,
                  n_spatial: Optional[int] = None):
    """One-shot spatially-sharded eval forward (compiles on first shapes).

    Convenience wrapper: builds a (1 x n_spatial) mesh over the available
    devices when none is given — reduced via `auto_shards` so arbitrary
    image heights never crash — shards `x`, runs, and returns the result
    (still device-resident, spatially sharded; `np.asarray` gathers it).
    An explicitly passed mesh is validated instead of silently reduced.
    """
    if mesh is None:
        n_dev = len(jax.devices())
        want = n_spatial or n_dev
        if want > n_dev:
            import logging
            logging.getLogger("gcc-tpu").warning(
                "spatial_apply: %d shards requested but only %d devices; "
                "degrading to %d", want, n_dev, n_dev)
            want = n_dev
        n_spatial = auto_shards(x.shape[1], want)
        mesh = make_mesh_2d(1, n_spatial)
    else:
        nd, ns = mesh.shape["data"], mesh.shape["spatial"]
        if x.shape[0] % nd or x.shape[1] % ns:
            raise ValueError(
                f"batch {x.shape[0]} / height {x.shape[1]} not divisible by "
                f"mesh (data={nd}, spatial={ns}); pass n_spatial instead to "
                f"auto-reduce, or pad the input")
    fwd = jit_spatial_forward(module, mesh)
    return fwd(variables, jax.device_put(x, spatial_sharding(mesh)))
