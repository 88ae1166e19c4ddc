"""Device mesh + sharding helpers: the execution substrate of the rebuild.

The reference is single-CUDA-device by construction (SURVEY.md §2.2); here
training runs data-parallel over a `jax.sharding.Mesh`:

  * batch axis sharded over the 'data' mesh axis, params/opt-state replicated
  * gradients all-reduce via XLA-inserted collectives (no NCCL calls to port)
  * BatchNorm statistics are computed with plain jnp reductions over the
    (sharded) batch axis, so XLA lowers them to global cross-chip reductions:
    multi-chip training sees true global batch statistics for free

Nothing in GCC needs TP/PP (generators are <=20M params); scaling is pure DP
over ICI, which is also what maximizes MXU utilization for conv workloads.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every array's leading (batch) dim across the data axis."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), state)
