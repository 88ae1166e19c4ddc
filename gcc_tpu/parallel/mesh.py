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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (pod-slice) runtime initialization.

    Single-host slices (e.g. v5e-8, the BASELINE.json target) need none of
    this — `jax.devices()` already sees all chips. On multi-host slices call
    this ONCE before any jax computation; with no arguments
    `jax.distributed.initialize` auto-detects the coordinator from the TPU
    metadata, after which `jax.devices()` returns the GLOBAL device list and
    `make_mesh` spans hosts (collectives ride ICI within the slice).
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (global) devices.

    Uses `jax.devices()`: on a single host that is the local chips; on a
    multi-host slice it is the global list PROVIDED `init_distributed()`
    ran first (otherwise each process sees only local devices).
    """
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
