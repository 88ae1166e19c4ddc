from gcc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate_state, batch_sharding,
    init_distributed,
)
from gcc_tpu.parallel.spatial import (  # noqa: F401
    make_mesh_2d, spatial_sharding, shard_batch_spatial,
    jit_spatial_forward, spatial_apply,
)
