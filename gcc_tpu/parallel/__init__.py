from gcc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate_state, batch_sharding,
    init_distributed,
)
