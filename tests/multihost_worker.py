"""Worker for test_multihost.py: one process of a 2-process x 4-device
jax.distributed run executing a single data-parallel pix2pix train step.

Run: python multihost_worker.py <process_id> <port>
Prints one JSON line of losses.
NOT a pytest file (no test_ prefix) — launched as a subprocess.
"""
import json
import os
import sys


def main():
    proc_id, port = int(sys.argv[1]), int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gcc_tpu.parallel import (init_distributed, make_mesh,
                                  replicate_state, shard_batch)
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=proc_id)
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np
    from gcc_tpu.config import Config
    from gcc_tpu.engines.pix2pix import Pix2PixEngine

    cfg = Config(model="pix2pix", ngf=4, ndf=4, num_downs=5, crop_size=32,
                 no_dropout=True, gan_mode="hinge")
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=32)

    mesh = make_mesh()
    state = replicate_state(state, mesh)
    rng = np.random.RandomState(7)
    batch = {"A": (rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1),
             "B": (rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1)}
    batch = shard_batch(batch, mesh)
    state, losses = eng.train_step(state, batch, 2e-4)
    out = {k: float(v) for k, v in losses.items()}
    # global-BN statistics must also be identical across processes
    bs = state.nets["d"].get("batch_stats", {})
    if bs:
        leaf = jax.tree_util.tree_leaves(bs)[0]
        out["_bn_leaf_sum"] = float(np.sum(np.asarray(leaf)))

    # ---- spatial partitioning across PROCESS boundaries ----
    # conv halo exchanges and InstanceNorm (H,W)-mean all-reduces must ride
    # cross-process collectives; compare against the unsharded single-device
    # forward inside jit (max |delta| is a replicated scalar both
    # controllers can read)
    import jax.numpy as jnp
    from gcc_tpu.models.generators import MobileResnetGenerator
    from gcc_tpu.parallel import make_mesh_2d, spatial_sharding
    from gcc_tpu.parallel.spatial import jit_spatial_forward

    g = MobileResnetGenerator(ngf=4, n_blocks=2)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    gv = g.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 32, 32, 3)),
                train=False)
    mesh2 = make_mesh_2d(2, 4)  # data x spatial, spanning both processes
    fwd = jit_spatial_forward(g, mesh2, train=False)
    y_sp = fwd(gv, jax.device_put(x, spatial_sharding(mesh2)))
    y_ref = g.apply(gv, jnp.asarray(x), train=False)  # single local device
    delta = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(y_sp, y_ref)
    out["_spatial_max_delta"] = float(delta)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
