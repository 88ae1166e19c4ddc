"""Data-parallel mesh tests on the 8 virtual CPU devices (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from gcc_tpu.config import Config
from gcc_tpu.parallel import make_mesh, replicate_state, shard_batch

K = jax.random.PRNGKey(0)


def test_mesh_spans_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_cooperative_step():
    """Full GCC step over an 8-device mesh: executes, metrics finite, state
    stays replicated (this is also what the driver's dryrun validates)."""
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 crop_size=32, num_downs=5, lambda_L1=100.0, gan_mode="hinge",
                 online_distillation=True, darts_discriminator=True,
                 lambda_content=50.0, lambda_gram=1e4)
    eng = Pix2PixEngine(cfg)
    mesh = make_mesh()
    state = replicate_state(eng.init_state(K), mesh)
    rng = np.random.RandomState(0)
    batch = shard_batch(
        {"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
         "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)},
        mesh)
    val = shard_batch(
        {"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
         "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)},
        mesh)
    state, m = eng.train_arch_step(state, batch, val, 2e-4, 0.9)
    assert all(np.isfinite(float(v)) for v in m.items() for v in [v[1]])
    # params remain fully replicated after the step
    leaf = jax.tree_util.tree_leaves(state.nets["g"]["params"])[0]
    assert leaf.sharding.is_fully_replicated


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = jnp.zeros((16, 4, 4, 3))
    sx = shard_batch({"A": x}, mesh)["A"]
    # batch axis split 8 ways, rest replicated
    assert sx.sharding.shard_shape(sx.shape) == (2, 4, 4, 3)
