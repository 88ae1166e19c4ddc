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


def _tree_allclose(a, b, atol, rtol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


def _run_steps(engine_cls, cfg, batches, n_dev):
    eng = engine_cls(cfg)
    mesh = make_mesh(n_dev)
    state = replicate_state(eng.init_state(K), mesh)
    all_m = []
    for batch in batches:
        state, m = eng.train_step(state, shard_batch(batch, mesh), 2e-4)
        all_m.append({k: float(v) for k, v in m.items()})
    return state, all_m


def test_sharded_equals_unsharded_pix2pix():
    """One cooperative step, same global batch, 1 device vs 8 devices must
    produce the same losses and updated params. This pins the global-BN
    claim (mesh.py:7-10): BatchNorm statistics are computed over the FULL
    global batch regardless of sharding, so DP is semantics-preserving,
    not an approximation."""
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 crop_size=32, num_downs=5, lambda_L1=100.0, gan_mode="hinge",
                 online_distillation=True, darts_discriminator=True,
                 no_dropout=True,  # keep per-device PRNG layout-independent
                 lambda_content=50.0, lambda_gram=1e4)
    rng = np.random.RandomState(3)
    batches = [{"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
                "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)}
               for _ in range(2)]
    s1, m1 = _run_steps(Pix2PixEngine, cfg, batches, 1)
    s8, m8 = _run_steps(Pix2PixEngine, cfg, batches, 8)
    # losses are means over the GLOBAL batch: tight equality across both
    # steps catches any per-shard mean/sum error; the step-2 losses run on
    # step-1's updated params, so param divergence would surface here too
    for step1, step8 in zip(m1, m8):
        assert set(step1) == set(step8)
        for k in step1:
            np.testing.assert_allclose(step1[k], step8[k], rtol=2e-4,
                                       atol=1e-5, err_msg=k)
    _tree_allclose(s1.nets["g"]["params"], s8.nets["g"]["params"],
                   atol=2e-5, rtol=2e-3)
    _tree_allclose(s1.nets["g"].get("batch_stats", {}),
                   s8.nets["g"].get("batch_stats", {}),
                   atol=2e-5, rtol=2e-3)


def test_sharded_equals_unsharded_cyclegan():
    """InstanceNorm family: per-sample statistics make the sharded step
    bitwise-equivalent up to fp32 reduction order."""
    from gcc_tpu.engines.cyclegan import CycleGANEngine
    cfg = Config(model="cyclegan", ngf=4, ndf=4, teacher_ngf=4, teacher_ndf=4,
                 crop_size=32, gan_mode="lsgan", online_distillation=True,
                 darts_discriminator=True, lambda_content=0.01,
                 lambda_gram=10.0, pool_size=4)
    rng = np.random.RandomState(4)
    batches = [{"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
                "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)}
               for _ in range(2)]
    s1, m1 = _run_steps(CycleGANEngine, cfg, batches, 1)
    s8, m8 = _run_steps(CycleGANEngine, cfg, batches, 8)
    for step1, step8 in zip(m1, m8):
        for k in step1:
            np.testing.assert_allclose(step1[k], step8[k], rtol=2e-4,
                                       atol=1e-5, err_msg=k)
    # Adam's early updates are +-lr*g/sqrt(g^2): params whose true gradient
    # sits at fp32 reduction-noise level flip sign between layouts, bounding
    # agreement at ~2*lr per step (8e-4 over 2 steps). 1e-3 still catches
    # systematic divergence; the tight 2-step loss equality above is the
    # sharp check (step-2 losses run on step-1's updated params).
    _tree_allclose(s1.nets["g_a"]["params"], s8.nets["g_a"]["params"],
                   atol=1e-3, rtol=0)


def test_sharded_equals_unsharded_sagan():
    """Spectral-norm family: the power-iteration u/v vectors are mutable
    state threaded through the sharded step — the one place replicated
    mutable state could silently diverge across layouts. u/v depend only on
    the (replicated) kernels, so they must match tightly; losses and params
    must match like the other families."""
    from gcc_tpu.engines.sagan import SAGANEngine
    cfg = Config(model="sagan", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 crop_size=64, z_dim=16, gan_mode="hinge",
                 online_distillation=True, darts_discriminator=True,
                 lambda_content=1.0, lambda_gram=1.0)
    rng = np.random.RandomState(5)
    batches = [
        {"z": jnp.asarray(rng.randn(8, 16), jnp.float32),
         "real_img": jnp.asarray(rng.rand(8, 64, 64, 3) * 2 - 1, jnp.float32)}
        for _ in range(2)]
    s1, m1 = _run_steps(SAGANEngine, cfg, batches, 1)
    s8, m8 = _run_steps(SAGANEngine, cfg, batches, 8)
    for step1, step8 in zip(m1, m8):
        assert set(step1) == set(step8)
        for k in step1:
            np.testing.assert_allclose(step1[k], step8[k], rtol=2e-4,
                                       atol=1e-5, err_msg=k)
    _tree_allclose(s1.nets["g"]["params"], s8.nets["g"]["params"],
                   atol=1e-3, rtol=0)
    # power-iteration state: data-independent given replicated kernels
    _tree_allclose(s1.nets["g"]["spectral"], s8.nets["g"]["spectral"],
                   atol=1e-5, rtol=1e-4)
    _tree_allclose(s1.nets["d"]["spectral"], s8.nets["d"]["spectral"],
                   atol=1e-5, rtol=1e-4)


def test_sharded_equals_unsharded_srgan():
    """SRResNet family (global-BN through 16 residual blocks + masked
    VGG-style D): completes the 4/4 DP equivalence matrix."""
    from gcc_tpu.engines.srgan import SRGANEngine
    cfg = Config(model="srgan", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 image_size=32, upscale_factor=4, gan_mode="vanilla",
                 online_distillation=True, darts_discriminator=True,
                 lambda_content=0.1, lambda_gram=0.1)
    rng = np.random.RandomState(6)
    batches = [
        {"lr": jnp.asarray(rng.rand(8, 8, 8, 3) * 2 - 1, jnp.float32),
         "hr": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)}
        for _ in range(2)]
    s1, m1 = _run_steps(SRGANEngine, cfg, batches, 1)
    s8, m8 = _run_steps(SRGANEngine, cfg, batches, 8)
    for step1, step8 in zip(m1, m8):
        assert set(step1) == set(step8)
        for k in step1:
            np.testing.assert_allclose(step1[k], step8[k], rtol=2e-4,
                                       atol=1e-5, err_msg=k)
    _tree_allclose(s1.nets["g"]["params"], s8.nets["g"]["params"],
                   atol=1e-3, rtol=0)
    _tree_allclose(s1.nets["g"].get("batch_stats", {}),
                   s8.nets["g"].get("batch_stats", {}),
                   atol=2e-5, rtol=2e-3)


# ---------------------------------------------------------------------------
# Spatial partitioning (gcc_tpu/parallel/spatial.py): sharding the image H
# axis must be semantics-preserving — XLA SPMD inserts the conv halo
# exchanges, InstanceNorm means all-reduce over the 'spatial' axis.
# ---------------------------------------------------------------------------

def test_spatial_sharded_equals_unsharded():
    from gcc_tpu.models.generators import (
        MobileResnetGenerator, SRResNet, UnetGenerator)
    from gcc_tpu.parallel import make_mesh_2d, spatial_apply

    rng = np.random.RandomState(0)
    mesh = make_mesh_2d(2, 4)
    x = jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)

    # SRResNet: stride-1 stack + subpixel upsample (the serving case:
    # full-res activations through 16 blocks dominate HBM at large sizes)
    g = SRResNet(n_channels=8, n_blocks=2)
    v = g.init({"params": K}, x[:1], train=False)
    np.testing.assert_allclose(
        np.asarray(spatial_apply(g, v, x, mesh)),
        np.asarray(g.apply(v, x, train=False)), atol=1e-5, rtol=1e-5)

    # MobileResnet: reflect-pad, InstanceNorm (cross-shard spatial means),
    # strided down/up convs
    g = MobileResnetGenerator(ngf=4, n_blocks=2)
    v = g.init({"params": K}, x[:1], train=False)
    np.testing.assert_allclose(
        np.asarray(spatial_apply(g, v, x, mesh)),
        np.asarray(g.apply(v, x, train=False)), atol=1e-5, rtol=1e-5)

    # U-Net: H collapses below the shard count at the bottleneck (32 -> 1
    # over 5 downs); SPMD reshards through it and the skip concats
    g = UnetGenerator(ngf=4, num_downs=5, use_dropout=False)
    v = g.init({"params": K, "dropout": jax.random.PRNGKey(1)},
               x[:1], train=False)
    np.testing.assert_allclose(
        np.asarray(spatial_apply(g, v, x, mesh)),
        np.asarray(g.apply(v, x, train=False)), atol=1e-5, rtol=1e-5)


def test_engine_generate_spatial():
    """Engine-level SP entry (used by cli/test.py --spatial_shards)."""
    from gcc_tpu.engines.srgan import SRGANEngine
    cfg = Config(model="srgan", ngf=4, ndf=4, image_size=32,
                 upscale_factor=4, gan_mode="vanilla")
    # list-valued filter_cfgs make the module structurally unhashable —
    # exercises the id-keyed jit cache in parallel/spatial.py
    eng = SRGANEngine(cfg, filter_cfgs=[4] * 16)
    state = eng.init_state(K)
    rng = np.random.RandomState(5)
    lr_img = jnp.asarray(rng.rand(1, 8, 8, 3) * 2 - 1, jnp.float32)
    ref = eng.generate(state, lr_img)
    out = eng.generate_spatial(state, lr_img, n_spatial=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_spatial_auto_reduce_non_divisible_height():
    """Eval images have arbitrary heights (SRDataset test crops are only
    multiples of the upscale factor); the shard count must degrade to the
    largest divisor instead of crashing on device_put."""
    from gcc_tpu.parallel.spatial import auto_shards
    assert auto_shards(70, 4) == 2
    assert auto_shards(7, 4) == 1  # prime height: unsharded
    assert auto_shards(64, 8) == 8
    assert auto_shards(1, 8) == 1

    from gcc_tpu.engines.srgan import SRGANEngine
    cfg = Config(model="srgan", ngf=4, ndf=4, image_size=40,
                 upscale_factor=4, gan_mode="vanilla")
    eng = SRGANEngine(cfg)
    state = eng.init_state(K)
    rng = np.random.RandomState(6)
    lr_img = jnp.asarray(rng.rand(1, 10, 10, 3) * 2 - 1, jnp.float32)
    ref = eng.generate(state, lr_img)
    out = eng.generate_spatial(state, lr_img, n_spatial=8)  # 10 % 8 -> 5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
