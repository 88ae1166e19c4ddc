"""Tests for --fused_d_batch (engines/common.py:d_pair).

The flag replaces the reference's two sequential D forwards per update
(models/Pix2Pix.py:464-477) with ONE forward over the (fake, real) pair
interleaved into the batch dim, halving the D weight-gradient all-reduce
traffic on multi-chip data-parallel meshes (VERDICT r4 #2). Pinned here:

  * per-sample exactness where norm semantics permit (instance-norm D);
  * capture_b returns exactly the x_b half's sown features;
  * cyclegan (all-instance-norm D's when darts is off): the WHOLE fused
    train step matches the unfused step;
  * finite cooperative steps with the flag on for every family;
  * layout invariance: fused sharded(8) == fused unsharded(1);
  * the purpose: all-reduce bytes on the 8-mesh drop by ~the D parameter
    bytes (the previously double-reduced fake/real wgrad halves).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from gcc_tpu.config import Config
from gcc_tpu.engines.common import d_pair

K = jax.random.PRNGKey(0)


def _tree_allclose(a, b, atol, rtol=0.0):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


def test_d_pair_fused_exact_instance_norm():
    """Per-sample statistics (InstanceNorm) make the fused forward AND its
    parameter gradients numerically identical to the two-forward path."""
    from gcc_tpu.models.discriminators import PatchGAN
    d = PatchGAN(ndf=4, norm="instance")
    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)
    xb = jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)
    v = d.init({"params": K}, xa)

    def loss(params, fused):
        pa, pb, _ = d_pair(d, {**v, "params": params}, xa, xb, fused=fused)
        return jnp.mean(pa ** 2) + jnp.mean(jnp.abs(pb)), (pa, pb)

    (l0, (pa0, pb0)), g0 = jax.value_and_grad(loss, has_aux=True)(
        v["params"], False)
    (l1, (pa1, pb1)), g1 = jax.value_and_grad(loss, has_aux=True)(
        v["params"], True)
    np.testing.assert_allclose(np.asarray(pa1), np.asarray(pa0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb1), np.asarray(pb0), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    _tree_allclose(g1, g0, atol=2e-5)


def test_d_pair_capture_b_slices_second_half():
    """capture_b under fused mode must return the x_b rows of every sown
    intermediate — exactly what the unfused second forward captures."""
    from gcc_tpu.models.discriminators import PatchGAN
    d = PatchGAN(ndf=4, norm="instance")
    rng = np.random.RandomState(1)
    xa = jnp.asarray(rng.rand(3, 32, 32, 3) * 2 - 1, jnp.float32)
    xb = jnp.asarray(rng.rand(3, 32, 32, 3) * 2 - 1, jnp.float32)
    v = d.init({"params": K}, xa)
    pa0, pb0, _, f0 = d_pair(d, v, xa, xb, fused=False, capture_b=True)
    pa1, pb1, _, f1 = d_pair(d, v, xa, xb, fused=True, capture_b=True)
    assert len(f0) == len(f1) > 0
    for u, w in zip(f0, f1):
        assert u.shape == w.shape
        np.testing.assert_allclose(np.asarray(w), np.asarray(u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb1), np.asarray(pb0), atol=1e-5)


def test_cyclegan_fused_step_matches_unfused():
    """With darts off, every cyclegan D (student + teacher) is InstanceNorm
    (CycleGAN.py:185 only forces BatchNorm on the masked darts D), so the
    fused flag must not change the training trajectory at all."""
    from gcc_tpu.engines.cyclegan import CycleGANEngine
    base = Config(model="cyclegan", ngf=4, ndf=4, teacher_ngf=4,
                  teacher_ndf=4, crop_size=32, gan_mode="lsgan",
                  online_distillation=True, darts_discriminator=False,
                  lambda_content=0.01, lambda_gram=10.0, pool_size=4)
    rng = np.random.RandomState(2)
    batches = [{"A": jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32),
                "B": jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)}
               for _ in range(2)]

    def run(fused):
        eng = CycleGANEngine(base.replace(fused_d_batch=fused))
        state = eng.init_state(K)
        ms = []
        for b in batches:
            state, m = eng.train_step(state, b, 2e-4)
            ms.append({k: float(v) for k, v in m.items()})
        return state, ms

    s0, m0 = run(False)
    s1, m1 = run(True)
    # Forward + grads are exact (test_d_pair_fused_exact_instance_norm);
    # the different XLA program (one 2B conv vs two B convs) shifts fp32
    # reduction noise, and Adam's sign(g) first steps amplify near-zero
    # gradients to +-lr (CLAUDE.md "known benign chaos") — same tolerance
    # regime as the sharded==unsharded tests.
    for a, b in zip(m0, m1):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(b[k], a[k], rtol=2e-4, atol=1e-5,
                                       err_msg=k)
    _tree_allclose(s1.nets["g_a"]["params"], s0.nets["g_a"]["params"],
                   atol=1e-3)
    _tree_allclose(s1.nets["d_a"]["params"], s0.nets["d_a"]["params"],
                   atol=1e-3)


def test_engines_fused_step_finite():
    """BatchNorm / spectral families deviate numerically under fused (mixed
    2B statistics — documented in PARITY.md); the cooperative step must
    still run and stay finite for every family."""
    from gcc_tpu.engines.sagan import SAGANEngine
    from gcc_tpu.engines.srgan import SRGANEngine
    rng = np.random.RandomState(3)
    cases = [
        (SAGANEngine,
         Config(model="sagan", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                crop_size=64, z_dim=16, gan_mode="hinge",
                online_distillation=True, darts_discriminator=True,
                lambda_content=1.0, lambda_gram=1.0, fused_d_batch=True),
         {"z": jnp.asarray(rng.randn(4, 16), jnp.float32),
          "real_img": jnp.asarray(rng.rand(4, 64, 64, 3) * 2 - 1,
                                  jnp.float32)}),
        (SRGANEngine,
         Config(model="srgan", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                image_size=32, upscale_factor=4, gan_mode="vanilla",
                online_distillation=True, darts_discriminator=True,
                lambda_content=0.1, lambda_gram=0.1, fused_d_batch=True),
         {"lr": jnp.asarray(rng.rand(4, 8, 8, 3) * 2 - 1, jnp.float32),
          "hr": jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)}),
    ]
    for cls, cfg, batch in cases:
        eng = cls(cfg)
        state = eng.init_state(K)
        state, m = eng.train_step(state, batch, 2e-4)
        assert all(np.isfinite(float(v)) for v in m.values()), cfg.model


def _pix2pix_cfg(fused):
    return Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8,
                  teacher_ndf=8, crop_size=32, num_downs=5,
                  lambda_L1=100.0, gan_mode="hinge",
                  online_distillation=True, darts_discriminator=True,
                  no_dropout=True, lambda_content=50.0, lambda_gram=1e4,
                  fused_d_batch=fused)


def test_fused_sharded_equals_unsharded_pix2pix():
    """The interleaved stack/reshape keeps every (fake, real) row pair on
    the device that owned the batch row, so the fused step must stay
    layout-invariant: 1-device == 8-device mesh, losses and params."""
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    from gcc_tpu.parallel import make_mesh, replicate_state, shard_batch
    rng = np.random.RandomState(7)
    batches = [{"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
                "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)}
               for _ in range(2)]

    def run(n_dev):
        eng = Pix2PixEngine(_pix2pix_cfg(True))
        mesh = make_mesh(n_dev)
        state = replicate_state(eng.init_state(K), mesh)
        ms = []
        for b in batches:
            state, m = eng.train_step(state, shard_batch(b, mesh), 2e-4)
            ms.append({k: float(v) for k, v in m.items()})
        return state, ms

    s1, m1 = run(1)
    s8, m8 = run(8)
    for a, b in zip(m1, m8):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=1e-5,
                                       err_msg=k)
    _tree_allclose(s1.nets["g"]["params"], s8.nets["g"]["params"],
                   atol=2e-5, rtol=2e-3)
    _tree_allclose(s1.nets["d"].get("batch_stats", {}),
                   s8.nets["d"].get("batch_stats", {}),
                   atol=2e-5, rtol=2e-3)


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s8": 1, "u8": 1, "pred": 1}


def _all_reduce_bytes(hlo: str) -> int:
    total = 0
    for m in re.finditer(r"=\s*((?:\([^)]*\))|(?:[a-z0-9]+\[[^\]]*\]"
                         r"(?:\{[^}]*\})?))\s+all-reduce(?:-start)?\(",
                         hlo):
        for dt, dims in re.findall(r"([a-z0-9]+)\[([0-9,]*)\]", m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def test_fused_cuts_d_allreduce_traffic():
    """The feature's purpose, measured: on the 8-mesh the fused combined
    step's all-reduce bytes must drop vs unfused by about the D parameter
    bytes (student + teacher D wgrads were each reduced twice — fake and
    real halves in separate dots; benchmarks/mesh_overhead.py attributes
    the full-size program the same way)."""
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    from gcc_tpu.parallel import make_mesh, replicate_state, shard_batch
    rng = np.random.RandomState(9)
    batch = {"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
             "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)}
    val = {"A": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32),
           "B": jnp.asarray(rng.rand(8, 32, 32, 3) * 2 - 1, jnp.float32)}
    mesh = make_mesh(8)

    def lower(fused):
        eng = Pix2PixEngine(_pix2pix_cfg(fused))
        state = replicate_state(eng.init_state(K), mesh)
        b, v = shard_batch(batch, mesh), shard_batch(val, mesh)
        hlo = eng.combined_jit.lower(
            state, b, v, jnp.float32(2e-4), jnp.float32(0.9),
            jnp.float32(1e-4)).compile().as_text()
        d_bytes = sum(
            int(np.prod(x.shape)) * 4
            for net in ("d", "td")
            for x in jax.tree_util.tree_leaves(
                state.nets[net].get("params", {})))
        return _all_reduce_bytes(hlo), d_bytes

    unfused_bytes, d_bytes = lower(False)
    fused_bytes, _ = lower(True)
    saved = unfused_bytes - fused_bytes
    assert saved > 0, (unfused_bytes, fused_bytes)
    # the duplicated reductions were the two D's weight grads (plus their
    # per-forward BN statistic vectors, which only add)
    assert saved >= 0.9 * d_bytes, (saved, d_bytes)
