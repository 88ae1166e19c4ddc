"""Engine smoke tests: cooperative steps run, losses are finite, states move.

Tiny widths/sizes keep CPU compile time manageable; every engine is tested
in its full configuration (online distillation + darts discriminator) plus
the key special paths (sparsity pretrain, SRGAN generator_only, pools).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcc_tpu.config import Config
from gcc_tpu.engines.common import pool_init, pool_query

K = jax.random.PRNGKey(0)
R = np.random.RandomState(0)


def img(b, s):
    return jnp.asarray(R.rand(b, s, s, 3).astype(np.float32) * 2 - 1)


def finite(m):
    return all(np.isfinite(float(v)) for v in m.values())


def alphas_of(state, key="d"):
    return np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(state.nets[key]["arch"])])


# ---------------------------------------------------------------------------

class TestPix2Pix:
    @pytest.fixture(scope="class")
    def engine_state(self):
        cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, crop_size=32, num_downs=5,
                     lambda_L1=100.0, gan_mode="hinge",
                     online_distillation=True, darts_discriminator=True,
                     lambda_content=50.0, lambda_gram=1e4)
        from gcc_tpu.engines.pix2pix import Pix2PixEngine
        eng = Pix2PixEngine(cfg)
        return eng, {"state": eng.init_state(K)}

    def test_train_step(self, engine_state):
        eng, holder = engine_state
        state = holder["state"]
        batch = {"A": img(2, 32), "B": img(2, 32)}
        p0 = np.asarray(jax.tree_util.tree_leaves(
            state.nets["g"]["params"])[0]).copy()
        state, m = eng.train_step(state, batch, 2e-4)
        state, m = eng.train_step(state, batch, 2e-4)
        assert finite(m)
        assert {"G_GAN", "G_L1", "D_real", "D_fake", "content",
                "gram"} <= set(m)
        p1 = np.asarray(jax.tree_util.tree_leaves(
            state.nets["g"]["params"])[0])
        assert np.any(p0 != p1), "G params did not move"
        assert int(state.step) == 2
        holder["state"] = state

    def test_arch_step(self, engine_state):
        eng, holder = engine_state
        state = holder["state"]
        batch = {"A": img(2, 32), "B": img(2, 32)}
        state, _ = eng.train_step(state, batch, 2e-4)
        a0 = alphas_of(state)
        state, am = eng.arch_step(state, batch, 0.9)
        assert finite(am)
        assert float(state.ema["d_arch"]) > 0
        state, am = eng.arch_step(state, batch, 0.9)
        assert np.any(alphas_of(state) != a0), "alphas did not move"
        holder["state"] = state

    def test_generate_eval_mode(self, engine_state):
        eng, holder = engine_state
        state = holder["state"]
        out = eng.generate(state, img(1, 32))
        assert out.shape == (1, 32, 32, 3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_pix2pix_sparsity_pretrain_moves_bn_scales():
    cfg = Config(model="pix2pix", ngf=4, ndf=4, crop_size=32, num_downs=5,
                 lambda_L1=100.0, gan_mode="hinge", lambda_scale=1e-2)
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(K)
    batch = {"A": img(2, 32), "B": img(2, 32)}
    s0 = np.asarray(state.nets["g"]["params"]["down_norm_1"]["scale"]).copy()
    for _ in range(3):
        state, m = eng.train_step(state, batch, 2e-4)
    s1 = np.asarray(state.nets["g"]["params"]["down_norm_1"]["scale"])
    assert np.any(s0 != s1)
    assert finite(m)


# ---------------------------------------------------------------------------

class TestSAGAN:
    @pytest.fixture(scope="class")
    def engine_state(self):
        cfg = Config(model="sagan", ngf=4, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, crop_size=64, z_dim=16,
                     gan_mode="hinge", online_distillation=True,
                     darts_discriminator=True, lambda_content=1.0,
                     lambda_gram=1.0, lambda_L1=0.0, lr=1e-4)
        from gcc_tpu.engines.sagan import SAGANEngine
        eng = SAGANEngine(cfg)
        return eng, {"state": eng.init_state(K)}

    def test_train_and_arch(self, engine_state):
        eng, holder = engine_state
        state = holder["state"]
        batch = {"z": jnp.asarray(R.randn(2, 16).astype(np.float32)),
                 "real_img": img(2, 64)}
        state, m = eng.train_step(state, batch, 1e-4)
        assert finite(m)
        assert {"G_GAN", "D_real", "D_fake", "content", "gram", "L1"} <= set(m)
        a0 = alphas_of(state)
        state, am = eng.arch_step(state, batch, 0.9)
        state, am = eng.arch_step(state, batch, 0.9)
        assert finite(am)
        assert np.any(alphas_of(state) != a0)
        out = eng.generate(state, batch["z"])
        assert out.shape == (2, 64, 64, 3)
        holder["state"] = state


# ---------------------------------------------------------------------------

class TestSRGAN:
    @pytest.fixture(scope="class")
    def engine_state(self):
        cfg = Config(model="srgan", ngf=4, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, image_size=32, upscale_factor=4,
                     gan_mode="vanilla", online_distillation=True,
                     darts_discriminator=True, lambda_content=0.1,
                     lambda_gram=0.1, lambda_SR_content=1.0, lr=1e-4)
        from gcc_tpu.engines.srgan import SRGANEngine
        eng = SRGANEngine(cfg)
        return eng, {"state": eng.init_state(K)}

    def test_train_and_arch(self, engine_state):
        eng, holder = engine_state
        state = holder["state"]
        batch = {"lr": img(2, 8), "hr": img(2, 32)}
        state, m = eng.train_step(state, batch, 1e-4)
        assert finite(m)
        assert {"content", "G_GAN", "perceptual", "D_real", "D_fake",
                "distill_content", "gram"} <= set(m)
        # no pretrained VGG weights => the perceptual term is DISABLED
        # (exactly 0), not silently computed in random-VGG space
        assert float(m["perceptual"]) == 0.0
        assert not eng.vgg_enabled
        a0 = alphas_of(state)
        state, am = eng.arch_step(state, batch, 0.9)
        state, am = eng.arch_step(state, batch, 0.9)
        assert np.any(alphas_of(state) != a0)
        out = eng.generate(state, batch["lr"])
        assert out.shape == (2, 32, 32, 3)
        holder["state"] = state


def test_srgan_generator_only():
    cfg = Config(model="srgan", ngf=4, ndf=4, image_size=32,
                 upscale_factor=4, generator_only=True, lambda_scale=1e-2)
    from gcc_tpu.engines.srgan import SRGANEngine
    eng = SRGANEngine(cfg)
    state = eng.init_state(K)
    batch = {"lr": img(2, 8), "hr": img(2, 32)}
    state, m = eng.train_step(state, batch, 1e-4)
    state, m2 = eng.train_step(state, batch, 1e-4)
    assert list(m) == ["content"]
    assert m2["content"] <= m["content"] * 2  # sane trajectory


def test_srgan_perceptual_enabled_with_weights():
    """Explicit vgg_params turn the perceptual term back on."""
    import jax
    cfg = Config(model="srgan", ngf=4, ndf=4, image_size=32,
                 upscale_factor=4, gan_mode="vanilla",
                 lambda_SR_content=1.0, lr=1e-4)
    from gcc_tpu.engines.srgan import SRGANEngine
    from gcc_tpu.metrics.vgg import TruncatedVGG19
    import jax.numpy as jnp
    vgg_params = TruncatedVGG19().init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    eng = SRGANEngine(cfg, vgg_params=vgg_params)
    assert eng.vgg_enabled
    state = eng.init_state(K)
    batch = {"lr": img(2, 8), "hr": img(2, 32)}
    state, m = eng.train_step(state, batch, 1e-4)
    assert finite(m)
    assert float(m["perceptual"]) > 0.0


# ---------------------------------------------------------------------------

class TestCycleGAN:
    @pytest.fixture(scope="class")
    def engine_state(self):
        cfg = Config(model="cyclegan", ngf=4, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, crop_size=32, gan_mode="lsgan",
                     online_distillation=True, darts_discriminator=True,
                     lambda_content=0.01, lambda_gram=10.0, pool_size=4)
        from gcc_tpu.engines.cyclegan import CycleGANEngine
        eng = CycleGANEngine(cfg)
        return eng, {"state": eng.init_state(K)}

    def test_train_and_arch(self, engine_state):
        eng, holder = engine_state
        state = holder["state"]
        batch = {"A": img(1, 32), "B": img(1, 32)}
        state, m = eng.train_step(state, batch, 2e-4)
        assert finite(m)
        assert {"G_A", "G_B", "cycle_A", "cycle_B", "idt_A", "idt_B",
                "D_A", "D_B", "content_A", "gram_B"} <= set(m)
        assert int(state.nets["pool_b"]["count"]) == 1
        a0 = alphas_of(state, "d_a")
        state, am = eng.arch_step(state, batch, 0.9)
        state, am = eng.arch_step(state, batch, 0.9)
        assert finite(am)
        assert np.any(alphas_of(state, "d_a") != a0)
        out = eng.generate(state, batch["A"], direction="AtoB")
        assert out.shape == (1, 32, 32, 3)
        holder["state"] = state


# ---------------------------------------------------------------------------

def test_pool_query_semantics():
    pool = pool_init(2, (2, 2, 1))
    imgs = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1)
    # filling phase: returns inputs unchanged, count grows
    pool, out = pool_query(pool, imgs, jax.random.PRNGKey(0))
    assert int(pool["count"]) == 2
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(pool["buffer"]),
                                  np.asarray(imgs))
    # full phase: each output is either the new image or a buffered one
    new = imgs + 100
    pool2, out2 = pool_query(pool, new, jax.random.PRNGKey(1))
    assert int(pool2["count"]) == 2
    for i in range(2):
        o = np.asarray(out2[i])
        candidates = [np.asarray(new[i])] + \
            [np.asarray(pool["buffer"][j]) for j in range(2)]
        assert any(np.array_equal(o, c) for c in candidates)


def test_pool_size_zero_passthrough():
    pool = pool_init(0, (2, 2, 1))
    imgs = jnp.ones((2, 2, 2, 1))
    pool, out = pool_query(pool, imgs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
