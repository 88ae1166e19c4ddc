"""Unit tests for core ops: mask STE, GAN losses, gram, layers vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcc_tpu.ops.mask import mask_from_alpha, MaskGate, clip_alphas
from gcc_tpu import losses
from gcc_tpu.ops.layers import (
    Conv, ConvTranspose, BatchNorm, InstanceNorm, pixel_shuffle, PReLU)


class TestMask:
    def test_forward_values(self):
        alpha = jnp.array([0.0, 0.4999, 0.5, 0.6, 1.0])
        m = mask_from_alpha(alpha, jnp.float32(0.5))
        # sign(0)=0 -> mask 0.5 exactly at threshold (DifferentiableOp.py:26)
        np.testing.assert_allclose(np.asarray(m), [0.0, 0.0, 0.5, 1.0, 1.0])

    def test_straight_through_gradient(self):
        # reference Mask.backward passes grad unchanged to alpha
        alpha = jnp.array([0.2, 0.8, 0.6])
        x = jnp.array([3.0, 5.0, 7.0])

        def loss(a):
            return jnp.sum(mask_from_alpha(a, jnp.float32(0.5)) * x)

        g = jax.grad(loss)(alpha)
        # d(loss)/d(mask) = x, passed through unchanged
        np.testing.assert_allclose(np.asarray(g), [3.0, 5.0, 7.0])

    def test_gate_module(self):
        gate = MaskGate(features=4)
        x = jnp.ones((2, 3, 3, 4))
        vars_ = gate.init(jax.random.PRNGKey(0), x)
        assert "arch" in vars_
        y = gate.apply(vars_, x)
        np.testing.assert_allclose(np.asarray(y), np.ones((2, 3, 3, 4)))
        clipped = clip_alphas({"a": jnp.array([-0.5, 1.5, 0.3])})
        np.testing.assert_allclose(np.asarray(clipped["a"]), [0.0, 1.0, 0.3])


class TestGANLoss:
    def test_lsgan(self):
        pred = jnp.array([0.5, 1.5])
        assert float(losses.gan_loss(pred, True, "lsgan")) == pytest.approx(0.25)
        assert float(losses.gan_loss(pred, False, "lsgan")) == pytest.approx(
            (0.25 + 2.25) / 2)

    def test_vanilla_matches_bce(self):
        import torch
        pred = np.random.RandomState(0).randn(8).astype(np.float32)
        for real in (True, False):
            ours = float(losses.gan_loss(jnp.array(pred), real, "vanilla"))
            t = torch.nn.BCEWithLogitsLoss()(
                torch.tensor(pred),
                torch.full((8,), 1.0 if real else 0.0))
            assert ours == pytest.approx(float(t), rel=1e-4)

    def test_hinge(self):
        pred = jnp.array([-2.0, 0.5, 2.0])
        # D real: -mean(min(pred-1, 0)) = -mean([-3, -0.5, 0]) = 7/6
        assert float(losses.gan_loss(pred, True, "hinge")) == pytest.approx(7 / 6)
        # D fake: -mean(min(-pred-1, 0)) = -mean([0, -1.5, -3]) = 1.5
        assert float(losses.gan_loss(pred, False, "hinge")) == pytest.approx(1.5)
        # G: -mean(pred)
        assert float(losses.gan_loss(pred, True, "hinge", False)) == pytest.approx(-1 / 6)

    def test_wgangp(self):
        pred = jnp.array([1.0, 3.0])
        assert float(losses.gan_loss(pred, True, "wgangp")) == -2.0
        assert float(losses.gan_loss(pred, False, "wgangp")) == 2.0


class TestGram:
    def test_matches_torch_formula(self, rng):
        import torch
        x = rng.randn(2, 5, 6, 3).astype(np.float32)  # NHWC
        g = np.asarray(losses.gram(jnp.array(x)))
        xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
        b, c, h, w = xt.shape
        f = xt.reshape(b, c, h * w)
        gt = (f @ f.transpose(1, 2) / (c * h * w)).numpy()
        np.testing.assert_allclose(g, gt, rtol=1e-5, atol=1e-6)

    def test_gram_pair_err_f32_uses_exact_path(self, rng):
        """f32 inputs must take the reference-exact direct-gram path
        (bit-identical), regardless of hw vs c."""
        f = jnp.array(rng.randn(2, 2, 2, 16).astype(np.float32))  # hw=4 < c
        t = jnp.array(rng.randn(2, 2, 2, 16).astype(np.float32))
        for use_sqrt in (True, False):
            direct = (losses.sqrt_mse if use_sqrt else losses.mse)(
                losses.gram(f), losses.gram(t))
            fast = losses.gram_pair_err(f, t, use_sqrt)
            assert float(direct) == float(fast)

    def test_gram_pair_err_bf16_lowrank_matches_direct(self, rng):
        """The hw<c kernel-matrix identity (bf16 fast path) agrees with
        the direct gram computation — value and gradient."""
        f32 = rng.randn(3, 2, 2, 32).astype(np.float32)  # hw=4 < c=32
        t32 = rng.randn(3, 2, 2, 32).astype(np.float32)
        f = jnp.array(f32).astype(jnp.bfloat16)
        t = jnp.array(t32).astype(jnp.bfloat16)
        for use_sqrt in (True, False):
            direct = (losses.sqrt_mse if use_sqrt else losses.mse)(
                losses.gram(f), losses.gram(t))
            fast = losses.gram_pair_err(f, t, use_sqrt)
            np.testing.assert_allclose(float(fast), float(direct),
                                       rtol=1e-4)
            gd = jax.grad(lambda f: (losses.sqrt_mse if use_sqrt
                                     else losses.mse)(losses.gram(f),
                                                      losses.gram(t)))(f)
            gf = jax.grad(
                lambda f: losses.gram_pair_err(f, t, use_sqrt))(f)
            # bf16 grads: one-ulp (2^-8 relative) noise on tiny entries
            np.testing.assert_allclose(
                np.asarray(gf, np.float32), np.asarray(gd, np.float32),
                rtol=2e-2, atol=1e-6)


class TestLayersVsTorch:
    """Op-level parity against torch CPU with identical weights."""

    def test_conv(self, rng):
        import torch
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(4, 4, 3, 5).astype(np.float32) * 0.1  # HWIO
        b = rng.randn(5).astype(np.float32)

        mod = Conv(5, (4, 4), (2, 2), 1)
        y = mod.apply({"params": {"kernel": jnp.array(w), "bias": jnp.array(b)}},
                      jnp.array(x))

        tconv = torch.nn.Conv2d(3, 5, 4, 2, 1)
        tconv.weight.data = torch.tensor(w).permute(3, 2, 0, 1)  # OIHW
        tconv.bias.data = torch.tensor(b)
        yt = tconv(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), yt, rtol=1e-4, atol=1e-5)

    def test_conv_transpose(self, rng):
        import torch
        x = rng.randn(2, 8, 8, 3).astype(np.float32)
        w = rng.randn(4, 4, 3, 5).astype(np.float32) * 0.1  # HW I O
        b = rng.randn(5).astype(np.float32)

        mod = ConvTranspose(5, (4, 4), (2, 2), 1)
        y = mod.apply({"params": {"kernel": jnp.array(w), "bias": jnp.array(b)}},
                      jnp.array(x))
        assert y.shape == (2, 16, 16, 5)

        tconv = torch.nn.ConvTranspose2d(3, 5, 4, 2, 1)
        tconv.weight.data = torch.tensor(w).permute(2, 3, 0, 1)  # torch: (I,O,H,W)
        tconv.bias.data = torch.tensor(b)
        yt = tconv(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), yt, rtol=1e-4, atol=1e-5)

    def test_conv_transpose_output_padding(self, rng):
        import torch
        x = rng.randn(1, 7, 7, 2).astype(np.float32)
        w = rng.randn(3, 3, 2, 4).astype(np.float32) * 0.1
        mod = ConvTranspose(4, (3, 3), (2, 2), 1, output_padding=1, use_bias=False)
        y = mod.apply({"params": {"kernel": jnp.array(w)}}, jnp.array(x))
        tconv = torch.nn.ConvTranspose2d(2, 4, 3, 2, 1, output_padding=1, bias=False)
        tconv.weight.data = torch.tensor(w).permute(2, 3, 0, 1)
        yt = tconv(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
        assert y.shape == (1, 14, 14, 4)
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), yt, rtol=1e-4, atol=1e-5)

    def test_batchnorm_train_matches_torch(self, rng):
        import torch
        x = rng.randn(4, 5, 5, 3).astype(np.float32)
        scale = rng.rand(3).astype(np.float32) + 0.5
        bias = rng.randn(3).astype(np.float32)

        mod = BatchNorm(use_running_average=False)
        variables = {
            "params": {"scale": jnp.array(scale), "bias": jnp.array(bias)},
            "batch_stats": {"mean": jnp.zeros(3), "var": jnp.ones(3)},
        }
        y, updated = mod.apply(variables, jnp.array(x), mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm2d(3)
        tbn.weight.data = torch.tensor(scale)
        tbn.bias.data = torch.tensor(bias)
        tbn.train()
        yt = tbn(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), yt, rtol=1e-4, atol=1e-5)
        # running stats (torch: unbiased var, momentum 0.1)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    def test_instancenorm_matches_torch(self, rng):
        import torch
        x = rng.randn(2, 6, 6, 4).astype(np.float32)
        y = InstanceNorm().apply({}, jnp.array(x))
        tin = torch.nn.InstanceNorm2d(4)
        yt = tin(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), yt, rtol=1e-4, atol=1e-5)

    def test_pixel_shuffle_matches_torch(self, rng):
        import torch
        x = rng.randn(2, 4, 4, 12).astype(np.float32)
        y = pixel_shuffle(jnp.array(x), 2)
        yt = torch.nn.PixelShuffle(2)(
            torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(
            np.asarray(y).transpose(0, 3, 1, 2), yt, rtol=1e-6)

    def test_prelu(self):
        x = jnp.array([-2.0, 3.0])
        mod = PReLU()
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)
        np.testing.assert_allclose(np.asarray(y), [-0.5, 3.0])


class TestSpectralNorm:
    def test_sigma_close_to_torch(self, rng):
        """After many power iterations both converge to top singular value."""
        import torch
        from gcc_tpu.ops.spectral import SpectralConv
        x = rng.randn(1, 8, 8, 3).astype(np.float32)
        mod = SpectralConv(features=6, kernel_size=(4, 4), strides=(2, 2),
                           padding=1, power_iterations=30)
        v = mod.init(jax.random.PRNGKey(0), jnp.array(x))
        w = np.asarray(v["params"]["kernel"])
        # top singular value of (out, in*k*k) matricization
        wm = w.transpose(3, 0, 1, 2).reshape(6, -1)
        sv = np.linalg.svd(wm, compute_uv=False)[0]
        y, new_state = mod.apply(v, jnp.array(x), mutable=["spectral"])
        u = np.asarray(new_state["spectral"]["u"])
        sigma = u @ wm @ np.asarray(new_state["spectral"]["v"])
        assert sigma == pytest.approx(sv, rel=1e-3)


class TestFlashAttention:
    def test_matches_einsum(self, rng):
        from gcc_tpu.ops.pallas.attention import flash_attention
        q = jnp.array(rng.randn(2, 96, 8).astype(np.float32))
        k = jnp.array(rng.randn(2, 96, 8).astype(np.float32))
        v = jnp.array(rng.randn(2, 96, 16).astype(np.float32))
        ref = jnp.einsum(
            "bij,bjc->bic",
            jax.nn.softmax(jnp.einsum("bic,bjc->bij", q, k), axis=-1), v)
        from gcc_tpu.ops.pallas.attention import _flash_attention_fwd_only
        out = _flash_attention_fwd_only(q, k, v, block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


class TestFlashAttentionVJP:
    def test_forward_matches_reference_and_grads_flow(self):
        import numpy as np
        import jax, jax.numpy as jnp
        from gcc_tpu.ops.pallas.attention import (_reference_attention,
                                                  flash_attention)
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, 300, 16).astype(np.float32) * 0.1)
        k = jnp.asarray(rng.randn(2, 300, 16).astype(np.float32) * 0.1)
        v = jnp.asarray(rng.randn(2, 300, 24).astype(np.float32))
        out = flash_attention(q, k, v)
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def loss_ref(q, k, v):
            return jnp.sum(_reference_attention(q, k, v) ** 2)

        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)

    def test_grads_multiblock_nonmultiple_n(self):
        """Blockwise backward across several q/k blocks with padding: N=130
        over 64-blocks exercises block loops AND the padded-row/key masking
        in both bwd kernels."""
        import numpy as np
        import jax, jax.numpy as jnp
        from gcc_tpu.ops.pallas.attention import (_reference_attention,
                                                  flash_attention)
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 130, 8).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.randn(1, 130, 8).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.randn(1, 130, 8).astype(np.float32))
        co = jnp.asarray(rng.randn(1, 130, 8).astype(np.float32))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, 64, 64, True) * co)

        def loss_ref(q, k, v):
            return jnp.sum(_reference_attention(q, k, v) * co)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=name)
