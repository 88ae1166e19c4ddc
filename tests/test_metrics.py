"""Metric golden tests: FID math, PSNR/SSIM, InceptionV3/DRN ports."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcc_tpu.metrics.fid import (activation_statistics, fid_from_activations,
                                 frechet_distance)
from gcc_tpu.metrics.psnr_ssim import psnr_y, ssim_y, y_channel

K = jax.random.PRNGKey(0)


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.RandomState(0)
        acts = rng.randn(500, 8)
        mu, sigma = activation_statistics(acts)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift_closed_form(self):
        """For equal covariances, FID = ||mu1 - mu2||^2."""
        rng = np.random.RandomState(1)
        acts = rng.randn(2000, 4)
        mu, sigma = activation_statistics(acts)
        shift = np.array([1.0, -2.0, 0.5, 0.0])
        d = frechet_distance(mu, sigma, mu + shift, sigma)
        assert abs(d - shift @ shift) < 1e-6

    def test_diagonal_gaussians_closed_form(self):
        """Diagonal covs: FID = |mu|^2 + sum (sqrt(s1) - sqrt(s2))^2."""
        s1 = np.diag([1.0, 4.0])
        s2 = np.diag([9.0, 1.0])
        d = frechet_distance(np.zeros(2), s1, np.zeros(2), s2)
        expected = (1 - 3) ** 2 + (2 - 1) ** 2
        assert abs(d - expected) < 1e-8

    def test_fid_from_activations(self):
        rng = np.random.RandomState(2)
        real = rng.randn(1000, 6)
        mu, sigma = activation_statistics(real)
        close = fid_from_activations(rng.randn(1000, 6), mu, sigma)
        far = fid_from_activations(rng.randn(1000, 6) + 3.0, mu, sigma)
        assert far > close


class TestPsnrSsim:
    def test_y_channel_weights(self):
        white = np.ones((16, 16, 3), np.float32)  # [-1,1] -> 255 rgb
        y = y_channel(white)
        # 255*[1,1,1]@w/255 + 16 = 219 + 16 = 235 (video white)
        np.testing.assert_allclose(y, 235.0, atol=1e-3)
        black = -np.ones((16, 16, 3), np.float32)
        np.testing.assert_allclose(y_channel(black), 16.0, atol=1e-3)

    def test_psnr_known_shift(self):
        rng = np.random.RandomState(0)
        r = rng.rand(32, 32, 3).astype(np.float32) * 2 - 1
        f = np.clip(r + 0.02, -1, 1)
        p1 = psnr_y(f, r)
        p2 = psnr_y(np.clip(r + 0.1, -1, 1), r)
        assert p1 > p2 > 0

    def test_ssim_identity_and_noise(self):
        rng = np.random.RandomState(0)
        r = rng.rand(32, 32, 3).astype(np.float32) * 2 - 1
        assert abs(ssim_y(r, r) - 1.0) < 1e-9
        noisy = np.clip(r + rng.randn(32, 32, 3) * 0.3, -1, 1)
        assert ssim_y(noisy.astype(np.float32), r) < 0.9


class TestInception:
    def test_forward_shape_and_port_roundtrip(self):
        from gcc_tpu.metrics.inception import (FIDInceptionV3,
                                               load_torch_fid_inception)
        model = FIDInceptionV3()
        x = jnp.zeros((1, 64, 64, 3))
        shapes = jax.eval_shape(lambda k: model.init(k, x), K)["params"]

        # synthesize a torch-layout state_dict from the flax structure
        sd = {}
        rng = np.random.RandomState(0)

        def add(prefix, node):
            w = node["weight"]
            h_, w_, i_, o_ = w.shape
            fan_in = h_ * w_ * i_
            sd[f"{prefix}.conv.weight"] = (
                rng.randn(o_, i_, h_, w_) / np.sqrt(fan_in)
            ).astype(np.float32)
            for tname, val in (("weight", rng.rand(o_)),
                               ("bias", rng.randn(o_) * 0.1),
                               ("running_mean", rng.randn(o_) * 0.1),
                               ("running_var", 1 + rng.rand(o_))):
                sd[f"{prefix}.bn.{tname}"] = val.astype(np.float32)

        for top, node in shapes.items():
            if "weight" in node:
                add(top, node)
            else:
                for br, sub in node.items():
                    add(f"{top}.{br}", sub)
        np.savez("/tmp/fake_inception.npz", **sd)
        params = load_torch_fid_inception("/tmp/fake_inception.npz")

        # ported tree must match the module's own structure exactly
        ported_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        init_shapes = jax.tree_util.tree_map(lambda a: a.shape, shapes)
        assert ported_shapes == init_shapes

        out = model.apply({"params": params}, jnp.zeros((2, 64, 64, 3)))
        assert out.shape == (2, 2048)
        assert np.all(np.isfinite(np.asarray(out)))


class TestDRN:
    def test_forward_and_upsample_shapes(self):
        from gcc_tpu.metrics.miou import DRNSeg, upsample_logits_8x
        model = DRNSeg(layers=(1, 1, 1, 1, 2, 1, 1, 1))  # shrunken depth
        x = jnp.zeros((1, 64, 128, 3))
        v = model.init(K, x)
        logits = model.apply(v, x)
        assert logits.shape == (1, 8, 16, 19)
        up = upsample_logits_8x(logits)
        assert up.shape == (1, 64, 128, 19)

    def test_port_roundtrip(self):
        from gcc_tpu.metrics.miou import (DRNSeg, DRN_D_105_LAYERS,
                                          load_torch_drnseg)
        model = DRNSeg()
        x = jnp.zeros((1, 32, 32, 3))
        shapes = jax.eval_shape(lambda k: model.init(k, x), K)["params"]

        sd = {}
        rng = np.random.RandomState(0)

        def t_conv(flax_shape):
            h, w, i, o = flax_shape
            return rng.rand(o, i, h, w).astype(np.float32)

        ly = DRN_D_105_LAYERS
        def add_convbn(conv_key, bn_key, node, ck="conv", bn=""):
            sd[conv_key] = t_conv(node[ck].shape)
            c = node[ck].shape[-1]
            for tname in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{bn_key}.{tname}"] = rng.rand(c).astype(np.float32)

        add_convbn("base.0.0.weight", "base.0.1", shapes["layer0_0"])
        for li, n in ((1, ly[0]), (2, ly[1]), (7, ly[6]), (8, ly[7])):
            for i in range(n):
                add_convbn(f"base.{li}.{3*i}.weight", f"base.{li}.{3*i+1}",
                           shapes[f"layer{li}_{i}"])
        for li, n in ((3, ly[2]), (4, ly[3]), (5, ly[4]), (6, ly[5])):
            for b in range(n):
                node = shapes[f"layer{li}_{b}"]
                pre = f"base.{li}.{b}"
                for j in (1, 2, 3):
                    sd[f"{pre}.conv{j}.weight"] = t_conv(
                        node[f"conv{j}"].shape)
                    c = node[f"conv{j}"].shape[-1]
                    for tname in ("weight", "bias", "running_mean",
                                  "running_var"):
                        sd[f"{pre}.bn{j}.{tname}"] = rng.rand(c).astype(
                            np.float32)
                if "down_conv" in node:
                    sd[f"{pre}.downsample.0.weight"] = t_conv(
                        node["down_conv"].shape)
                    c = node["down_conv"].shape[-1]
                    for tname in ("weight", "bias", "running_mean",
                                  "running_var"):
                        sd[f"{pre}.downsample.1.{tname}"] = rng.rand(
                            c).astype(np.float32)
        sd["seg.weight"] = t_conv(shapes["seg_kernel"].shape)
        sd["seg.bias"] = rng.rand(19).astype(np.float32)
        np.savez("/tmp/fake_drn.npz", **sd)

        params = load_torch_drnseg("/tmp/fake_drn.npz")
        ported = jax.tree_util.tree_map(lambda a: a.shape, params)
        init = jax.tree_util.tree_map(lambda a: a.shape, shapes)
        assert ported == init

    def test_fast_hist_and_miou_golden(self):
        from gcc_tpu.metrics.miou import fast_hist, miou_from_hist, \
            per_class_iu
        # toy: 2 classes, pred = [0,0,1,1], label = [0,1,1,1]
        pred = np.array([0, 0, 1, 1])
        label = np.array([0, 1, 1, 1])
        h = fast_hist(pred, label, 2)
        # class0: tp=1, fp=1, fn=0 -> IoU 1/2; class1: tp=2, fp=0, fn=1 -> 2/3
        ious = per_class_iu(h)
        np.testing.assert_allclose(ious, [0.5, 2 / 3])
        assert miou_from_hist(h) == round(np.mean([50, 200 / 3]), 2)
        # ignore labels outside [0, n)
        h2 = fast_hist(pred, np.array([0, 255, 1, 1]), 2)
        assert h2.sum() == 3

    def test_bilinear_up_weights(self):
        from gcc_tpu.metrics.miou import bilinear_up_weights
        w = bilinear_up_weights(16)
        assert w.shape == (16, 16)
        # even-kernel bilinear peak: (1 - 0.5/8)^2 (fill_up_weights,
        # mIoU_score.py:114-121)
        assert abs(w.max() - (1 - 0.5 / 8) ** 2) < 1e-6
        assert w[0, 0] < w[7, 7]  # symmetric ramp
