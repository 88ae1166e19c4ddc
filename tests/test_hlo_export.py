"""StableHLO serving export (gcc_tpu.utils.hlo_export + cli.export).

Pins the serving contract: a serialized artifact deserializes WITHOUT any
engine/checkpoint context and reproduces engine.generate exactly, with a
symbolic batch dimension, for every generator family. Beyond the reference
(whose only deployment path is torch-loading the .pth, test.py:131-163).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jexport

from gcc_tpu.config import Config
from gcc_tpu.utils import hlo_export as hx

K = jax.random.PRNGKey(0)
R = np.random.RandomState(0)


def img(b, s):
    return jnp.asarray(R.rand(b, s, s, 3).astype(np.float32) * 2 - 1)


def roundtrip(exp):
    return jexport.deserialize(bytearray(bytes(exp.serialize())))


def tiny_pix2pix():
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 crop_size=32, num_downs=5)
    eng = Pix2PixEngine(cfg)
    return cfg, eng, eng.init_state(K)


class TestExportGenerator:
    def test_pix2pix_poly_batch_roundtrip(self):
        _, eng, state = tiny_pix2pix()
        exp = hx.export_generator(eng, state, (1, 32, 32, 3),
                                  platforms=("cpu", "tpu"))
        g = roundtrip(exp)
        for b in (1, 3):
            x = img(b, 32)
            np.testing.assert_allclose(np.asarray(g.call(x)),
                                       np.asarray(eng.generate(state, x)),
                                       atol=1e-6)

    def test_cyclegan_directions(self):
        from gcc_tpu.engines.cyclegan import CycleGANEngine
        cfg = Config(model="cyclegan", ngf=4, ndf=4, teacher_ngf=4,
                     teacher_ndf=4, crop_size=32)
        eng = CycleGANEngine(cfg)
        state = eng.init_state(K, image_size=32)
        x = img(2, 32)
        for d in ("AtoB", "BtoA"):
            g = roundtrip(hx.export_generator(eng, state, (1, 32, 32, 3),
                                              direction=d,
                                              platforms=("cpu",)))
            np.testing.assert_allclose(
                np.asarray(g.call(x)),
                np.asarray(eng.generate(state, x, direction=d)), atol=1e-6)

    def test_sagan_z_input_forces_einsum_attention(self):
        from gcc_tpu.engines.sagan import SAGANEngine
        cfg = Config(model="sagan", ngf=4, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, crop_size=64, z_dim=16,
                     pallas_attn_threshold=1)  # portable clone must undo this
        eng = SAGANEngine(cfg)
        state = eng.init_state(K)
        g = roundtrip(hx.export_generator(eng, state, (1, 16),
                                          platforms=("cpu", "tpu")))
        z = jnp.asarray(R.randn(2, 16).astype(np.float32))
        np.testing.assert_allclose(np.asarray(g.call(z)),
                                   np.asarray(eng.generate(state, z)),
                                   atol=1e-6)

    def test_srgan_upscale_and_bf16(self):
        from gcc_tpu.engines.srgan import SRGANEngine
        cfg = Config(model="srgan", ngf=4, ndf=4, image_size=32,
                     upscale_factor=4, generator_only=True)
        eng = SRGANEngine(cfg)
        state = eng.init_state(K)
        assert hx.example_input_shape(cfg) == (1, 8, 8, 3)
        g = roundtrip(hx.export_generator(eng, state, (1, 8, 8, 3),
                                          platforms=("cpu",)))
        x = img(2, 8)
        y = np.asarray(g.call(x))
        assert y.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(y, np.asarray(eng.generate(state, x)),
                                   atol=1e-6)
        # bf16 serving artifact: same function at bf16 tolerance
        gb = roundtrip(hx.export_generator(eng, state, (1, 8, 8, 3),
                                           platforms=("cpu",),
                                           dtype=jnp.bfloat16))
        yb = np.asarray(gb.call(x.astype(jnp.bfloat16)), dtype=np.float32)
        assert yb.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(yb, y, atol=0.1)

    def test_int8_weight_quant_quality_and_size(self):
        """int8 weight-only artifact: ~4x smaller on disk, near-f32 output.

        ngf=16 so weights dominate the serialized bytes (at ngf=4 the
        StableHLO text overhead would mask the constant-size win)."""
        from gcc_tpu.engines.pix2pix import Pix2PixEngine
        cfg = Config(model="pix2pix", ngf=16, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, crop_size=32, num_downs=5)
        eng = Pix2PixEngine(cfg)
        state = eng.init_state(K)
        exp_f32 = hx.export_generator(eng, state, (1, 32, 32, 3),
                                      platforms=("cpu",))
        exp_q = hx.export_generator(eng, state, (1, 32, 32, 3),
                                    platforms=("cpu",), weight_quant="int8")
        b_f32 = bytes(exp_f32.serialize())
        b_q = bytes(exp_q.serialize())
        assert len(b_q) < 0.5 * len(b_f32), (len(b_q), len(b_f32))

        g = jexport.deserialize(bytearray(b_q))
        x = img(2, 32)
        y0 = np.asarray(eng.generate(state, x))
        y1 = np.asarray(g.call(x))
        assert np.abs(y1 - y0).max() < 0.02
        mse = float(np.mean((y1 - y0) ** 2))
        psnr = 10 * np.log10(4.0 / mse)  # outputs live in [-1, 1]
        assert psnr > 45.0, psnr

    def test_quantize_int8_leaf_selection(self):
        """Only ndim>=2 floating leaves quantize; norm affines pass through;
        per-channel scales reconstruct within one quantization step."""
        _, eng, state = tiny_pix2pix()
        params = jax.device_get(state.nets["g"])["params"]
        leaves, _, qinfo = hx.quantize_int8(params)
        assert any(i is not None for i in qinfo)
        for w, info in zip(leaves, qinfo):
            w = np.asarray(w)
            if w.ndim >= 2:
                assert info is not None
                q, s = info
                assert q.dtype == np.int8 and q.shape == w.shape
                assert s.shape == (1,) * (w.ndim - 1) + (w.shape[-1],)
                err = np.abs(q.astype(np.float32) * s - w)
                assert (err < s + 1e-12).all(), err.max()
            else:
                assert info is None

    def test_teacher_export(self):
        from gcc_tpu.engines.pix2pix import Pix2PixEngine
        cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8,
                     teacher_ndf=8, crop_size=32, num_downs=5,
                     online_distillation=True)
        eng = Pix2PixEngine(cfg)
        state = eng.init_state(K)
        g = roundtrip(hx.export_generator(eng, state, (1, 32, 32, 3),
                                          teacher=True, platforms=("cpu",)))
        x = img(1, 32)
        np.testing.assert_allclose(
            np.asarray(g.call(x)),
            np.asarray(eng.generate(state, x, teacher=True)), atol=1e-6)


def test_cli_export(tmp_path):
    """End-to-end: checkpoint -> cli.export -> deserialize -> call."""
    from gcc_tpu.cli.export import main
    from gcc_tpu.utils.checkpoint import save_checkpoint

    _, eng, state = tiny_pix2pix()
    ckpt = eng.checkpoint_payload(state, epoch=1, metric=0.0)
    ckpt_path = os.path.join(tmp_path, "model_best.ckpt")
    save_checkpoint(ckpt_path, ckpt)

    out_dir = os.path.join(tmp_path, "serving")
    rc = main(["--output_dir", out_dir, "--platforms", "cpu",
               "--model", "pix2pix", "--dataroot", str(tmp_path),
               "--name", "exp", "--checkpoints_dir", str(tmp_path),
               "--pretrain_path", ckpt_path,
               "--ngf", "4", "--ndf", "4", "--num_downs", "5",
               "--crop_size", "32"])
    assert rc == 0
    path = os.path.join(out_dir, "pix2pix_G.stablehlo")
    assert os.path.exists(path)
    g = hx.load_exported(path)
    x = img(2, 32)
    np.testing.assert_allclose(np.asarray(g.call(x)),
                               np.asarray(eng.generate(state, x)), atol=1e-6)

    # --quantize int8 writes a suffixed artifact that still calls
    rc = main(["--output_dir", out_dir, "--platforms", "cpu",
               "--quantize", "int8",
               "--model", "pix2pix", "--dataroot", str(tmp_path),
               "--name", "exp", "--checkpoints_dir", str(tmp_path),
               "--pretrain_path", ckpt_path,
               "--ngf", "4", "--ndf", "4", "--num_downs", "5",
               "--crop_size", "32"])
    assert rc == 0
    qpath = os.path.join(out_dir, "pix2pix_G_int8.stablehlo")
    gq = hx.load_exported(qpath)
    np.testing.assert_allclose(np.asarray(gq.call(x)),
                               np.asarray(eng.generate(state, x)), atol=0.02)
