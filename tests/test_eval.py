"""Eval orchestrator protocol tests."""

import logging

import numpy as np
import jax
import pytest

from gcc_tpu.config import Config
from gcc_tpu.eval.orchestrators import eval_cfg, evaluate_engine, pixel_fid

K = jax.random.PRNGKey(0)


def test_eval_cfg_protocol_overrides():
    cfg = Config(model="pix2pix", batch_size=32, serial_batches=False,
                 no_flip=False, dataset_mode="aligned", phase="train")
    e = eval_cfg(cfg, load_size=256)
    # bs=1, serial, no flip, val phase (test_metric.py:16-21)
    assert e.batch_size == 1 and e.serial_batches and e.no_flip
    assert e.phase == "val" and e.load_size == 256


def test_eval_cfg_synthetic_keeps_phase():
    cfg = Config(model="pix2pix", dataset_mode="synthetic", phase="train")
    assert eval_cfg(cfg).phase == "train"


def test_pixel_fid_orders_distributions():
    rng = np.random.RandomState(0)
    base = rng.rand(32, 16, 16, 3).astype(np.float32) * 2 - 1
    near = np.clip(base + rng.randn(*base.shape) * 0.02, -1, 1)
    far = np.clip(base + 0.8, -1, 1)
    d_self = pixel_fid(base, base.copy())
    d_near = pixel_fid(near.astype(np.float32), base)
    d_far = pixel_fid(far.astype(np.float32), base)
    assert d_self < 1e-6
    assert d_self <= d_near < d_far


def test_evaluate_pix2pix_synthetic_proxy():
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", dataset_mode="synthetic", dataroot="synth",
                 ngf=4, ndf=4, num_downs=5, crop_size=32, load_size=32,
                 ntest=8, num_threads=1)
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(K)
    fid = evaluate_engine(cfg, eng, state, logging.getLogger(__name__), 1)
    assert np.isfinite(fid) and fid > 0


def test_eval_batch_matches_bs1_protocol():
    """--eval_batch >1 batches the generator forwards; the metric must be
    the bs=1 protocol's (eval mode is deterministic per-sample: running BN
    stats, no dropout) with the ntest cap and order preserved."""
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", dataset_mode="synthetic", dataroot="synth",
                 ngf=4, ndf=4, num_downs=5, crop_size=32, load_size=32,
                 ntest=8, num_threads=1)
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(K)
    log = logging.getLogger(__name__)
    fid1 = evaluate_engine(cfg, eng, state, log, 1)
    # batch 3 does not divide the cap 8: exercises the overshoot trim
    fid3 = evaluate_engine(cfg.replace(eval_batch=3), eng, state, log, 1)
    np.testing.assert_allclose(fid3, fid1, rtol=1e-4)
    assert eval_cfg(cfg.replace(eval_batch=3)).batch_size == 3


def test_evaluate_srgan_returns_named_metrics():
    from gcc_tpu.engines.srgan import SRGANEngine
    cfg = Config(model="srgan", dataset_mode="synthetic", dataroot="",
                 ngf=4, ndf=4, image_size=32, upscale_factor=4,
                 num_threads=1)
    eng = SRGANEngine(cfg)
    state = eng.init_state(K)
    out = evaluate_engine(cfg, eng, state, logging.getLogger(__name__), 1)
    assert "val_psnr" in out and "val_ssim" in out
    assert np.isfinite(out["val_psnr"])
    assert -1.0 <= out["val_ssim"] <= 1.0
