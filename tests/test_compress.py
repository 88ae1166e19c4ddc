"""Compression golden tests: MACs counting, cfg derivation, budget search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcc_tpu.compress import macs as M
from gcc_tpu.compress import prune as P
from gcc_tpu.models.generators import (
    UnetGenerator, unet_default_filter_cfgs, mobile_resnet_default_cfg,
)

K = jax.random.PRNGKey(0)


def test_unet_macs_hand_computed():
    # ngf=4, num_downs=5, 32x32 input, hand-computed layer by layer
    f = unet_default_filter_cfgs(4, 5)  # [4, 8, 16, 32, 32 | 32, 16, 8, 4]
    assert f == [4, 8, 16, 32, 32, 32, 16, 8, 4]
    expected = 0
    # downs: out spatial 16, 8, 4, 2, 1
    expected += 16 * 16 * 4 * 3 * 16      # d0
    expected += 8 * 8 * 8 * 4 * 16        # d1
    expected += 4 * 4 * 16 * 8 * 16       # d2
    expected += 2 * 2 * 32 * 16 * 16      # d3
    expected += 1 * 1 * 32 * 32 * 16      # d4 (innermost)
    # ups: innermost up in=32 out=f[5]=32 @2; then concat chains
    expected += 2 * 2 * 32 * 32 * 16               # u4
    expected += 4 * 4 * 16 * (32 + 32) * 16        # u3: in = d3 + u4
    expected += 8 * 8 * 8 * (16 + 16) * 16         # u2: in = d2 + u3
    expected += 16 * 16 * 4 * (8 + 8) * 16         # u1: in = d1 + u2
    expected += 32 * 32 * 3 * (4 + 4) * 16         # u0 -> output_nc
    assert M.unet_macs(f, num_downs=5, image_size=32) == expected
    assert M.unet_macs(None, num_downs=5, image_size=32, ngf=4) == expected


def test_unet_macs_elision_reduces():
    f = unet_default_filter_cfgs(4, 6)
    full = M.unet_macs(f, 6, 64)
    f2 = list(f)
    f2[5], f2[6] = 0, 0  # innermost pair
    assert M.unet_macs(f2, 6, 64) < full


def test_mobile_resnet_macs_hand_computed():
    # ngf=2, 1 block, 8x8 input
    cfg = mobile_resnet_default_cfg(2, 1)  # [2, 4, 8, 8, 8, 4, 2]
    assert cfg == [2, 4, 8, 8, 8, 4, 2]
    e = 0
    e += 8 * 8 * 2 * 3 * 49              # conv_in 7x7
    e += 4 * 4 * 4 * 2 * 9               # down0
    e += 2 * 2 * 8 * 4 * 9               # down1
    # block: sep1 = dw(8,g=8)3x3 + pw(8->8); sep2 same
    e += 2 * 2 * 8 * 1 * 9 + 2 * 2 * 8 * 8 * 1
    e += 2 * 2 * 8 * 1 * 9 + 2 * 2 * 8 * 8 * 1
    e += 4 * 4 * 4 * 8 * 9               # up0
    e += 8 * 8 * 2 * 4 * 9               # up1
    e += 8 * 8 * 3 * 2 * 49              # conv_out
    assert M.mobile_resnet_macs(cfg, n_blocks=1, image_size=8) == e


def test_sagan_macs_hand_computed():
    f = [16, 8, 4, 2]
    e = 0
    e += 4 * 4 * 16 * 128 * 16          # l1
    e += 8 * 8 * 8 * 16 * 16            # l2
    e += 16 * 16 * 4 * 8 * 16           # l3
    e += 2 * 16 * 16 * 1 * 4 + 16 * 16 * 4 * 4  # attn1 (q,k -> max(4//8,1)=1; v)
    e += 32 * 32 * 2 * 4 * 16           # l4
    e += 2 * 32 * 32 * 1 * 2 + 32 * 32 * 2 * 2  # attn2
    e += 64 * 64 * 3 * 2 * 16           # last
    assert M.sagan_macs(f, z_dim=128, image_size=64) == e


def test_srresnet_macs_hand_computed():
    f = [4, 0]  # 2 blocks, one elided
    nc = 8
    e = 0
    e += 6 * 6 * 8 * 3 * 81              # conv_in 9x9 @6
    e += 6 * 6 * 4 * 8 * 9 + 6 * 6 * 8 * 4 * 9  # block 0
    e += 6 * 6 * 8 * 8 * 9               # conv_mid
    e += 6 * 6 * 32 * 8 * 9              # subpixel 0 @6
    e += 12 * 12 * 32 * 8 * 9            # subpixel 1 @12
    e += 24 * 24 * 3 * 8 * 81            # conv_out @24
    assert M.srresnet_macs(f, n_channels=nc, n_blocks=2, lr_size=6) == e


# ---------------------------------------------------------------------------
# cfg derivation goldens (synthetic scores)
# ---------------------------------------------------------------------------

def _vec(n_keep, width):
    """width-channel score vector with n_keep entries above 1.0."""
    v = np.full(width, 0.1)
    v[:n_keep] = 2.0
    return v


def test_unet_norm_cfgs_golden():
    n = 8
    keeps = [4, 8, 16, 30, 30, 30, 30, 30,   # d0..d7
             30, 30, 30, 30, 16, 8, 4, 3]    # u7..u1, u0
    widths = [64, 128, 256, 512, 512, 512, 512, 512,
              512, 512, 512, 512, 256, 128, 64, 3]
    scores = [_vec(k, w) for k, w in zip(keeps, widths)]
    fc, cc = P.unet_norm_cfgs(scores, ngf=64, threshold=1.0, num_downs=n)
    assert fc == keeps
    # channels: d0..d7 then concat chain u7+d6, u6+d5, ..., u1+d0
    assert cc[:8] == keeps[:8]
    assert cc[8] == keeps[8] + keeps[6]     # u7 + d6
    assert cc[9] == keeps[9] + keeps[5]     # u6 + d5
    assert cc[14] == keeps[14] + keeps[0]   # u1 + d0


def test_unet_norm_cfgs_zero_stem_fixup():
    n = 8
    keeps = [0, 8, 16, 30, 30, 30, 30, 30, 30, 30, 30, 30, 16, 8, 4, 3]
    widths = [64, 128, 256, 512, 512, 512, 512, 512,
              512, 512, 512, 512, 256, 128, 64, 3]
    scores = [_vec(k, w) for k, w in zip(keeps, widths)]
    fc, cc = P.unet_norm_cfgs(scores, ngf=64, threshold=1.0, num_downs=n)
    assert fc[0] == 64 and cc[0] == 64
    assert cc[-1] == keeps[14] + 64  # u1 + restored d0


def test_unet_scale_cfgs_golden():
    n = 8
    # order d1..d6, u7, u6..u1
    keeps = [8, 16, 30, 30, 30, 30,  30, 30, 30, 30, 16, 8, 4]
    widths = [128, 256, 512, 512, 512, 512, 512, 512, 512, 512, 256, 128, 64]
    scores = [_vec(k, w) for k, w in zip(keeps, widths)]
    fc, cc = P.unet_scale_cfgs(scores, ngf=64, threshold=1.0, num_downs=n)
    # filter: [ngf, d1..d6, d7=ngf*8, u7..u1]
    assert fc == [64, 8, 16, 30, 30, 30, 30, 512, 30, 30, 30, 30, 16, 8, 4]
    assert cc[:8] == [64, 8, 16, 30, 30, 30, 30, 512]
    assert cc[8] == 30 + 30      # u7 + d6
    assert cc[9] == 30 + 30      # u6 + d5
    assert cc[14] == 4 + 64      # u1 + ngf stem


def test_unet_scale_cfgs_innermost_cascade():
    """u7 pruned to zero must zero the innermost down (Pix2Pix.py:839-848)."""
    n = 8
    keeps = [8, 16, 30, 30, 30, 30,  0, 30, 30, 30, 16, 8, 4]
    widths = [128, 256, 512, 512, 512, 512, 512, 512, 512, 512, 256, 128, 64]
    scores = [_vec(k, w) for k, w in zip(keeps, widths)]
    fc, cc = P.unet_scale_cfgs(scores, ngf=64, threshold=1.0, num_downs=n)
    assert fc[7] == 0 and fc[8] == 0  # d7 and u7 both zeroed
    assert cc[8] == 0 + 30            # u7(0) + d6


def test_mobile_resnet_cfgs_residual_tying():
    layers = {
        "conv_in": _vec(3, 4), "down_0": _vec(5, 8),
        "up_0": _vec(6, 8), "up_1": _vec(2, 4),
    }
    for b in range(9):
        layers[f"block_{b}_sep1"] = _vec(b + 1, 16)
    res = _vec(7, 16)
    cfg = P.mobile_resnet_cfgs(layers, res, threshold=1.0)
    assert len(cfg) == 23
    assert cfg[0] == 3 and cfg[1] == 5
    assert cfg[2] == 7                       # residual count
    assert all(cfg[4 + 2 * b] == 7 for b in range(9))  # tied residual entries
    assert [cfg[3 + 2 * b] for b in range(9)] == list(range(1, 10))
    assert cfg[21] == 6 and cfg[22] == 2


def test_cyclegan_reference_cfgs_budgets():
    """The hard-coded horse2zebra cfgs must land near the script budgets
    (2.4G / 2.7G at 256^2; scripts/cyclegan/train.sh:11-12, tolerance 0.05)."""
    a, b = P.cyclegan_reference_cfgs()
    ga = M.mobile_resnet_macs(a, 9, 256) / 1e9
    gb = M.mobile_resnet_macs(b, 9, 256) / 1e9
    assert abs(ga - 2.4) < 0.1, ga
    assert abs(gb - 2.7) < 0.1, gb


def _sparse_like(shapes, rng):
    """Weights with long-tailed per-out-channel magnitudes, emulating the
    spread that L1-sparsity pretraining produces (the search needs a wide
    reachable-MACs range, as in the real pipeline)."""
    def gen(s):
        w = rng.rand(*s.shape).astype(np.float32)
        scale = np.exp(rng.uniform(-6, 2, s.shape[-1])).astype(np.float32)
        return w * scale
    return jax.tree_util.tree_map(gen, shapes)


def test_binary_search_unet_budget():
    """End-to-end: sparse-like weights -> cfgs within tolerance of budget."""
    rng = np.random.RandomState(0)
    n = 8
    g = UnetGenerator(ngf=32, num_downs=n)
    x = jnp.ones((1, 256, 256, 3))
    shapes = jax.eval_shape(
        lambda k: g.init({"params": k, "dropout": k}, x), K)["params"]
    params = _sparse_like(shapes, rng)
    fc, cc, gmacs = P.prune_unet(
        params, mode="norm", ngf=32, target_budget_g=3.0, tolerance_g=0.1)
    assert abs(gmacs - 3.0) <= 0.1
    # the pruned model must actually build and run at the claimed MACs
    gp = UnetGenerator(ngf=32, num_downs=n, filter_cfgs=fc, channel_cfgs=cc)
    y = jax.eval_shape(
        lambda k: gp.init({"params": k, "dropout": k}, x), K)
    assert "params" in y


def test_binary_search_scale_mode():
    rng = np.random.RandomState(1)
    n = 8
    g = UnetGenerator(ngf=32, num_downs=n)
    x = jnp.ones((1, 256, 256, 3))
    shapes = jax.eval_shape(
        lambda k: g.init({"params": k, "dropout": k}, x), K)["params"]
    params = _sparse_like(shapes, rng)
    fc, cc, gmacs = P.prune_unet(
        params, mode="scale", ngf=32, target_budget_g=3.0, tolerance_g=0.1)
    assert abs(gmacs - 3.0) <= 0.1
    assert fc[0] == 32  # stem fixed at ngf in scale mode


def test_tolerance_for():
    assert P.tolerance_for("database/cityscapes") == 0.1
    assert P.tolerance_for("database/sr_dataset") == 0.01
    assert P.tolerance_for("database/celeb") == 0.001
