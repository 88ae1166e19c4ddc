"""Network topology tests: shapes, cfg-driven widths, elision, intermediates."""

import jax
import jax.numpy as jnp
import pytest

from gcc_tpu.models.generators import (
    UnetGenerator, MobileResnetGenerator, SAGANGenerator, SRResNet,
    unet_default_filter_cfgs, unet_default_channel_cfgs,
    mobile_resnet_default_cfg, sagan_default_filter_cfgs,
)
from gcc_tpu.models.discriminators import (
    PatchGAN, SAGANDiscriminator, SRGANDiscriminator,
)

K = jax.random.PRNGKey(0)


def test_unet_default_cfgs():
    f = unet_default_filter_cfgs(64, 8)
    # downs double to ngf*8 cap; ups mirror (Pix2Pix.py:88-127)
    assert f == [64, 128, 256, 512, 512, 512, 512, 512,
                 512, 512, 512, 512, 256, 128, 64]
    c = unet_default_channel_cfgs(64, 8)
    assert c == [128, 256, 512, 512, 512, 512, 512, 512,
                 1024, 1024, 1024, 1024, 512, 256, 128]


def test_unet_forward_and_features():
    g = UnetGenerator(ngf=4, num_downs=6)
    x = jnp.ones((2, 64, 64, 3))
    v = g.init({"params": K, "dropout": K}, x, train=True)
    y, mut = g.apply(v, x, train=True, mutable=["batch_stats", "intermediates"],
                     rngs={"dropout": K})
    assert y.shape == (2, 64, 64, 3)
    feats = {k: f[0] for k, f in mut["intermediates"].items()}
    # widths: f[1], f[3], concat@3 = f[3]+u4, concat@1 = f[1]+u2
    f = unet_default_filter_cfgs(4, 6)
    assert feats["g_feat_0"].shape[-1] == f[1]
    assert feats["g_feat_1"].shape[-1] == f[3]
    assert feats["g_feat_2"].shape[-1] == f[3] + f[2 * 6 - 1 - 4]
    assert feats["g_feat_3"].shape[-1] == f[1] + f[2 * 6 - 1 - 2]


def test_unet_innermost_elision():
    n = 6
    f = unet_default_filter_cfgs(4, n)
    f[n - 1] = 0
    f[n] = 0
    g = UnetGenerator(ngf=4, num_downs=n, filter_cfgs=f)
    x = jnp.ones((1, 64, 64, 3))
    v = g.init({"params": K, "dropout": K}, x)
    # innermost down/up params must not exist
    assert f"down_{n-1}" not in v["params"]
    assert f"up_{n-1}" not in v["params"]
    y = g.apply(v, x, train=False)
    assert y.shape == (1, 64, 64, 3)


def test_unet_middle_elision():
    n = 6
    f = unet_default_filter_cfgs(4, n)
    f[4] = 0            # depth-4 down
    f[2 * n - 1 - 4] = 0  # paired up
    g = UnetGenerator(ngf=4, num_downs=n, filter_cfgs=f)
    x = jnp.ones((1, 64, 64, 3))
    v = g.init({"params": K, "dropout": K}, x)
    assert "down_4" not in v["params"]
    y = g.apply(v, x, train=False)
    assert y.shape == (1, 64, 64, 3)


def test_unet_pruned_widths():
    n = 6
    f = [3, 5, 7, 9, 11, 13, 13, 11, 9, 7, 5]  # arbitrary nonzero cfg
    g = UnetGenerator(ngf=4, num_downs=n, filter_cfgs=f)
    x = jnp.ones((1, 64, 64, 3))
    v = g.init({"params": K, "dropout": K}, x)
    assert v["params"]["down_0"]["kernel"].shape == (4, 4, 3, 3)
    assert v["params"]["down_3"]["kernel"].shape == (4, 4, 7, 9)  # in=f[2]
    # up at depth 4 out = f[2n-1-4] = f[7] = 11, input = f[5] (innermost chain)
    assert v["params"]["up_4"]["kernel"].shape[-1] == 11
    # up at depth 1: input = concat(f[1], up2_out=f[9]) = 5+7
    assert v["params"]["up_1"]["kernel"].shape == (4, 4, 5 + 7, f[2 * n - 2])


def test_mobile_resnet_block_elision_and_shapes():
    cfg = mobile_resnet_default_cfg(4, 9)
    cfg[3 + 2 * 4] = 0  # elide block 4
    m = MobileResnetGenerator(ngf=4, n_blocks=9, cfg=cfg)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(K, x)
    assert "block_4_sep1" not in v["params"]
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 32, 32, 3)


def test_sagan_generator_shapes():
    g = SAGANGenerator(ngf=8, z_dim=16)
    z = jnp.ones((2, 16))
    v = g.init(K, z)
    y, mut = g.apply(v, z, train=False,
                     mutable=["intermediates", "spectral", "batch_stats"])
    assert y.shape == (2, 64, 64, 3)
    f = sagan_default_filter_cfgs(8, 64)
    feats = mut["intermediates"]
    assert feats["g_feat_0"][0].shape == (2, 8, 8, f[1])
    assert feats["g_feat_1"][0].shape == (2, 32, 32, f[3])


def test_srresnet_shapes_and_elision():
    cfgs = [8] * 16
    cfgs[5] = 0
    sr = SRResNet(n_channels=8, filter_cfgs=cfgs)
    x = jnp.ones((1, 24, 24, 3))
    v = sr.init(K, x)
    assert "block_5_conv1" not in v["params"]
    y = sr.apply(v, x, train=False)
    assert y.shape == (1, 96, 96, 3)


def test_patchgan_shapes_and_arch_collection():
    d = PatchGAN(ndf=8, masked=True)
    x = jnp.ones((1, 64, 64, 6))
    v = d.init(K, x)
    assert "arch" in v  # mask alphas separated for the arch optimizer
    y, mut = d.apply(v, x, train=True,
                     mutable=["batch_stats", "intermediates"])
    # 64 -> 32 -> 16 -> 8 -> 7 -> 6 (strides 2,2,2,1,1 with 4x4 k, p=1)
    assert y.shape == (1, 6, 6, 1)
    feats = mut["intermediates"]
    assert feats["d_feat_0"][0].shape[-1] == 16  # ndf*2
    assert feats["d_feat_1"][0].shape[-1] == 64  # ndf*8


def test_patchgan_plain_has_no_arch():
    d = PatchGAN(ndf=8, masked=False, norm="instance")
    v = d.init(K, jnp.ones((1, 64, 64, 3)))
    assert "arch" not in v
    assert "batch_stats" not in v  # instance norm is stateless


def test_sagan_discriminator_shapes():
    d = SAGANDiscriminator(ndf=8)
    v = d.init(K, jnp.ones((2, 64, 64, 3)))
    y = d.apply(v, jnp.ones((2, 64, 64, 3)), train=False,
                mutable=["spectral", "intermediates"])[0]
    assert y.shape == (2,)


def test_srgan_discriminator_shapes():
    d = SRGANDiscriminator(ndf=8, masked=True)
    v = d.init(K, jnp.ones((2, 96, 96, 3)))
    y = d.apply(v, jnp.ones((2, 96, 96, 3)), train=False,
                mutable=["batch_stats", "intermediates"])[0]
    assert y.shape == (2, 1)
