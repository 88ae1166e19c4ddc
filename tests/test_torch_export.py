"""Reverse-port parity: GCC-TPU params exported to torch state_dicts must
drive the reference topologies (torch-built from spec) to the same outputs.

Mirrors tests/test_torch_parity.py in the other direction: init a Flax
generator with random params/stats, export via gcc_tpu.utils.torch_export,
`load_state_dict(strict=True)` into the reference topology, and require
output parity. strict=True also pins key-set completeness.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcc_tpu.utils import torch_export as te  # noqa: E402
from test_torch_parity import (  # noqa: E402
    build_torch_masked_patchgan, build_torch_mobile_resnet,
    build_torch_patchgan, build_torch_sagan_d, build_torch_sagan_g,
    build_torch_srgan_d, build_torch_srresnet, build_torch_unet,
    nchw, to_nhwc, assert_close)

K = jax.random.PRNGKey(7)
R = np.random.RandomState(7)


def _randomize_stats(stats):
    """Non-trivial BN running stats (mean 0 / var 1 would hide transposes)."""
    def f(path, a):
        leaf = str(getattr(path[-1], "key", path[-1]))
        r = R.rand(*np.shape(a)).astype(np.float32)
        return r * 0.2 if leaf == "mean" else 1.0 + r
    return jax.tree_util.tree_map_with_path(f, stats)


def test_export_unet_generator():
    from gcc_tpu.models.generators import UnetGenerator
    g = UnetGenerator(ngf=4, num_downs=5, use_dropout=False)
    x = R.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    v = g.init({"params": K, "dropout": K}, jnp.asarray(x), train=False)
    stats = _randomize_stats(v["batch_stats"])
    y = g.apply({"params": v["params"], "batch_stats": stats},
                jnp.asarray(x), train=False)

    tg = build_torch_unet(ngf=4, num_downs=5)
    sd = te.export_unet_generator(v["params"], stats, num_downs=5)
    tg.load_state_dict({k: torch.tensor(val) for k, val in sd.items()},
                       strict=True)
    tg.eval()
    with torch.no_grad():
        ty = to_nhwc(tg(nchw(x)))
    assert_close(y, ty, tol=3e-4)


def test_export_patchgan():
    from gcc_tpu.models.discriminators import PatchGAN
    d = PatchGAN(ndf=8, norm="batch", masked=False)
    x = R.rand(1, 32, 32, 6).astype(np.float32) * 2 - 1
    v = d.init({"params": K}, jnp.asarray(x), train=False)
    stats = _randomize_stats(v["batch_stats"])
    y = d.apply({"params": v["params"], "batch_stats": stats},
                jnp.asarray(x), train=False)

    net = build_torch_patchgan(8)
    sd = te.export_patchgan(v["params"], stats)
    # the spec builder is a bare Sequential; strip the "model." prefix
    net.load_state_dict({k[len("model."):]: torch.tensor(val)
                         for k, val in sd.items()}, strict=True)
    net.eval()
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    assert_close(y, ty, tol=3e-4)


def _randomize_alphas(arch):
    """Alphas straddling the 0.5 threshold so masks really gate channels."""
    return jax.tree_util.tree_map(
        lambda a: R.rand(*np.shape(a)).astype(np.float32), arch)


def test_export_masked_patchgan():
    """Pins the DARTS index layout ([0,3,7,11]/[2,5,9,13]/out 15) of
    export_patchgan(masked=True) by strict-load + output parity."""
    from gcc_tpu.models.discriminators import PatchGAN
    d = PatchGAN(ndf=8, norm="batch", masked=True)
    x = R.rand(2, 32, 32, 6).astype(np.float32) * 2 - 1
    v = d.init({"params": K}, jnp.asarray(x), train=False)
    stats = _randomize_stats(v["batch_stats"])
    arch = _randomize_alphas(v["arch"])
    y = d.apply({"params": v["params"], "batch_stats": stats, "arch": arch},
                jnp.asarray(x), train=False)

    net = build_torch_masked_patchgan(8)
    sd = te.export_patchgan(v["params"], stats, arch, masked=True)
    net.load_state_dict({k[len("model."):]: torch.tensor(val)
                         for k, val in sd.items()}, strict=True)
    net.eval()
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    assert_close(y, ty, tol=3e-4)


def test_export_sagan_discriminator():
    from gcc_tpu.models.discriminators import SAGANDiscriminator
    torch.manual_seed(5)
    d = SAGANDiscriminator(ndf=8, masked=True)
    x = R.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    v = d.init({"params": K}, jnp.asarray(x), train=False)
    arch = _randomize_alphas(v["arch"])
    y = d.apply({"params": v["params"], "spectral": v["spectral"],
                 "arch": arch}, jnp.asarray(x), train=False)

    net = build_torch_sagan_d(8, masked=True)
    sd = te.export_sagan_discriminator(v["params"], v["spectral"], arch)
    net.load_state_dict({k: torch.tensor(np.asarray(val))
                         for k, val in sd.items()}, strict=True)
    net.eval()
    with torch.no_grad():
        ty = net(nchw(x)).numpy()
    assert_close(y, ty, tol=5e-4)


def test_export_srgan_discriminator():
    """The reference's default SRGAN load path does ckpt['D'] — the export
    must strict-load into the reference VGG-style topology."""
    from gcc_tpu.models.discriminators import SRGANDiscriminator
    d = SRGANDiscriminator(ndf=8, masked=True)
    x = R.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    v = d.init({"params": K}, jnp.asarray(x), train=False)
    stats = _randomize_stats(v["batch_stats"])
    arch = _randomize_alphas(v["arch"])
    y = d.apply({"params": v["params"], "batch_stats": stats, "arch": arch},
                jnp.asarray(x), train=False)

    net = build_torch_srgan_d(8, masked=True)
    sd = te.export_srgan_discriminator(v["params"], stats, arch)
    net.load_state_dict({k: torch.tensor(val) for k, val in sd.items()},
                        strict=True)
    net.eval()
    with torch.no_grad():
        ty = net(nchw(x)).numpy()
    assert_close(np.asarray(y), ty, tol=3e-4)


def test_export_checkpoint_srgan_emits_discriminator(tmp_path):
    """export_checkpoint('srgan') carries 'D' when the ckpt has one, so the
    reference's load_discriminator=True default path works."""
    from gcc_tpu.models.discriminators import SRGANDiscriminator
    from gcc_tpu.models.generators import SRResNet
    g = SRResNet(n_channels=8, n_blocks=2)
    d = SRGANDiscriminator(ndf=8)
    xg = jnp.asarray(R.rand(1, 12, 12, 3).astype(np.float32))
    xd = jnp.asarray(R.rand(1, 48, 48, 3).astype(np.float32))
    vg = g.init({"params": K}, xg, train=False)
    vd = d.init({"params": K}, xd, train=False)
    ckpt = {"G": {"params": vg["params"],
                  "batch_stats": vg["batch_stats"]},
            "D": {"params": vd["params"],
                  "batch_stats": vd["batch_stats"]},
            "epoch": 3, "cfg": (None, None), "psnr": 30.0}
    out = te.export_checkpoint("srgan", ckpt, str(tmp_path / "srgan.pth"),
                               n_blocks=2)
    assert "D" in out and any(k.startswith("conv_blocks.") for k in out["D"])
    net = build_torch_srgan_d(8)
    net.load_state_dict(out["D"], strict=True)


def test_export_mobile_resnet():
    from gcc_tpu.models.generators import MobileResnetGenerator
    g = MobileResnetGenerator(ngf=4, n_blocks=2)
    x = R.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    v = g.init({"params": K}, jnp.asarray(x), train=False)
    y = g.apply(v, jnp.asarray(x), train=False)

    net = build_torch_mobile_resnet(4, n_blocks=2)
    sd = te.export_mobile_resnet(v["params"], n_blocks=2)
    net.load_state_dict({k: torch.tensor(val) for k, val in sd.items()},
                        strict=True)
    net.eval()
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    assert_close(y, ty, tol=3e-4)


def test_export_sagan_generator():
    from gcc_tpu.models.generators import SAGANGenerator
    torch.manual_seed(3)
    g = SAGANGenerator(ngf=8, z_dim=8)
    z = R.randn(2, 8).astype(np.float32)
    v = g.init({"params": K}, jnp.asarray(z), train=False)
    stats = _randomize_stats(v["batch_stats"])
    y = g.apply({"params": v["params"], "batch_stats": stats,
                 "spectral": v["spectral"]}, jnp.asarray(z), train=False)

    tg = build_torch_sagan_g(ngf=8, z_dim=8)
    sd = te.export_sagan_generator(v["params"], stats, v["spectral"])
    tg.load_state_dict({k: torch.tensor(np.asarray(val))
                        for k, val in sd.items()}, strict=True)
    tg.eval()
    with torch.no_grad():
        ty = to_nhwc(tg(torch.tensor(z)))
    assert_close(y, ty, tol=5e-4)


def test_export_srresnet():
    from gcc_tpu.models.generators import SRResNet
    g = SRResNet(n_channels=8, n_blocks=2)
    x = R.rand(1, 12, 12, 3).astype(np.float32) * 2 - 1
    v = g.init({"params": K}, jnp.asarray(x), train=False)
    stats = _randomize_stats(v["batch_stats"])
    y = g.apply({"params": v["params"], "batch_stats": stats},
                jnp.asarray(x), train=False)

    net = build_torch_srresnet(8, n_blocks=2)
    sd = te.export_srresnet(v["params"], stats, n_blocks=2)
    net.load_state_dict({k: torch.tensor(val) for k, val in sd.items()},
                        strict=True)
    net.eval()
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    assert_close(y, ty, tol=3e-4)


def test_reverse_convert_cli_roundtrip(tmp_path):
    """gcc-tpu ckpt -> --reverse .pth -> forward convert -> same generator."""
    from gcc_tpu.cli.convert import convert, convert_reverse
    from gcc_tpu.models.generators import UnetGenerator
    from gcc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    g = UnetGenerator(ngf=4, num_downs=5, use_dropout=False)
    x = R.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    v = g.init({"params": K, "dropout": K}, jnp.asarray(x), train=False)
    stats = _randomize_stats(v["batch_stats"])
    ours = {"G": {"params": v["params"], "batch_stats": stats},
            "epoch": 9, "cfg": (None, None), "fid": 1.5}
    src = str(tmp_path / "ours.ckpt")
    save_checkpoint(src, ours)

    pth = str(tmp_path / "exported.pth")
    convert_reverse("pix2pix", src, pth, num_downs=5)
    obj = torch.load(pth, map_location="cpu")
    assert obj["epoch"] == 9 and obj["fid"] == 1.5
    assert all(isinstance(t, torch.Tensor) for t in obj["G"].values())

    back = str(tmp_path / "back.ckpt")
    convert("pix2pix", pth, back, num_downs=5)
    ckpt = load_checkpoint(back)
    y0 = g.apply({"params": v["params"], "batch_stats": stats},
                 jnp.asarray(x), train=False)
    y1 = g.apply({"params": ckpt["G"]["params"],
                  "batch_stats": ckpt["G"]["batch_stats"]},
                 jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0)
