"""Numerical parity vs torch: layers and full generators with ported weights.

These tests build the reference topologies in torch (from the behavioral
spec, not copied code), port the torch weights through
gcc_tpu.utils.torch_port, and require matching outputs. This pins down conv/
deconv semantics, BN statistics, activation conventions, concat order, and
the weight-layout transposes in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcc_tpu.ops.layers import (BatchNorm, Conv, ConvTranspose, InstanceNorm,  # noqa: E402
                                PReLU, pixel_shuffle)
from gcc_tpu.losses import gan_loss  # noqa: E402
from gcc_tpu.utils import torch_port as tp  # noqa: E402

K = jax.random.PRNGKey(0)
R = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def assert_close(ours, theirs, tol=2e-4):
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=tol, rtol=tol)


class _TorchSTEMask(torch.autograd.Function):
    """Reference Mask autograd fn (DifferentiableOp.py:22-31): hard
    sign-mask forward, straight-through (identity) gradient to alpha."""

    @staticmethod
    def forward(ctx, alpha, threshold):
        return (torch.sign(alpha - threshold) + 1.0) / 2.0

    @staticmethod
    def backward(ctx, grad_output):
        return grad_output.clone(), None


class TorchMaskOp(nn.Module):
    """Reference DifferentiableOP from spec (models/DifferentiableOp.py:34-59):
    mask = (sign(alpha - threshold) + 1)/2, multiplied over NCHW channels,
    with the reference's straight-through alpha gradient."""

    def __init__(self, ch, threshold=0.5):
        super().__init__()
        self.alpha = nn.Parameter(torch.full((ch,), 0.75))
        self.threshold = threshold

    def forward(self, x):
        m = _TorchSTEMask.apply(self.alpha, self.threshold)
        return x * m.view(1, -1, 1, 1)

    def clip_alpha(self):
        self.alpha.data.clip_(0, 1)


def _l2n(v, eps=1e-12):
    return v / (v.norm() + eps)


class TorchSpecNorm(nn.Module):
    """Reference custom SpectralNorm wrapper from spec (SAGAN.py:17-71):
    power-iteration on weight_bar with persisted u/v vectors."""

    def __init__(self, module):
        super().__init__()
        self.module = module
        w = self.module.weight
        height = w.data.shape[0]
        width = w.view(height, -1).data.shape[1]
        u = _l2n(w.data.new(height).normal_(0, 1))
        v = _l2n(w.data.new(width).normal_(0, 1))
        self.module.register_parameter("weight_bar", nn.Parameter(w.data))
        # u/v are NON-trainable Parameters in the reference
        # (SAGAN.py:53-54, requires_grad=False): they ride in optimizer
        # param groups but never receive gradients
        self.module.register_parameter(
            "weight_u", nn.Parameter(u.data, requires_grad=False))
        self.module.register_parameter(
            "weight_v", nn.Parameter(v.data, requires_grad=False))
        del self.module._parameters["weight"]

    def forward(self, *args):
        u, v = self.module.weight_u, self.module.weight_v
        w = self.module.weight_bar
        height = w.data.shape[0]
        for _ in range(1):
            v.data = _l2n(torch.mv(torch.t(w.view(height, -1).data), u.data))
            u.data = _l2n(torch.mv(w.view(height, -1).data, v.data))
        sigma = u.dot(w.view(height, -1).mv(v))
        self.module.weight = w / sigma.expand_as(w)
        return self.module.forward(*args)


class TorchSelfAttn(nn.Module):
    """Reference Self_Attn from spec (SAGAN.py:73-107)."""

    def __init__(self, c):
        super().__init__()
        self.query_conv = nn.Conv2d(c, c // 8, 1)
        self.key_conv = nn.Conv2d(c, c // 8, 1)
        self.value_conv = nn.Conv2d(c, c, 1)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, w, h = x.size()
        q = self.query_conv(x).view(b, -1, w * h).permute(0, 2, 1)
        k = self.key_conv(x).view(b, -1, w * h)
        attn = torch.softmax(torch.bmm(q, k), dim=-1)
        v = self.value_conv(x).view(b, -1, w * h)
        out = torch.bmm(v, attn.permute(0, 2, 1)).view(b, c, w, h)
        return self.gamma * out + x


class TestLayerParity:
    def test_conv(self):
        x = R.rand(2, 10, 10, 5).astype(np.float32)
        tconv = nn.Conv2d(5, 7, 4, stride=2, padding=1)
        ours = Conv(7, (4, 4), (2, 2), 1)
        params = {"kernel": tp._conv({"w": tconv.weight.detach().numpy()}, "w"),
                  "bias": tconv.bias.detach().numpy()}
        y = ours.apply({"params": params}, jnp.asarray(x))
        assert_close(y, to_nhwc(tconv(nchw(x))))

    def test_conv_transpose_4s2(self):
        x = R.rand(2, 8, 8, 5).astype(np.float32)
        tconv = nn.ConvTranspose2d(5, 7, 4, stride=2, padding=1)
        ours = ConvTranspose(7, (4, 4), (2, 2), 1)
        params = {"kernel": tp._deconv(
            {"w": tconv.weight.detach().numpy()}, "w"),
            "bias": tconv.bias.detach().numpy()}
        y = ours.apply({"params": params}, jnp.asarray(x))
        out = to_nhwc(tconv(nchw(x)))
        assert y.shape == out.shape == (2, 16, 16, 7)
        assert_close(y, out)

    def test_conv_transpose_3s2_output_padding(self):
        x = R.rand(1, 6, 6, 4).astype(np.float32)
        tconv = nn.ConvTranspose2d(4, 3, 3, stride=2, padding=1,
                                   output_padding=1)
        ours = ConvTranspose(3, (3, 3), (2, 2), padding=1, output_padding=1)
        params = {"kernel": tp._deconv(
            {"w": tconv.weight.detach().numpy()}, "w"),
            "bias": tconv.bias.detach().numpy()}
        y = ours.apply({"params": params}, jnp.asarray(x))
        out = to_nhwc(tconv(nchw(x)))
        assert y.shape == out.shape == (1, 12, 12, 3)
        assert_close(y, out)

    def test_batchnorm_train_and_eval(self):
        x = R.rand(4, 6, 6, 3).astype(np.float32) * 2 - 1
        tbn = nn.BatchNorm2d(3)
        with torch.no_grad():
            tbn.weight.copy_(torch.tensor([1.5, 0.5, 2.0]))
            tbn.bias.copy_(torch.tensor([0.1, -0.2, 0.0]))
        ours = BatchNorm(use_running_average=False)
        variables = {
            "params": {"scale": np.array([1.5, 0.5, 2.0], np.float32),
                       "bias": np.array([0.1, -0.2, 0.0], np.float32)},
            "batch_stats": {"mean": np.zeros(3, np.float32),
                            "var": np.ones(3, np.float32)}}
        tbn.train()
        ty = to_nhwc(tbn(nchw(x)))
        y, mut = ours.apply(variables, jnp.asarray(x),
                            mutable=["batch_stats"])
        assert_close(y, ty, tol=1e-4)
        # running stats after one train step (torch unbiased var)
        assert_close(mut["batch_stats"]["mean"],
                     tbn.running_mean.detach().numpy(), tol=1e-5)
        assert_close(mut["batch_stats"]["var"],
                     tbn.running_var.detach().numpy(), tol=1e-4)
        # eval mode uses the running stats
        tbn.eval()
        ty_eval = to_nhwc(tbn(nchw(x)))
        ours_eval = BatchNorm(use_running_average=True)
        y_eval = ours_eval.apply(
            {"params": variables["params"],
             "batch_stats": mut["batch_stats"]}, jnp.asarray(x))
        assert_close(y_eval, ty_eval, tol=1e-4)

    def test_instance_norm(self):
        x = R.rand(2, 5, 5, 4).astype(np.float32)
        tnorm = nn.InstanceNorm2d(4)
        y = InstanceNorm().apply({}, jnp.asarray(x))
        assert_close(y, to_nhwc(tnorm(nchw(x))), tol=1e-5)

    def test_prelu_and_pixel_shuffle(self):
        x = R.rand(1, 4, 4, 8).astype(np.float32) * 2 - 1
        tp_ = nn.PReLU()
        y = PReLU().apply({"params": {"alpha": np.float32(0.25)}},
                          jnp.asarray(x))
        assert_close(y, to_nhwc(tp_(nchw(x))), tol=1e-6)
        ps = pixel_shuffle(jnp.asarray(x), 2)
        tps = to_nhwc(nn.PixelShuffle(2)(nchw(x)))
        assert_close(ps, tps, tol=0)

    def test_gan_loss_modes(self):
        pred = torch.tensor(R.randn(2, 1, 4, 4).astype(np.float32))
        pj = jnp.asarray(pred.numpy())
        bce = nn.BCEWithLogitsLoss()
        assert_close(gan_loss(pj, True, "vanilla"),
                     bce(pred, torch.ones_like(pred)).numpy(), 1e-6)
        assert_close(gan_loss(pj, False, "vanilla"),
                     bce(pred, torch.zeros_like(pred)).numpy(), 1e-6)
        mse = nn.MSELoss()
        assert_close(gan_loss(pj, True, "lsgan"),
                     mse(pred, torch.ones_like(pred)).numpy(), 1e-6)
        relu = nn.ReLU()
        hinge_d_real = relu(1.0 - pred).mean()  # == -mean(min(pred-1, 0))
        assert_close(gan_loss(pj, True, "hinge"), hinge_d_real.numpy(), 1e-6)


# ---------------------------------------------------------------------------
# Full-generator parity with ported weights
# ---------------------------------------------------------------------------

def build_torch_unet(ngf, num_downs):
    """Reference UnetGenertor topology (Pix2Pix.py:20-130), built from spec."""
    class Block(nn.Module):
        def __init__(self, cin, cout, up_in, up_out, sub, outer=False,
                     inner=False):
            super().__init__()
            self.outer = outer
            layers = []
            down = [nn.Conv2d(cin, cout, 4, 2, 1, bias=False)]
            if not outer:
                down = [nn.LeakyReLU(0.2)] + down
                if not inner:
                    down += [nn.BatchNorm2d(cout)]
            up = [nn.ReLU()]
            if outer:
                up += [nn.ConvTranspose2d(up_in, up_out, 4, 2, 1), nn.Tanh()]
            else:
                up += [nn.ConvTranspose2d(up_in, up_out, 4, 2, 1, bias=False),
                       nn.BatchNorm2d(up_out)]
            mods = down + ([sub] if sub is not None else []) + up
            self.model = nn.Sequential(*mods)

        def forward(self, x):
            if self.outer:
                return self.model(x)
            return torch.cat([x, self.model(x)], 1)

    n = num_downs
    f = [ngf * min(2 ** k, 8) for k in range(n)] + \
        [ngf * min(2 ** (k - 1), 8) for k in range(n - 1, 0, -1)]
    blk = Block(f[n - 2], f[n - 1], f[n - 1], f[n], None, inner=True)
    for d in range(n - 2, 0, -1):
        blk = Block(f[d - 1], f[d], f[d] + f[2 * n - 1 - (d + 1)],
                    f[2 * n - 1 - d], blk)
    outer = Block(3, f[0], f[0] + f[2 * n - 2], 3, blk, outer=True)

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = outer

        def forward(self, x):
            return self.model(x)

    return G()


def test_unet_generator_parity():
    from gcc_tpu.models.generators import UnetGenerator
    tg = build_torch_unet(ngf=4, num_downs=5)
    tg.eval()
    x = (R.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        ty = to_nhwc(tg(nchw(x)))
    params, stats = tp.port_unet_generator(tg.state_dict(), num_downs=5)
    ours = UnetGenerator(ngf=4, num_downs=5, use_dropout=False)
    y = ours.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x), train=False)
    assert_close(y, ty, tol=3e-4)


def build_torch_patchgan(ndf, in_ch=6):
    return nn.Sequential(
        nn.Conv2d(in_ch, ndf, 4, 2, 1), nn.LeakyReLU(0.2),
        nn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False), nn.BatchNorm2d(ndf * 2),
        nn.LeakyReLU(0.2),
        nn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 4), nn.LeakyReLU(0.2),
        nn.Conv2d(ndf * 4, ndf * 8, 4, 1, 1, bias=False),
        nn.BatchNorm2d(ndf * 8), nn.LeakyReLU(0.2),
        nn.Conv2d(ndf * 8, 1, 4, 1, 1))


def build_torch_masked_patchgan(ndf, in_ch=6):
    """MaskNLayerDiscriminator layout from spec (Pix2Pix.py:307-348):
    Sequential indices 0 conv,1 lrelu,2 op | 3 conv,4 bn,5 op,6 lrelu |
    7,8,9,10 | 11 conv,12 bn,13 op,14 lrelu | 15 conv."""
    return nn.Sequential(
        nn.Conv2d(in_ch, ndf, 4, 2, 1), nn.LeakyReLU(0.2), TorchMaskOp(ndf),
        nn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False), nn.BatchNorm2d(ndf * 2),
        TorchMaskOp(ndf * 2), nn.LeakyReLU(0.2),
        nn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 4), TorchMaskOp(ndf * 4), nn.LeakyReLU(0.2),
        nn.Conv2d(ndf * 4, ndf * 8, 4, 1, 1, bias=False),
        nn.BatchNorm2d(ndf * 8), TorchMaskOp(ndf * 8), nn.LeakyReLU(0.2),
        nn.Conv2d(ndf * 8, 1, 4, 1, 1))


def build_torch_sagan_d(ndf, masked=False):
    """Reference SAGAN Discriminator / MaskDiscriminator from spec
    (SAGAN.py:173-277): 4 spectral-norm conv stages (optional
    DifferentiableOP before the LeakyReLU(0.1)), attn after l3 and l4,
    4x4 valid conv head, squeeze."""

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            dims = [ndf, ndf * 2, ndf * 4, ndf * 8]
            cin = 3
            for i, dim in enumerate(dims):
                layers = [TorchSpecNorm(nn.Conv2d(cin, dim, 4, 2, 1))]
                if masked:
                    layers.append(TorchMaskOp(dim))
                layers.append(nn.LeakyReLU(0.1))
                setattr(self, f"l{i + 1}", nn.Sequential(*layers))
                cin = dim
            self.last = nn.Sequential(nn.Conv2d(cin, 1, 4))
            self.attn1 = TorchSelfAttn(ndf * 4)
            self.attn2 = TorchSelfAttn(ndf * 8)

        def forward(self, x):
            out = self.l1(x)
            out = self.l2(out)
            out = self.l3(out)
            out = self.attn1(out)
            out = self.l4(out)
            out = self.attn2(out)
            return self.last(out).squeeze()

    return D()


def build_torch_srgan_d(n_channels=64, n_blocks=4, kernel_size=3,
                        masked=False):
    """Reference SRGAN Discriminator / MaskDiscriminator from spec
    (SRGAN.py:15-69, 199-295): conv_blocks.{i}.conv_block =
    [Conv2d] + ([BN] if i != 0) + ([DifferentiableOP] if masked) +
    LeakyReLU(0.2); adaptive avg pool to 1x1; fc1 linear head."""

    class ConvBlock(nn.Module):
        def __init__(self, layers):
            super().__init__()
            self.conv_block = nn.Sequential(*layers)

        def forward(self, x):
            return self.conv_block(x)

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            cin = 3
            for i in range(n_blocks):
                cout = (n_channels if i == 0 else cin * 2) if i % 2 == 0 \
                    else cin
                layers = [nn.Conv2d(cin, cout, kernel_size,
                                    1 if i % 2 == 0 else 2, kernel_size // 2)]
                if i != 0:
                    layers.append(nn.BatchNorm2d(cout))
                if masked:
                    layers.append(TorchMaskOp(cout))
                layers.append(nn.LeakyReLU(0.2))
                blocks.append(ConvBlock(layers))
                cin = cout
            self.conv_blocks = nn.Sequential(*blocks)
            self.adaptive_pool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc1 = nn.Linear(cin, 1)

        def forward(self, x):
            h = self.conv_blocks(x)
            h = self.adaptive_pool(h)
            return self.fc1(h.view(h.size(0), -1))

    return D()


def test_patchgan_parity():
    from gcc_tpu.models.discriminators import PatchGAN
    net = build_torch_patchgan(8)
    net.eval()
    # randomize BN stats so eval isn't trivially identity-normalized
    for m in net:
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(1 + torch.rand_like(m.running_var))
    x = R.rand(1, 32, 32, 6).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    sd = {f"model.{k}": v for k, v in net.state_dict().items()}
    params, stats, arch = tp.port_patchgan(sd, masked=False)
    assert arch is None
    ours = PatchGAN(ndf=8, norm="batch", masked=False)
    y = ours.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x), train=False)
    assert_close(y, ty, tol=3e-4)


def build_torch_mobile_resnet(ngf, n_blocks=2):
    class Sep(nn.Module):  # reference SeparableConv2d keeps it under .conv
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(cin, cin, 3, 1, 0, groups=cin),
                nn.InstanceNorm2d(cin),
                nn.Conv2d(cin, cout, 1, 1))

        def forward(self, x):
            return self.conv(x)

    sep = Sep

    class Blk(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv_block = nn.Sequential(
                nn.ReflectionPad2d(1), sep(c, c), nn.InstanceNorm2d(c),
                nn.ReLU(), nn.Dropout(0.0), nn.ReflectionPad2d(1),
                sep(c, c), nn.InstanceNorm2d(c))

        def forward(self, x):
            return x + self.conv_block(x)

    layers = [nn.ReflectionPad2d(3), nn.Conv2d(3, ngf, 7, 1, 0),
              nn.InstanceNorm2d(ngf), nn.ReLU(),
              nn.Conv2d(ngf, ngf * 2, 3, 2, 1), nn.InstanceNorm2d(ngf * 2),
              nn.ReLU(),
              nn.Conv2d(ngf * 2, ngf * 4, 3, 2, 1),
              nn.InstanceNorm2d(ngf * 4), nn.ReLU()]
    layers += [Blk(ngf * 4) for _ in range(n_blocks)]
    layers += [nn.ConvTranspose2d(ngf * 4, ngf * 2, 3, 2, 1, output_padding=1),
               nn.InstanceNorm2d(ngf * 2), nn.ReLU(),
               nn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1, output_padding=1),
               nn.InstanceNorm2d(ngf), nn.ReLU(), nn.ReflectionPad2d(3),
               nn.Conv2d(ngf, 3, 7, 1, 0), nn.Tanh()]

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    return G()


def test_mobile_resnet_parity():
    from gcc_tpu.models.generators import MobileResnetGenerator
    net = build_torch_mobile_resnet(4, n_blocks=2)
    net.eval()
    x = R.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    params = tp.port_mobile_resnet(net.state_dict(), n_blocks=2)
    ours = MobileResnetGenerator(ngf=4, n_blocks=2)
    y = ours.apply({"params": params}, jnp.asarray(x), train=False)
    assert_close(y, ty, tol=3e-4)


def build_torch_sagan_g(ngf, z_dim):
    """Reference SAGAN Generator topology (SAGAN.py:17-171) from spec,
    including the custom SpectralNorm wrapper (power-iteration on
    weight_bar, SAGAN.py:26-56)."""
    SpecNorm, Attn = TorchSpecNorm, TorchSelfAttn

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            m = 8
            self.l1 = nn.Sequential(
                SpecNorm(nn.ConvTranspose2d(z_dim, ngf * m, 4)),
                nn.BatchNorm2d(ngf * m), nn.ReLU())
            self.l2 = nn.Sequential(
                SpecNorm(nn.ConvTranspose2d(ngf * m, ngf * m // 2, 4, 2, 1)),
                nn.BatchNorm2d(ngf * m // 2), nn.ReLU())
            self.l3 = nn.Sequential(
                SpecNorm(nn.ConvTranspose2d(ngf * m // 2, ngf * m // 4,
                                            4, 2, 1)),
                nn.BatchNorm2d(ngf * m // 4), nn.ReLU())
            self.l4 = nn.Sequential(
                SpecNorm(nn.ConvTranspose2d(ngf * m // 4, ngf, 4, 2, 1)),
                nn.BatchNorm2d(ngf), nn.ReLU())
            self.attn1 = Attn(ngf * 2)
            self.attn2 = Attn(ngf)
            self.last = nn.Sequential(nn.ConvTranspose2d(ngf, 3, 4, 2, 1),
                                      nn.Tanh())

        def forward(self, z):
            x = z.view(z.size(0), z.size(1), 1, 1)
            x = self.l1(x)
            x = self.l2(x)
            x = self.l3(x)
            x = self.attn1(x)
            x = self.l4(x)
            x = self.attn2(x)
            return self.last(x)

    return G()


def test_sagan_generator_parity():
    from gcc_tpu.models.generators import SAGANGenerator
    torch.manual_seed(0)
    tg = build_torch_sagan_g(ngf=8, z_dim=8)
    tg.eval()
    # randomize BN running stats
    for m in tg.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(1 + torch.rand_like(m.running_var))
    z = R.randn(2, 8).astype(np.float32)
    # port BEFORE the torch forward: SpectralNorm updates u/v in place, and
    # both sides must run their single power iteration from the same state
    params, stats, spectral = tp.port_sagan_generator(tg.state_dict())
    with torch.no_grad():
        ty = to_nhwc(tg(torch.tensor(z)))
    ours = SAGANGenerator(ngf=8, z_dim=8)
    y = ours.apply({"params": params, "batch_stats": stats,
                    "spectral": spectral}, jnp.asarray(z), train=False)
    assert_close(y, ty, tol=5e-4)


def build_torch_srresnet(nc, n_blocks=2, filter_cfgs=None):
    """Reference SRResNet topology (SRGAN.py:15-197) from spec.

    filter_cfgs: optional per-block INNER widths (SRGAN.py:164-166's
    pruned-student path); None keeps the dense inner width nc."""
    def cblock(cin, cout, k, bn, act):
        layers = [nn.Conv2d(cin, cout, k, 1, k // 2)]
        if bn:
            layers += [nn.BatchNorm2d(cout)]
        if act == "prelu":
            layers += [nn.PReLU()]
        elif act == "tanh":
            layers += [nn.Tanh()]
        class CB(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_block = nn.Sequential(*layers)
            def forward(self, x):
                return self.conv_block(x)
        return CB()

    class Res(nn.Module):
        def __init__(self, inner=None):
            super().__init__()
            inner = nc if inner is None else inner
            self.conv_block1 = cblock(nc, inner, 3, True, "prelu")
            self.conv_block2 = cblock(inner, nc, 3, True, None)
        def forward(self, x):
            return x + self.conv_block2(self.conv_block1(x))

    class Sub(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(nc, nc * 4, 3, 1, 1)
            self.pixel_shuffle = nn.PixelShuffle(2)
            self.prelu = nn.PReLU()
        def forward(self, x):
            return self.prelu(self.pixel_shuffle(self.conv(x)))

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_block1 = cblock(3, nc, 9, False, "prelu")
            self.residual_blocks = nn.Sequential(
                *[Res(filter_cfgs[b] if filter_cfgs else None)
                  for b in range(n_blocks)])
            self.conv_block2 = cblock(nc, nc, 3, True, None)
            self.subpixel_convolutional_blocks = nn.Sequential(
                Sub(), Sub())
            self.conv_block3 = cblock(nc, 3, 9, False, "tanh")
        def forward(self, x):
            h = self.conv_block1(x)
            r = h
            h = self.residual_blocks(h)
            h = self.conv_block2(h) + r
            h = self.subpixel_convolutional_blocks(h)
            return self.conv_block3(h)

    return G()


def test_srresnet_parity():
    from gcc_tpu.models.generators import SRResNet
    torch.manual_seed(1)
    net = build_torch_srresnet(8, n_blocks=2)
    net.eval()
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(1 + torch.rand_like(m.running_var))
    x = R.rand(1, 12, 12, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ty = to_nhwc(net(nchw(x)))
    params, stats = tp.port_srresnet(net.state_dict(), n_blocks=2)
    ours = SRResNet(n_channels=8, n_blocks=2)
    y = ours.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x), train=False)
    assert y.shape == ty.shape == (1, 48, 48, 3)
    assert_close(y, ty, tol=3e-4)


def test_srgan_discriminator_parity():
    """Forward port of the reference VGG-style SRGAN discriminator
    (SRGAN.py:199-295), masked variant: torch weights + alphas -> jax."""
    from gcc_tpu.models.discriminators import SRGANDiscriminator
    torch.manual_seed(2)
    net = build_torch_srgan_d(8, masked=True)
    net.eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(1 + torch.rand_like(m.running_var))
            if isinstance(m, TorchMaskOp):
                m.alpha.copy_(torch.rand_like(m.alpha))  # straddle threshold
    x = R.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ty = net(nchw(x)).numpy()
    params, stats, arch = tp.port_srgan_discriminator(net.state_dict(),
                                                      masked=True)
    assert arch is not None and sorted(arch) == [f"mask_{i}" for i in range(4)]
    ours = SRGANDiscriminator(ndf=8, masked=True)
    y = ours.apply({"params": params, "batch_stats": stats, "arch": arch},
                   jnp.asarray(x), train=False)
    assert np.asarray(y).shape == ty.shape == (2, 1)
    assert_close(y, ty, tol=3e-4)


def test_convert_cli_roundtrip(tmp_path):
    """torch reference-style .pth -> gcc-tpu ckpt -> engine eval parity."""
    from gcc_tpu.cli.convert import convert
    from gcc_tpu.cli.test import rebuild_engine
    from gcc_tpu.config import Config
    from gcc_tpu.utils.checkpoint import load_checkpoint

    tg = build_torch_unet(ngf=4, num_downs=5)
    tg.eval()
    td = build_torch_patchgan(4)
    pth = str(tmp_path / "model_best.pth")
    torch.save({"G": tg.state_dict(),
                "D": {f"model.{k}": v for k, v in td.state_dict().items()},
                "epoch": 7, "cfg": (None, None), "fid": 42.0}, pth)

    out = str(tmp_path / "converted.ckpt")
    convert("pix2pix", pth, out, num_downs=5)
    ckpt = load_checkpoint(out)
    assert ckpt["epoch"] == 7 and ckpt["fid"] == 42.0

    cfg = Config(model="pix2pix", ngf=4, ndf=4, num_downs=5, crop_size=32,
                 no_dropout=True)
    eng = rebuild_engine(cfg, ckpt)
    state = eng.init_state(jax.random.PRNGKey(0))
    state = eng.load_net_params(state, ckpt, load_discriminator=False)
    x = R.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    y = eng.generate(state, jnp.asarray(x))
    with torch.no_grad():
        ty = to_nhwc(tg(nchw(x)))
    assert_close(y, ty, tol=3e-4)


def test_lr_schedules_match_torch():
    """lr_for_epoch vs torch LambdaLR/StepLR/CosineAnnealingLR stepped once
    per epoch at epoch end (utils/util.py:288-303 + train.py:172)."""
    from gcc_tpu.config import Config
    from gcc_tpu.utils.schedule import lr_for_epoch

    def torch_lrs(policy, n_epochs, n_epochs_decay, lr_decay_iters,
                  total, base=2e-4):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
        if policy == "linear":
            sched = torch.optim.lr_scheduler.LambdaLR(
                opt, lambda e: 1.0 - max(0, e + 1 - n_epochs)
                / float(n_epochs_decay + 1))
        elif policy == "step":
            sched = torch.optim.lr_scheduler.StepLR(
                opt, step_size=lr_decay_iters, gamma=0.1)
        else:
            sched = torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=n_epochs, eta_min=0)
        lrs = []
        for _ in range(total):
            lrs.append(opt.param_groups[0]["lr"])  # lr used DURING epoch
            sched.step()
        return lrs

    for policy, kw in (("linear", dict(n_epochs=10, n_epochs_decay=5)),
                       ("step", dict(n_epochs=10, n_epochs_decay=0,
                                     lr_decay_iters=4)),
                       ("cosine", dict(n_epochs=10, n_epochs_decay=0))):
        cfg = Config(lr=2e-4, lr_policy=policy, epoch_count=1,
                     n_epochs=kw["n_epochs"],
                     n_epochs_decay=kw.get("n_epochs_decay", 0),
                     lr_decay_iters=kw.get("lr_decay_iters", 50))
        total = kw["n_epochs"] + kw.get("n_epochs_decay", 0)
        expected = torch_lrs(policy, kw["n_epochs"],
                             kw.get("n_epochs_decay", 0),
                             kw.get("lr_decay_iters", 50), total)
        ours = [lr_for_epoch(cfg, e) for e in range(1, total + 1)]
        np.testing.assert_allclose(ours, expected, rtol=1e-6,
                                   err_msg=policy)


def test_plateau_matches_torch_reduce_lr_on_plateau():
    """Plateau vs torch ReduceLROnPlateau with the reference's constructor
    args (utils/util.py:297: mode='min', factor=0.2, threshold=0.01,
    patience=5), driven by an adversarial metric sequence that exercises
    improvement, stagnation, near-threshold improvement, and decay."""
    from gcc_tpu.utils.schedule import Plateau

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=2e-4)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.2, threshold=0.01, patience=5)
    ours = Plateau(2e-4, factor=0.2, threshold=0.01, patience=5)

    rng = np.random.RandomState(0)
    metrics = [10.0, 9.0, 8.95, 8.94, 8.93, 8.92, 8.91, 8.90, 8.89, 8.88,
               8.0, 7.99]
    metrics += list(8.0 + rng.rand(30))  # noise around a plateau
    theirs_lrs, ours_lrs = [], []
    for mtr in metrics:
        sched.step(mtr)
        theirs_lrs.append(opt.param_groups[0]["lr"])
        ours_lrs.append(ours.step(mtr))
    np.testing.assert_allclose(ours_lrs, theirs_lrs, rtol=1e-9)
    assert theirs_lrs[-1] < 2e-4  # the sequence actually triggered decay


def test_ema_beta_schedule():
    from gcc_tpu.config import Config
    from gcc_tpu.utils.schedule import ema_beta_for_epoch
    cfg = Config(ema_beta=1.0, epoch_count=1, n_epochs=4, n_epochs_decay=6)
    # epoch 1 uses the initial beta; epoch e uses 1 - (e-1)/total
    # (adaptive_ema_beta at epoch end, Pix2Pix.py:602-614)
    assert ema_beta_for_epoch(cfg, 1) == 1.0
    assert ema_beta_for_epoch(cfg, 2) == 1.0 - 1 / 10
    assert ema_beta_for_epoch(cfg, 10) == 1.0 - 9 / 10
