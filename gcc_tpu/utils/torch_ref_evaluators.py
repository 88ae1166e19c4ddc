"""From-spec torch rebuilds of the three pretrained evaluators.

These are the parity oracles for the evaluator ports: TF-FID InceptionV3
(reference metric/inception.py:18-186), DRN-D-105 DRNSeg (metric/drn.py:
104-255 + metric/mIoU_score.py:122-151) and torchvision VGG19 features
(models/GANLoss.py:95-144) rebuilt in torch FROM THE SPEC — no reference
imports, no torchvision. Used by tests/test_evaluator_parity.py and by
``cli.convert --evaluator`` as the ingestion self-check: a user-supplied
.pth must strict-load into these topologies and its forward must match the
JAX port to <=1e-4.

torch-only module: import it lazily (torch is a baked-in CPU dependency).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def randomize(model: nn.Module, seed: int = 0, std: float = 0.05) -> None:
    """Fill every param/buffer with reproducible non-trivial values.

    BN running_var gets positive values near 1 and BN weight near 1 so the
    299-layer-deep forward stays numerically tame; everything else is
    small-scale normal noise. Used to build synthetic .pth fixtures.
    """
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_var"):
            new = 1.0 + 0.2 * rng.rand(*v.shape)
        elif k.endswith("running_mean"):
            new = 0.1 * rng.randn(*v.shape)
        elif v.ndim == 1 and k.endswith("weight"):  # BN scale (convs are 4D)
            new = 1.0 + 0.1 * rng.randn(*v.shape)
        elif v.ndim == 1:
            new = 0.05 * rng.randn(*v.shape)
        else:
            new = std * rng.randn(*v.shape)
        v.copy_(torch.tensor(new.astype(np.float32)))
    model.eval()


def rel_err(ours, theirs) -> float:
    ours, theirs = np.asarray(ours), np.asarray(theirs)
    return float(np.abs(ours - theirs).max()
                 / max(np.abs(theirs).max(), 1e-8))


# ---------------------------------------------------------------------------
# TF-FID InceptionV3 (metric/inception.py:18-186)
# ---------------------------------------------------------------------------

class TConv(nn.Module):
    """BasicConv2d: bias-free conv + BN(eps=1e-3) + ReLU."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avgp(x):  # in-block pool with the TF-FID count_include_pad=False patch
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TIncA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = TConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = TConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TConv(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x), b5, bd,
                          self.branch_pool(_avgp(x))], 1)


class TIncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd,
                          F.max_pool2d(x, 3, stride=2)], 1)


class TIncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = TConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = TConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TConv(c7, c7, kernel_size=(7, 1),
                                    padding=(3, 0))
        self.branch7x7dbl_3 = TConv(c7, c7, kernel_size=(1, 7),
                                    padding=(0, 3))
        self.branch7x7dbl_4 = TConv(c7, c7, kernel_size=(7, 1),
                                    padding=(3, 0))
        self.branch7x7dbl_5 = TConv(c7, 192, kernel_size=(1, 7),
                                    padding=(0, 3))
        self.branch_pool = TConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avgp(x))], 1)


class TIncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = TConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TConv(192, 192, kernel_size=(1, 7),
                                   padding=(0, 3))
        self.branch7x7x3_3 = TConv(192, 192, kernel_size=(7, 1),
                                   padding=(3, 0))
        self.branch7x7x3_4 = TConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TIncE(nn.Module):
    def __init__(self, cin, use_max_pool=False):
        super().__init__()
        self.use_max_pool = use_max_pool
        self.branch1x1 = TConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = TConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = TConv(384, 384, kernel_size=(1, 3),
                                  padding=(0, 1))
        self.branch3x3_2b = TConv(384, 384, kernel_size=(3, 1),
                                  padding=(1, 0))
        self.branch3x3dbl_1 = TConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TConv(384, 384, kernel_size=(1, 3),
                                     padding=(0, 1))
        self.branch3x3dbl_3b = TConv(384, 384, kernel_size=(3, 1),
                                     padding=(1, 0))
        self.branch_pool = TConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        if self.use_max_pool:  # FIDInceptionE_2 (Mixed_7c)
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avgp(x)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TFIDInception(nn.Module):
    """pool3 feature extractor: input (0,1) NCHW -> 2048-d."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TConv(80, 192, kernel_size=3)
        self.Mixed_5b = TIncA(192, 32)
        self.Mixed_5c = TIncA(256, 64)
        self.Mixed_5d = TIncA(288, 64)
        self.Mixed_6a = TIncB(288)
        self.Mixed_6b = TIncC(768, 128)
        self.Mixed_6c = TIncC(768, 160)
        self.Mixed_6d = TIncC(768, 160)
        self.Mixed_6e = TIncC(768, 192)
        self.Mixed_7a = TIncD(768)
        self.Mixed_7b = TIncE(1280)
        self.Mixed_7c = TIncE(2048, use_max_pool=True)

    def forward(self, x):
        x = F.interpolate(x, size=(299, 299), mode="bilinear",
                          align_corners=False)
        x = 2 * x - 1
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                    "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                    "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, blk)(x)
        return x.mean(dim=(2, 3))


# ---------------------------------------------------------------------------
# DRN-D-105 DRNSeg (metric/drn.py:104-255, mIoU_score.py:122-151)
# ---------------------------------------------------------------------------

class TBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(out + res)


def _conv_layers(cin, cout, convs, stride=1, dilation=1):
    mods, c = [], cin
    for i in range(convs):
        mods += [nn.Conv2d(c, cout, 3, stride=stride if i == 0 else 1,
                           padding=dilation, dilation=dilation, bias=False),
                 nn.BatchNorm2d(cout), nn.ReLU(inplace=True)]
        c = cout
    return nn.Sequential(*mods)


def _bottleneck_layer(cin, planes, blocks, stride=1, dilation=1):
    mods = [TBottleneck(cin, planes, stride, dilation,
                        downsample=(stride != 1 or cin != planes * 4))]
    for _ in range(1, blocks):
        mods.append(TBottleneck(planes * 4, planes, 1, dilation))
    return nn.Sequential(*mods)


class TDRNSeg(nn.Module):
    """DRN-D-105 base + seg head + fixed bilinear up (from spec:
    drn.py:104-255 layers [1,1,3,4,23,3,1,1], mIoU_score.py:122-151)."""

    def __init__(self, classes=19, layers=(1, 1, 3, 4, 23, 3, 1, 1)):
        super().__init__()
        from gcc_tpu.metrics.miou import bilinear_up_weights
        ch = (16, 32, 64, 128, 256, 512, 512, 512)
        self.base = nn.Sequential(
            nn.Sequential(nn.Conv2d(3, ch[0], 7, padding=3, bias=False),
                          nn.BatchNorm2d(ch[0]), nn.ReLU(inplace=True)),
            _conv_layers(ch[0], ch[0], layers[0]),
            _conv_layers(ch[0], ch[1], layers[1], stride=2),
            _bottleneck_layer(ch[1], ch[2], layers[2], stride=2),
            _bottleneck_layer(ch[2] * 4, ch[3], layers[3], stride=2),
            _bottleneck_layer(ch[3] * 4, ch[4], layers[4], dilation=2),
            _bottleneck_layer(ch[4] * 4, ch[5], layers[5], dilation=4),
            _conv_layers(ch[5] * 4, ch[6], layers[6], dilation=2),
            _conv_layers(ch[6], ch[7], layers[7], dilation=1),
        )
        self.seg = nn.Conv2d(ch[7], classes, 1, bias=True)
        self.up = nn.ConvTranspose2d(classes, classes, 16, stride=8,
                                     padding=4, groups=classes, bias=False)
        with torch.no_grad():
            k = torch.tensor(bilinear_up_weights(16))
            self.up.weight.copy_(k[None, None].repeat(classes, 1, 1, 1))

    def forward(self, x):
        return self.up(self.seg(self.base(x)))  # pre-softmax logits

    def restore_fixed_up(self):
        """Re-install the fixed bilinear kernel (after randomize, which
        blindly fills every float tensor — the reference's up kernel is
        non-trainable and not part of the ported state)."""
        from gcc_tpu.metrics.miou import bilinear_up_weights
        with torch.no_grad():
            k = torch.tensor(bilinear_up_weights(16))
            self.up.weight.copy_(
                k[None, None].repeat(self.up.weight.shape[0], 1, 1, 1))


# ---------------------------------------------------------------------------
# torchvision VGG19 features[:36] (models/GANLoss.py:95-144, config E)
# ---------------------------------------------------------------------------

class TVGG19Features(nn.Module):
    """vgg19.features through index 35 = ReLU(conv5_4); imagenet-norm NCHW
    input. State-dict keys match torchvision ('features.<i>.weight'), so a
    real torchvision vgg19 state_dict strict-loads after dropping the
    classifier.* keys."""

    # config E: conv channel per torchvision feature index
    _CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512]

    def __init__(self):
        super().__init__()
        mods, cin = [], 3
        for v in self._CFG:
            if v == "M":
                mods.append(nn.MaxPool2d(2, 2))
            else:
                mods += [nn.Conv2d(cin, v, 3, padding=1),
                         nn.ReLU(inplace=True)]
                cin = v
        self.features = nn.Sequential(*mods)

    def forward(self, x):
        return self.features(x)
