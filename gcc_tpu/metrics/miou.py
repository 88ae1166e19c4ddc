"""Cityscapes mIoU evaluator: DRN-D-105 segmentation network + protocol
(metric/drn.py:104-255 and metric/mIoU_score.py:20-218).

Pipeline (bit-matched):
  fake [-1,1] -> uint8 -> PIL resize to 2048x1024 BILINEAR -> /255 ->
  normalize with the reference's cityscapes mean/std -> DRN-D-105 base ->
  1x1 seg head (19 classes) -> fixed bilinear 8x grouped-deconv upsample ->
  argmax -> confusion hist vs labels resolved through table.txt ->
  mean per-class IoU * 100, rounded to 2 decimals.

Weights load from --drn_path (a torch DRNSeg state_dict; 'module.' prefixes
stripped). Architecture: arch-'D' dilated resnet, layers [1,1,3,4,23,3,1,1],
channels (16,32,64,128,256,512,512,512); layers 0-2 and 7-8 are plain
conv-bn-relu stacks, layers 3-6 Bottleneck stacks with dilations
(1,1,2,4) and layers 7/8 dilated (2,1) non-residual convs.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

CITYSCAPES_MEAN = np.array([0.29010095242892997, 0.32808144844279574,
                            0.28696394422942517], np.float32)
CITYSCAPES_STD = np.array([0.1829540508368939, 0.18656561047509476,
                           0.18447508988480435], np.float32)


class ConvBNRelu(nn.Module):
    ch: int
    stride: int = 1
    dilation: int = 1
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pad = self.dilation if k == 3 else k // 2
        w = self.param("conv", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.ch))
        y = jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _bn(self, y, self.ch)
        return jax.nn.relu(y)


def _bn(mod, y, ch, name=""):
    scale = mod.param(f"bn{name}_scale", nn.initializers.ones, (ch,))
    bias = mod.param(f"bn{name}_bias", nn.initializers.zeros, (ch,))
    mean = mod.param(f"bn{name}_mean", nn.initializers.zeros, (ch,))
    var = mod.param(f"bn{name}_var", nn.initializers.ones, (ch,))
    return (y - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.planes
        w1 = self.param("conv1", nn.initializers.lecun_normal(),
                        (1, 1, x.shape[-1], p))
        out = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.nn.relu(_bn(self, out, p, "1"))
        d = self.dilation
        w2 = self.param("conv2", nn.initializers.lecun_normal(),
                        (3, 3, p, p))
        out = jax.lax.conv_general_dilated(
            out, w2, (self.stride, self.stride), ((d, d), (d, d)),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.nn.relu(_bn(self, out, p, "2"))
        w3 = self.param("conv3", nn.initializers.lecun_normal(),
                        (1, 1, p, p * 4))
        out = jax.lax.conv_general_dilated(
            out, w3, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = _bn(self, out, p * 4, "3")
        if self.has_downsample:
            wd = self.param("down_conv", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], p * 4))
            res = jax.lax.conv_general_dilated(
                x, wd, (self.stride, self.stride), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            res = _bn(self, res, p * 4, "_down")
        else:
            res = x
        return jax.nn.relu(out + res)


DRN_D_105_LAYERS = (1, 1, 3, 4, 23, 3, 1, 1)
DRN_CHANNELS = (16, 32, 64, 128, 256, 512, 512, 512)


class DRNSeg(nn.Module):
    """DRN-D-105 base + 19-class seg head + fixed bilinear 8x upsample."""

    classes: int = 19
    layers: Sequence[int] = DRN_D_105_LAYERS
    channels: Sequence[int] = DRN_CHANNELS

    @nn.compact
    def __call__(self, x):
        ch, ly = self.channels, self.layers
        # layer0: 7x7 conv stride 1 (arch D)
        h = ConvBNRelu(ch[0], 1, 1, kernel=7, name="layer0_0")(x)
        # layer1/2: plain conv stacks
        for i in range(ly[0]):
            h = ConvBNRelu(ch[0], 1, name=f"layer1_{i}")(h)
        for i in range(ly[1]):
            h = ConvBNRelu(ch[1], 2 if i == 0 else 1, name=f"layer2_{i}")(h)
        # layers 3-6: bottlenecks; dilations (1,1,2,4); new_level=False for 5/6
        inpl = ch[1]
        for li, (planes, blocks, stride, dil) in enumerate(
                ((ch[2], ly[2], 2, 1), (ch[3], ly[3], 2, 1),
                 (ch[4], ly[4], 1, 2), (ch[5], ly[5], 1, 4)), start=3):
            for b in range(blocks):
                has_down = b == 0 and (stride != 1 or inpl != planes * 4)
                h = Bottleneck(planes, stride if b == 0 else 1, dil,
                               has_downsample=has_down,
                               name=f"layer{li}_{b}")(h)
                inpl = planes * 4
        # layers 7/8: dilated plain convs, non-residual
        for i in range(ly[6]):
            h = ConvBNRelu(ch[6], 1, 2, name=f"layer7_{i}")(h)
        for i in range(ly[7]):
            h = ConvBNRelu(ch[7], 1, 1, name=f"layer8_{i}")(h)
        # seg head (1x1, bias)
        ws = self.param("seg_kernel", nn.initializers.lecun_normal(),
                        (1, 1, ch[7], self.classes))
        bs = self.param("seg_bias", nn.initializers.zeros, (self.classes,))
        logits = jax.lax.conv_general_dilated(
            h, ws, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bs
        return logits  # 1/8 resolution; upsample handled by the caller


def bilinear_up_weights(k: int = 16) -> np.ndarray:
    """fill_up_weights: bilinear kernel for the fixed grouped deconv."""
    f = (k + 1) // 2
    c = f - 1 if k % 2 == 1 else f - 0.5
    og = np.ogrid[:k, :k]
    return ((1 - abs(og[0] - c) / f) * (1 - abs(og[1] - c) / f)).astype(
        np.float32)


def upsample_logits_8x(logits: jax.Array) -> jax.Array:
    """Fixed grouped ConvTranspose2d(16, s8, p4) with bilinear weights
    (mIoU_score.py:144-151); per-class (grouped) kernel."""
    k = bilinear_up_weights(16)
    n, h, w, c = logits.shape
    kern = jnp.asarray(k)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    lo = 16 - 1 - 4
    return jax.lax.conv_general_dilated(
        logits, kern, (1, 1), ((lo, lo), (lo, lo)), lhs_dilation=(8, 8),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def fast_hist(pred: np.ndarray, label: np.ndarray, n: int) -> np.ndarray:
    k = (label >= 0) & (label < n)
    return np.bincount(n * label[k].astype(int) + pred[k],
                       minlength=n ** 2).reshape(n, n)


def per_class_iu(hist: np.ndarray) -> np.ndarray:
    return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))


def miou_from_hist(hist: np.ndarray) -> float:
    return float(round(np.nanmean(per_class_iu(hist) * 100), 2))


# ---------------------------------------------------------------------------
# Weight porting + full evaluation
# ---------------------------------------------------------------------------

def _drn_sd(path) -> dict:
    """Load a DRNSeg state_dict (--drn_path: .pth, an .npz of it, or an
    in-memory {key: ndarray} mapping), DataParallel 'module.' prefix
    stripped."""
    if isinstance(path, dict):
        sd = dict(path)
    elif path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu").items()}
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def infer_drn_layers(sd: dict) -> tuple:
    """Per-layer block depths from a DRNSeg state_dict's key structure.

    Real DRN-D-105 checkpoints infer to (1,1,3,4,23,3,1,1); thin
    random-weight test fixtures (tests/test_real_metric_e2e.py) infer to
    their own depths, so compute_miou runs the identical code path on both.
    Layers 1-2 and 7-8 are conv-bn-relu stacks (keys base.<l>.<3i>.weight),
    3-6 Bottleneck stacks (keys base.<l>.<b>.conv1.weight).
    """
    ly = []
    for li in range(1, 9):
        probe = (f"base.{li}.{{}}.conv1.weight" if 3 <= li <= 6
                 else f"base.{li}.{{}}.weight")
        step = 1 if 3 <= li <= 6 else 3
        n = 0
        while probe.format(step * n) in sd:
            n += 1
        ly.append(n)
    return tuple(ly)


def load_torch_drnseg(path,
                      layers: Sequence[int] = DRN_D_105_LAYERS) -> dict:
    """Port a torch DRNSeg state_dict (--drn_path: .pth, an .npz of it, or
    an in-memory {key: ndarray} mapping) to this module's params."""
    sd = _drn_sd(path)

    params: dict = {}

    def conv(t):  # OIHW -> HWIO
        return jnp.asarray(np.transpose(sd[t], (2, 3, 1, 0)))

    def put_convbn(name, conv_key, bn_key):
        params[name] = {
            "conv": conv(conv_key),
            "bn_scale": jnp.asarray(sd[bn_key + ".weight"]),
            "bn_bias": jnp.asarray(sd[bn_key + ".bias"]),
            "bn_mean": jnp.asarray(sd[bn_key + ".running_mean"]),
            "bn_var": jnp.asarray(sd[bn_key + ".running_var"]),
        }

    ly = tuple(layers)
    put_convbn("layer0_0", "base.0.0.weight", "base.0.1")
    for li, n in ((1, ly[0]), (2, ly[1])):
        for i in range(n):
            put_convbn(f"layer{li}_{i}", f"base.{li}.{3*i}.weight",
                       f"base.{li}.{3*i+1}")
    for li, n in ((3, ly[2]), (4, ly[3]), (5, ly[4]), (6, ly[5])):
        for b in range(n):
            pre = f"base.{li}.{b}"
            node = {}
            for j in (1, 2, 3):
                node[f"conv{j}"] = conv(f"{pre}.conv{j}.weight")
                for stat, suf in (("scale", "weight"), ("bias", "bias"),
                                  ("mean", "running_mean"),
                                  ("var", "running_var")):
                    node[f"bn{j}_{stat}"] = jnp.asarray(
                        sd[f"{pre}.bn{j}.{suf}"])
            if f"{pre}.downsample.0.weight" in sd:
                node["down_conv"] = conv(f"{pre}.downsample.0.weight")
                for stat, suf in (("scale", "weight"), ("bias", "bias"),
                                  ("mean", "running_mean"),
                                  ("var", "running_var")):
                    node[f"bn_down_{stat}"] = jnp.asarray(
                        sd[f"{pre}.downsample.1.{suf}"])
            params[f"layer{li}_{b}"] = node
    for li, n in ((7, ly[6]), (8, ly[7])):
        for i in range(n):
            put_convbn(f"layer{li}_{i}", f"base.{li}.{3*i}.weight",
                       f"base.{li}.{3*i+1}")
    params["seg_kernel"] = jnp.asarray(
        np.transpose(sd["seg.weight"], (2, 3, 1, 0)))
    params["seg_bias"] = jnp.asarray(sd["seg.bias"])
    return params


def resize_logits_pil(logits_nhwc: np.ndarray, width: int,
                      height: int) -> np.ndarray:
    """resize_4d_tensor: per-channel PIL BILINEAR resize
    (mIoU_score.py:169-193)."""
    from PIL import Image
    n, h, w, c = logits_nhwc.shape
    out = np.empty((n, height, width, c), np.float32)
    for i in range(n):
        for j in range(c):
            out[i, :, :, j] = np.asarray(Image.fromarray(
                logits_nhwc[i, :, :, j]).resize((width, height),
                                                Image.BILINEAR))
    return out


def compute_miou(cfg, fakes_m11: np.ndarray, dataset,
                 table_path: Optional[str] = None) -> float:
    """Full mIoU protocol on generated cityscapes photos
    (mIoU_score.py:195-218 + SegList's FromArray([2048,1024]) transform,
    l.78): fake -> bilinear resize to the label's resolution -> DRN-D-105
    forward -> fixed 8x deconv upsample -> argmax -> fast_hist vs the
    trainIds label named by table.txt.

    The reference hard-codes 2048x1024 because cityscapes labels ARE
    2048x1024; here the resolution comes from the label file itself, which
    is byte-identical on real cityscapes and lets thin random-weight
    fixtures exercise this exact path at test size. DRN depth is inferred
    from the checkpoint (infer_drn_layers), so full and thin checkpoints
    take the same code path.
    """
    from PIL import Image
    sd = _drn_sd(cfg.drn_path)
    layers = infer_drn_layers(sd)
    params = load_torch_drnseg(sd, layers=layers)
    model = DRNSeg(layers=layers)
    # the fixed bilinear 8x deconv brings logits back to full resolution;
    # the reference's per-channel PIL resize is then a no-op
    # (mIoU_score.py:175-176 early-returns when sizes already match)
    fn = jax.jit(lambda p, x: upsample_logits_8x(
        model.apply({"params": p}, x)))

    table_path = table_path or os.path.join(
        os.path.dirname(cfg.drn_path) or cfg.dataroot, "table.txt")
    table = []
    with open(table_path) as f:
        for line in f:
            table.append(line.strip().split(" "))
    names = [os.path.splitext(os.path.basename(p))[0]
             for p in getattr(dataset, "AB_paths", [])][:len(fakes_m11)]

    hist = np.zeros((19, 19))
    for fake, name in zip(fakes_m11, names):
        label_file = None
        for item in table:
            if item[0] == name or item[2][:-len(".png")].endswith(name):
                label_file = item[1]
                break
        if label_file is None:
            continue
        label = np.asarray(Image.open(
            os.path.join(cfg.dataroot, label_file)), np.int64)
        lh, lw = label.shape[:2]
        u8 = np.clip((fake + 1) / 2 * 255, 0, 255).astype(np.uint8)
        img = Image.fromarray(u8).resize((lw, lh), Image.BILINEAR)
        x = (np.asarray(img, np.float32) / 255.0 - CITYSCAPES_MEAN) \
            / CITYSCAPES_STD
        up = np.asarray(fn(params, x[None]))
        if up.shape[1:3] != (lh, lw):
            up = resize_logits_pil(up, lw, lh)
        pred = up.argmax(axis=-1)
        hist += fast_hist(pred.flatten(), label.flatten(), 19)
    return miou_from_hist(hist)
