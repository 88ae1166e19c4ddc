"""Generator networks for the four GAN families (cfg-driven widths, NHWC).

Re-designs of the reference topologies (not translations):
  * UnetGenerator        — models/Pix2Pix.py:79-130 (recursive UnetSkipConnectionBlock
                           becomes two explicit loops with skip concat; zero-width
                           block elision matches Pix2Pix.py:87-127).
  * MobileResnetGenerator— models/CycleGAN.py:77-138 (= models/Pix2Pix.py:199-265).
  * SAGANGenerator       — models/SAGAN.py:109-171.
  * SRResNet             — models/SRGAN.py:139-197.

Distillation feature extraction uses `Module.sow` into the `intermediates`
collection at the exact points the reference hooks (see each class docstring),
replacing torch forward hooks (models/Pix2Pix.py:702-727).

Conventions: inputs/activations NHWC; in-channels are inferred from inputs, so
only out-channel cfgs (`filter_cfgs`) drive construction — `channel_cfgs` is
carried in checkpoints for reference parity and consumed by the MACs counter
and transform-conv sizing (gcc_tpu.compress).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gcc_tpu.ops.layers import (
    BatchNorm, Conv, ConvTranspose, InstanceNorm, PReLU, SeparableConv,
    SubPixelConv, conv_init, leaky_relu, reflect_pad,
)
from gcc_tpu.ops.attention import SelfAttention
from gcc_tpu.ops.spectral import SpectralConvTranspose


# ---------------------------------------------------------------------------
# U-Net (pix2pix)
# ---------------------------------------------------------------------------

def unet_default_filter_cfgs(ngf: int, num_downs: int) -> list:
    """Unpruned filter_cfgs: downs [0..N-1] then ups [N..2N-2] (innermost->depth1)."""
    n = num_downs
    downs = [ngf * min(2 ** k, 8) for k in range(n)]
    ups = [ngf * min(2 ** (k - 1), 8) for k in range(n - 1, 0, -1)]
    return downs + ups


def unet_default_channel_cfgs(ngf: int, num_downs: int) -> list:
    """Unpruned channel_cfgs (input widths; see Pix2Pix.py:88-127)."""
    n = num_downs
    downs = [ngf * min(2 ** (k + 1), 8) for k in range(n - 1)]
    inner_up_in = [ngf * 8]
    cat = [2 * ngf * min(2 ** (k - 1), 8) for k in range(n - 1, 0, -1)]
    return downs + inner_up_in + cat


class UnetGenerator(nn.Module):
    """8-down U-Net with cfg-driven widths and zero-width block elision.

    filter_cfgs layout (N = num_downs, len 2N-1):
      [0..N-1]   out-channels of downconvs, outermost -> innermost
      [N]        out-channels of the innermost upconv
      [N+1..2N-2] out-channels of upconvs, depth N-2 -> depth 1
    Outermost upconv out-channels are fixed at output_nc.

    Elision (Pix2Pix.py:87-103): the innermost block exists iff
    f[N-1] != 0 and f[N] != 0; a middle loop block at depth d in
    [4..N-2] exists iff f[d] != 0 and f[2N-2-d] != 0. When a block is
    elided, the skip chain passes the shallower feature straight through.

    Sown intermediates (reference extract layers, Pix2Pix.py:366-369):
      g_feat_0 <- BN output of down depth 1       ('model.model.1.model.2')
      g_feat_1 <- BN output of down depth 3       ('...model.3.model.3.model.2')
      g_feat_2 <- relu(concat) feeding up depth 3 ('...model.3.model.3.model.4')
      g_feat_3 <- relu(concat) feeding up depth 1 ('model.model.1.model.4')
    """

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    use_dropout: bool = True
    filter_cfgs: Optional[Sequence[int]] = None
    channel_cfgs: Optional[Sequence[int]] = None  # carried, not used to build

    def _exists(self, f, depth: int) -> bool:
        n = self.num_downs
        if depth == n - 1:
            return f[n - 1] != 0 and f[n] != 0
        if 4 <= depth <= n - 2:
            return f[depth] != 0 and f[2 * n - 1 - depth] != 0
        return True  # depths 0..3 always exist

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        n = self.num_downs
        f = list(self.filter_cfgs) if self.filter_cfgs is not None \
            else unet_default_filter_cfgs(self.ngf, n)

        depths = [d for d in range(n) if self._exists(f, d)]

        # --- encoder ---
        skips = {}
        h = x
        for d in depths:
            if d > 0:
                h = leaky_relu(h, 0.2)
            # every downconv is bias-free (Pix2Pix.py:31-32, use_bias=False for
            # BatchNorm); innermost and outermost downs also carry no norm.
            h = Conv(f[d], (4, 4), (2, 2), 1, use_bias=False,
                     name=f"down_{d}")(h)
            if d != 0 and d != n - 1:
                h = BatchNorm(use_running_average=not train,
                              name=f"down_norm_{d}")(h)
                if d == 1:
                    self.sow("intermediates", "g_feat_0", h)
                if d == 3:
                    self.sow("intermediates", "g_feat_1", h)
            skips[d] = h

        # --- decoder ---
        # walk back up through existing depths; concat skip at each level
        for d in reversed(depths):
            h = jax.nn.relu(h)  # uprelu on down output (innermost) or concat
            if d == 3:
                self.sow("intermediates", "g_feat_2", h)
            if d == 1:
                self.sow("intermediates", "g_feat_3", h)
            if d == 0:
                out = ConvTranspose(self.output_nc, (4, 4), (2, 2), 1,
                                    name="up_0")(h)  # outermost keeps its bias
                return jnp.tanh(out)
            up_out_ch = f[2 * n - 1 - d]
            h2 = ConvTranspose(up_out_ch, (4, 4), (2, 2), 1,
                               use_bias=False, name=f"up_{d}")(h)
            h2 = BatchNorm(use_running_average=not train,
                           name=f"up_norm_{d}")(h2)
            if self.use_dropout and 4 <= d <= n - 2:
                h2 = nn.Dropout(0.5, deterministic=not train)(h2)
            # concat with the next-shallower existing skip
            shallower = max(dd for dd in depths if dd < d)
            h = jnp.concatenate([skips[shallower], h2], axis=-1)
        raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Mobile ResNet (cyclegan / pix2pix --backbone resnet)
# ---------------------------------------------------------------------------

def mobile_resnet_default_cfg(ngf: int, n_blocks: int = 9) -> list:
    """[conv7, down1, down2, (block layer1, layer2) x n, up1, up2]."""
    return ([ngf, ngf * 2, ngf * 4] + [ngf * 4] * (2 * n_blocks)
            + [ngf * 2, ngf])


def _round_up_128(c: int) -> int:
    return (c + 127) // 128 * 128


class _ConvParams(nn.Module):
    """Parameter-only stand-in for Conv: declares the identical kernel/bias
    tree (same names, shapes, inits) and returns the kernel without
    computing. Used by the fused-block path, which reads kernels directly;
    biases are mathematically inert there (every conv feeds an affine-free
    InstanceNorm — see ops/pallas/mobile_block.py)."""

    kernel_shape: Tuple[int, ...]
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", conv_init(), self.kernel_shape)
        self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return k


class _SepConvParams(nn.Module):
    """Parameter tree of SeparableConv (depthwise/pointwise), fused path."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        dwk = _ConvParams((3, 3, 1, in_ch), in_ch, name="depthwise")()
        pwk = _ConvParams((1, 1, in_ch, self.features), self.features,
                          name="pointwise")()
        return dwk, pwk


class MobileResnetGenerator(nn.Module):
    """ReflectPad conv7 -> 2x down -> n separable-conv residual blocks -> 2x up
    -> conv7 tanh (models/CycleGAN.py:77-138). InstanceNorm throughout.

    cfg layout (len 3 + 2*n_blocks + 2): [c7, d1, d2, (b_i l1, b_i l2)*n, u1, u2].
    A block is elided when its layer1 width is 0 (CycleGAN.py:112-113).
    Residual adds require every block's l2 == d2 width (enforced by prune).

    Sown intermediates ('model.9', 'model.12', 'model.15', 'model.18',
    CycleGAN.py:239): relu after down2, and outputs of blocks 2, 5, 8.

    use_fused_blocks: None (auto: on when on TPU and dropout-free) | bool.
    The fused path runs each residual block as Pallas kernels holding the
    activation in VMEM end-to-end (ops/pallas/mobile_block.py) with an
    IDENTICAL parameter tree — checkpoints/ports are layout-compatible both
    ways, and sown features are unchanged (blocks sow after the add).
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    dropout_rate: float = 0.0
    cfg: Optional[Sequence[int]] = None
    use_fused_blocks: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        cfg = list(self.cfg) if self.cfg is not None \
            else mobile_resnet_default_cfg(self.ngf, self.n_blocks)
        fused = self.use_fused_blocks
        if fused is None:
            # Measured on v5e (see benchmarks/fused_block_result.json): the
            # Pallas block is 0.89x XLA forward / 0.74x fwd+bwd at teacher
            # shapes — XLA's conv pipeline already sits within ~1.35x of its
            # own traffic bound here, so fusion's traffic savings don't pay
            # for the VPU pass overhead. Default OFF; --fused_resblock on
            # re-enables for future hardware/compiler revisions.
            fused = False
        fused = fused and self.dropout_rate == 0 and min(x.shape[1:3]) >= 20
        # init can take either path (identical param trees); the unfused one
        # avoids compiling/executing the Pallas kernels un-jitted at init
        fused = fused and not self.is_initializing()
        if fused:
            # VMEM gate: one stage must fit on-chip (~16 MB). Calibrated on
            # v5e: the f32 C=M=256 stage at 64x64 measures ~16.6 MB.
            hw = (x.shape[1] // 4) * (x.shape[2] // 4)
            max_c = max(cfg[2:3 + 2 * self.n_blocks] or [0])
            est = hw * _round_up_128(max_c) * x.dtype.itemsize * 6
            fused = est <= 15_500_000

        h = reflect_pad(x, 3)
        h = Conv(cfg[0], (7, 7), (1, 1), 0, name="conv_in")(h)
        h = jax.nn.relu(InstanceNorm()(h))
        for i in range(2):
            h = Conv(cfg[1 + i], (3, 3), (2, 2), 1, name=f"down_{i}")(h)
            h = jax.nn.relu(InstanceNorm()(h))
        self.sow("intermediates", "g_feat_0", h)

        feat_blocks = {2: "g_feat_1", 5: "g_feat_2", 8: "g_feat_3"}
        for b in range(self.n_blocks):
            l1, l2 = cfg[3 + 2 * b], cfg[4 + 2 * b]
            if l1 != 0 and fused:
                from gcc_tpu.ops.pallas.mobile_block import fused_mobile_block
                dwk1, pwk1 = _SepConvParams(
                    l1, name=f"block_{b}_sep1")(h.shape[-1])
                dwk2, pwk2 = _SepConvParams(l2, name=f"block_{b}_sep2")(l1)
                h = fused_mobile_block(h, dwk1, pwk1, dwk2, pwk2)
            elif l1 != 0:
                r = reflect_pad(h, 1)
                r = SeparableConv(l1, (3, 3), (1, 1), 0, name=f"block_{b}_sep1")(r)
                r = jax.nn.relu(InstanceNorm()(r))
                if self.dropout_rate > 0:
                    r = nn.Dropout(self.dropout_rate, deterministic=not train)(r)
                r = reflect_pad(r, 1)
                r = SeparableConv(l2, (3, 3), (1, 1), 0, name=f"block_{b}_sep2")(r)
                r = InstanceNorm()(r)
                h = h + r
            if b in feat_blocks:
                self.sow("intermediates", feat_blocks[b], h)

        for i in range(2):
            h = ConvTranspose(cfg[3 + 2 * self.n_blocks + i], (3, 3), (2, 2),
                              padding=1, output_padding=1, name=f"up_{i}")(h)
            h = jax.nn.relu(InstanceNorm()(h))
        h = reflect_pad(h, 3)
        h = Conv(self.output_nc, (7, 7), (1, 1), 0, name="conv_out")(h)
        return jnp.tanh(h)


# ---------------------------------------------------------------------------
# SAGAN generator
# ---------------------------------------------------------------------------

def sagan_default_filter_cfgs(ngf: int, image_size: int = 64) -> list:
    import math
    repeat = int(math.log2(image_size)) - 3
    mult = 2 ** repeat
    return [ngf * mult, ngf * mult // 2, ngf * mult // 4, ngf * mult // 8]


class SAGANGenerator(nn.Module):
    """z -> 4x spectral-norm deconv stages with BN + two self-attention blocks
    (models/SAGAN.py:109-171). image_size 64 fixed (4 stages + output deconv).

    Sown intermediates ('l2', 'attn2', SAGAN.py:294): relu output of stage 2
    and the output of the second attention block.
    """

    ngf: int = 64
    image_size: int = 64
    z_dim: int = 128
    filter_cfgs: Optional[Sequence[int]] = None
    pallas_attn_threshold: int = 1024

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        f = list(self.filter_cfgs) if self.filter_cfgs is not None \
            else sagan_default_filter_cfgs(self.ngf, self.image_size)
        h = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        # stage 1: 1x1 -> 4x4 (k=4, s=1, p=0)
        h = SpectralConvTranspose(f[0], (4, 4), (1, 1), padding=0, name="l1")(h)
        h = jax.nn.relu(BatchNorm(use_running_average=not train, name="bn1")(h))
        h = SpectralConvTranspose(f[1], (4, 4), (2, 2), padding=1, name="l2")(h)
        h = jax.nn.relu(BatchNorm(use_running_average=not train, name="bn2")(h))
        self.sow("intermediates", "g_feat_0", h)
        h = SpectralConvTranspose(f[2], (4, 4), (2, 2), padding=1, name="l3")(h)
        h = jax.nn.relu(BatchNorm(use_running_average=not train, name="bn3")(h))
        h = SelfAttention(use_pallas_threshold=self.pallas_attn_threshold,
                          name="attn1")(h)
        h = SpectralConvTranspose(f[3], (4, 4), (2, 2), padding=1, name="l4")(h)
        h = jax.nn.relu(BatchNorm(use_running_average=not train, name="bn4")(h))
        h = SelfAttention(use_pallas_threshold=self.pallas_attn_threshold,
                          name="attn2")(h)
        self.sow("intermediates", "g_feat_1", h)
        h = ConvTranspose(3, (4, 4), (2, 2), padding=1, name="last")(h)
        return jnp.tanh(h)


# ---------------------------------------------------------------------------
# SRGAN generator (SRResNet)
# ---------------------------------------------------------------------------

class SRResNet(nn.Module):
    """conv9 PReLU -> 16 residual blocks (prunable inner width) -> conv3 BN +
    global skip -> 2x subpixel x2 -> conv9 tanh (models/SRGAN.py:139-197).

    filter_cfgs: per-block inner channel counts, len n_blocks (SRGAN.py:164-166).
    Sown intermediates: outputs of residual blocks 3, 7, 11, 15 (SRGAN.py:318-321).
    """

    n_channels: int = 64
    n_blocks: int = 16
    scaling_factor: int = 4
    large_kernel: int = 9
    small_kernel: int = 3
    filter_cfgs: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        import math
        nc = self.n_channels
        f = list(self.filter_cfgs) if self.filter_cfgs is not None \
            else [nc] * self.n_blocks
        lk, sk = self.large_kernel, self.small_kernel

        h = Conv(nc, (lk, lk), (1, 1), lk // 2, name="conv_in")(x)
        h = PReLU(name="prelu_in")(h)
        residual = h
        feat_blocks = {3: "g_feat_0", 7: "g_feat_1", 11: "g_feat_2", 15: "g_feat_3"}
        for b in range(self.n_blocks):
            inner = f[b]
            if inner != 0:
                r = Conv(inner, (sk, sk), (1, 1), sk // 2, name=f"block_{b}_conv1")(h)
                r = BatchNorm(use_running_average=not train,
                              name=f"block_{b}_bn1")(r)
                r = PReLU(name=f"block_{b}_prelu")(r)
                r = Conv(nc, (sk, sk), (1, 1), sk // 2, name=f"block_{b}_conv2")(r)
                r = BatchNorm(use_running_average=not train,
                              name=f"block_{b}_bn2")(r)
                h = h + r
            if b in feat_blocks:
                self.sow("intermediates", feat_blocks[b], h)
        h2 = Conv(nc, (sk, sk), (1, 1), sk // 2, name="conv_mid")(h)
        h2 = BatchNorm(use_running_average=not train, name="bn_mid")(h2)
        h = h2 + residual
        for i in range(int(math.log2(self.scaling_factor))):
            h = SubPixelConv(nc, (sk, sk), 2, name=f"subpixel_{i}")(h)
        h = Conv(3, (lk, lk), (1, 1), lk // 2, name="conv_out")(h)
        return jnp.tanh(h)
