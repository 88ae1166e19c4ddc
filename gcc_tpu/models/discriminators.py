"""Discriminator networks, plain and mask-gated (DARTS-searchable) variants.

  * PatchGAN        — models/Pix2Pix.py:267-348 (BatchNorm) and
                      models/CycleGAN.py:140-221 (plain uses InstanceNorm,
                      masked uses BatchNorm — reference quirk preserved).
  * SAGANDiscriminator — models/SAGAN.py:173-277 (spectral-norm convs + attn).
  * SRGANDiscriminator — models/SRGAN.py:199-295 (VGG-style, adaptive pool+FC).

Masked variants insert a MaskGate (DifferentiableOP) per conv stage; alphas
live in the 'arch' collection so engines optimize them separately.
Distillation intermediates are sown at the reference's extract points.
"""

from __future__ import annotations

import jax
import flax.linen as nn

from gcc_tpu.ops.layers import (
    BatchNorm, Conv, Dense, InstanceNorm, adaptive_avg_pool, leaky_relu,
)
from gcc_tpu.ops.attention import SelfAttention
from gcc_tpu.ops.mask import MaskGate
from gcc_tpu.ops.spectral import SpectralConv


class PatchGAN(nn.Module):
    """NLayerDiscriminator: 4x4 convs, stride 2,2,2,1,1 (n_layers=3).

    masked=True inserts MaskGate after each normed stage plus the first conv
    (MaskNLayerDiscriminator, Pix2Pix.py:307-348). Masked variant always uses
    BatchNorm (CycleGAN.py:185); plain variant uses `norm`.

    Sown intermediates (Pix2Pix.py:370-373): d_feat_0 / d_feat_1 = post-norm
    outputs of conv stages 1 and 3 (0-indexed; widths ndf*2 and ndf*8).
    """

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"  # 'batch' | 'instance'
    masked: bool = False
    threshold: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        norm_kind = "batch" if self.masked else self.norm
        use_bias = norm_kind == "instance"

        def norm(h, idx):
            if norm_kind == "batch":
                return BatchNorm(use_running_average=not train,
                                 name=f"norm_{idx}")(h)
            return InstanceNorm(name=f"norm_{idx}")(h)

        h = Conv(self.ndf, (4, 4), (2, 2), 1, name="conv_0")(x)
        h = leaky_relu(h, 0.2)
        if self.masked:
            h = MaskGate(self.ndf, self.threshold, name="mask_0")(h)

        nf = 1
        feat_idx = 0
        for n in range(1, self.n_layers + 1):
            nf_prev, nf = nf, min(2 ** n, 8)
            stride = (2, 2) if n < self.n_layers else (1, 1)
            h = Conv(self.ndf * nf, (4, 4), stride, 1, use_bias=use_bias,
                     name=f"conv_{n}")(h)
            h = norm(h, n)
            if n in (1, self.n_layers):
                self.sow("intermediates", f"d_feat_{feat_idx}", h)
                feat_idx += 1
            if self.masked:
                h = MaskGate(self.ndf * nf, self.threshold, name=f"mask_{n}")(h)
            h = leaky_relu(h, 0.2)

        return Conv(1, (4, 4), (1, 1), 1, name="conv_out")(h)


class SAGANDiscriminator(nn.Module):
    """4x spectral-norm conv stages + 2 self-attention + 4x4 conv head
    (models/SAGAN.py:173-277). LeakyReLU slope 0.1; masked variant gates each
    stage output before the activation (SAGAN.py:235-255).

    Sown intermediates ('l2', 'attn2', SAGAN.py:296-298): stage-2 activation
    and the second attention output.
    """

    ndf: int = 64
    image_size: int = 64
    masked: bool = False
    threshold: float = 0.5
    pallas_attn_threshold: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dims = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]
        h = x
        for i, dim in enumerate(dims):
            h = SpectralConv(dim, (4, 4), (2, 2), 1, name=f"l{i + 1}")(h)
            if self.masked:
                h = MaskGate(dim, self.threshold, name=f"mask_{i + 1}")(h)
            h = leaky_relu(h, 0.1)
            if i == 1:
                self.sow("intermediates", "d_feat_0", h)
            if i == 2:
                h = SelfAttention(
                    use_pallas_threshold=self.pallas_attn_threshold,
                    name="attn1")(h)
        h = SelfAttention(use_pallas_threshold=self.pallas_attn_threshold,
                          name="attn2")(h)
        self.sow("intermediates", "d_feat_1", h)
        h = Conv(1, (4, 4), (1, 1), 0, name="last")(h)
        return h.reshape(h.shape[0])


class SRGANDiscriminator(nn.Module):
    """VGG-style: n_blocks conv blocks (odd blocks double channels at stride 1,
    even halve resolution at stride 2; first block has no BN), global average
    pool, linear head (models/SRGAN.py:199-295). LeakyReLU slope 0.2.

    Sown intermediates ('conv_blocks.1', 'conv_blocks.3', SRGAN.py:322-325):
    full block outputs (post-activation) of blocks 1 and 3.
    """

    ndf: int = 64
    n_blocks: int = 4
    kernel_size: int = 3
    masked: bool = False
    threshold: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        k = self.kernel_size
        in_ch = 3
        h = x
        for i in range(self.n_blocks):
            out_ch = (self.ndf if i == 0 else in_ch * 2) if i % 2 == 0 else in_ch
            stride = (1, 1) if i % 2 == 0 else (2, 2)
            h = Conv(out_ch, (k, k), stride, k // 2, name=f"conv_{i}")(h)
            if i != 0:
                h = BatchNorm(use_running_average=not train, name=f"norm_{i}")(h)
            if self.masked:
                h = MaskGate(out_ch, self.threshold, name=f"mask_{i}")(h)
            h = leaky_relu(h, 0.2)
            if i in (1, 3):
                self.sow("intermediates", f"d_feat_{0 if i == 1 else 1}", h)
            in_ch = out_ch
        h = adaptive_avg_pool(h, (1, 1))
        return Dense(1, name="fc")(h)
