from gcc_tpu.ops.mask import mask_from_alpha, MaskGate  # noqa: F401
from gcc_tpu.ops.layers import (  # noqa: F401
    Conv, ConvTranspose, BatchNorm, InstanceNorm, SeparableConv,
    SubPixelConv, Dense, PReLU, conv_init, norm_scale_init, norm_bias_init,
)
from gcc_tpu.ops.attention import SelfAttention  # noqa: F401
from gcc_tpu.ops.spectral import SpectralConv, SpectralConvTranspose  # noqa: F401
