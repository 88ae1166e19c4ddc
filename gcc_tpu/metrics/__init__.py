from gcc_tpu.metrics.psnr_ssim import psnr_y, ssim_y, y_channel  # noqa: F401
from gcc_tpu.metrics.fid import (  # noqa: F401
    frechet_distance, activation_statistics,
)
