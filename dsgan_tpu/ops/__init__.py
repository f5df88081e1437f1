"""Core numerics for DS-GAN TPU.

Everything here is layout-NHWC, jit-friendly (static shapes, no Python
control flow on traced values) and matches the reference's PyTorch
semantics bit-for-bit where recipes depend on them (SSIM window math,
TV divisor, InstanceNorm statistics, conv/conv-transpose geometry).
"""

from dsgan_tpu.ops.conv import (
    conv2d,
    conv_transpose2d,
    max_pool2d,
    dw_conv_s2d,
    conv2d_s2d,
    conv2d_lanefix,
    avg_pool2d,
    reflect_pad2d,
    adaptive_avg_pool,
    adaptive_max_pool,
    upsample_bilinear,
)
from dsgan_tpu.ops.norm import instance_norm, instance_stats, batch_norm_inference
from dsgan_tpu.ops.ssim import (
    MS_SSIM, SSIM, fspecial_gauss_1d, gaussian_filter, ms_ssim, ssim,
)
from dsgan_tpu.ops.losses import (
    gan_loss,
    l1_loss,
    tv_loss,
    perceptual_loss,
    ssim_loss,
)
from dsgan_tpu.ops.metrics import (
    normalize_u8, psnr_ref, psnr_uint8, ssim_ref, ssim_uint8,
)
from dsgan_tpu.ops.initializers import make_initializer

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "max_pool2d",
    "dw_conv_s2d",
    "conv2d_s2d",
    "conv2d_lanefix",
    "avg_pool2d",
    "reflect_pad2d",
    "adaptive_avg_pool",
    "adaptive_max_pool",
    "upsample_bilinear",
    "instance_norm",
    "instance_stats",
    "batch_norm_inference",
    "fspecial_gauss_1d",
    "gaussian_filter",
    "ssim",
    "ms_ssim",
    "SSIM",
    "MS_SSIM",
    "gan_loss",
    "l1_loss",
    "tv_loss",
    "perceptual_loss",
    "ssim_loss",
    "normalize_u8",
    "psnr_uint8",
    "ssim_uint8",
    "psnr_ref",
    "ssim_ref",
    "make_initializer",
]
