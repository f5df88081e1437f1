"""SSIM / MS-SSIM on NHWC images, matching the reference's vendored
implementation semantics exactly (reference DSGAN/MS_SSIM.py — itself the
public pytorch-msssim algorithm): separable 1-D Gaussian window applied
with VALID padding along each spatial dim, per-channel statistics,
``compensation=1``, cs/ssim maps averaged over space per channel.

The training loss uses single-scale ``ssim`` with data_range=1 on images
mapped to [0,1] (reference DSGAN/models/pix2pix_model.py:193-195).

All of this compiles into the fused train step; an optional Pallas kernel
for the Gaussian filtering lives in ``dsgan_tpu.pallas.ssim_filter``.
"""

import warnings

import jax.numpy as jnp
from jax import lax

from dsgan_tpu.ops.conv import avg_pool2d

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def fspecial_gauss_1d(size, sigma, dtype=jnp.float32):
    """1-D normalized Gaussian window (matches MS_SSIM.py:9-23)."""
    coords = jnp.arange(size, dtype=dtype) - size // 2
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _band_matrix(win_np, size_in):
    """(out, in) banded matrix B with B[i, i+j] = win[j] — expresses a
    VALID 1-D correlation as a dense matmul. Built at trace time (static
    shapes), so it compiles to a constant."""
    import numpy as np

    k = len(win_np)
    out = size_in - k + 1
    band = np.zeros((out, size_in), np.float32)
    for j in range(k):
        band[np.arange(out), np.arange(out) + j] = win_np[j]
    return jnp.asarray(band)


def separable_filter_valid(x, win_np):
    """Separable VALID 1-D filter along H then W as two banded MATMULS.

    TPU rationale: the conv formulation of this filter runs on 3-channel
    image tensors, which tile as (4,128) lanes — ~2% lane utilization —
    and profiled at ~12% of the whole train step. As banded dense
    contractions the MXU does it at full tilt for ~2x the (tiny) FLOPs.
    Matches the skip-small-dims semantics of the reference gaussian_filter
    (MS_SSIM.py:44-50).
    """
    size = len(win_np)
    out = x
    if x.shape[1] >= size:
        bh = _band_matrix(win_np, x.shape[1]).astype(x.dtype)
        out = jnp.einsum("oh,nhwc->nowc", bh, out)
    else:
        warnings.warn(
            f"Skipping Gaussian Smoothing at spatial dim 0 for input: {x.shape} and win size: {size}"
        )
    if x.shape[2] >= size:
        bw = _band_matrix(win_np, x.shape[2]).astype(x.dtype)
        out = jnp.einsum("ow,nhwc->nhoc", bw, out)
    else:
        warnings.warn(
            f"Skipping Gaussian Smoothing at spatial dim 1 for input: {x.shape} and win size: {size}"
        )
    return out


def _gauss_np(size, sigma):
    import numpy as np

    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return g / g.sum()


def gaussian_filter(x, win):
    """Separable Gaussian blur, VALID padding, per channel. x: NHWC.

    ``win`` may be a jnp vector (legacy conv-compatible interface); the
    implementation routes through the banded-matmul path using its static
    numpy value when available, else falls back to grouped convs.
    """
    import numpy as np

    size = win.shape[-1]
    try:
        win_np = np.asarray(win)
        return separable_filter_valid(x, win_np)
    except Exception:
        pass
    c = x.shape[-1]
    win = win.astype(x.dtype)
    out = x
    for axis, s in enumerate(x.shape[1:3]):
        if s >= size:
            if axis == 0:
                w = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, c))
            else:
                w = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, c))
            out = lax.conv_general_dilated(
                out,
                w,
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            ).astype(x.dtype)
        else:
            warnings.warn(
                f"Skipping Gaussian Smoothing at spatial dim {axis} for "
                f"input: {x.shape} and win size: {size}"
            )
    return out


def _ssim_maps(x, y, data_range, win_np, k=(0.01, 0.03)):
    """Per-channel SSIM and CS means. x, y: NHWC. Returns (N, C) arrays.
    ``win_np`` is a static numpy 1-D window (banded-matmul filtering)."""
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def gaussian_filter(v, _w=None):
        return separable_filter_valid(v, win_np)

    mu1 = gaussian_filter(x, None)
    mu2 = gaussian_filter(y, None)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = gaussian_filter(x * x) - mu1_sq
    sigma2_sq = gaussian_filter(y * y) - mu2_sq
    sigma12 = gaussian_filter(x * y) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map

    ssim_per_channel = jnp.mean(ssim_map, axis=(1, 2))
    cs = jnp.mean(cs_map, axis=(1, 2))
    return ssim_per_channel, cs


def ssim(
    x,
    y,
    data_range=255,
    size_average=True,
    win_size=11,
    win_sigma=1.5,
    k=(0.01, 0.03),
    nonnegative_ssim=False,
):
    """Single-scale SSIM (matches MS_SSIM.py:95-150). x, y: NHWC."""
    if x.shape != y.shape:
        raise ValueError(f"Input images should have the same dimensions, got {x.shape} vs {y.shape}.")
    if win_size % 2 != 1:
        raise ValueError("Window size should be odd.")
    ssim_per_channel, _ = _ssim_maps(x, y, data_range, _gauss_np(win_size, win_sigma), k)
    if nonnegative_ssim:
        ssim_per_channel = jnp.maximum(ssim_per_channel, 0.0)
    if size_average:
        return jnp.mean(ssim_per_channel)
    return jnp.mean(ssim_per_channel, axis=1)


def ms_ssim(
    x,
    y,
    data_range=255,
    size_average=True,
    win_size=11,
    win_sigma=1.5,
    weights=None,
    k=(0.01, 0.03),
):
    """Multi-scale SSIM (matches MS_SSIM.py:153-225). x, y: NHWC."""
    if x.shape != y.shape:
        raise ValueError(f"Input images should have the same dimensions, got {x.shape} vs {y.shape}.")
    if win_size % 2 != 1:
        raise ValueError("Window size should be odd.")
    smaller_side = min(x.shape[1:3])
    if smaller_side <= (win_size - 1) * 16:
        raise ValueError(
            "Image size should be larger than %d due to the 4 downsamplings "
            "in ms-ssim" % ((win_size - 1) * 16)
        )
    if weights is None:
        weights = MS_SSIM_WEIGHTS
    weights = jnp.asarray(weights, x.dtype)
    win_np = _gauss_np(win_size, win_sigma)

    levels = weights.shape[0]
    mcs = []
    ssim_per_channel = None
    for i in range(levels):
        ssim_per_channel, cs = _ssim_maps(x, y, data_range, win_np, k)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            pad = tuple(s % 2 for s in x.shape[1:3])
            x = avg_pool2d(x, 2, padding=(pad[0], pad[1]), count_include_pad=True)
            y = avg_pool2d(y, 2, padding=(pad[0], pad[1]), count_include_pad=True)

    ssim_per_channel = jnp.maximum(ssim_per_channel, 0.0)
    mcs_and_ssim = jnp.stack(mcs + [ssim_per_channel], axis=0)  # (L, N, C)
    ms_ssim_val = jnp.prod(mcs_and_ssim ** weights.reshape(-1, 1, 1), axis=0)
    if size_average:
        return jnp.mean(ms_ssim_val)
    return jnp.mean(ms_ssim_val, axis=1)
