"""Evaluation-protocol metrics.

The reference's quality protocol (DSGAN/train.py:33-44,110-120) is:
  1. map network outputs from [-1,1] to [0,255], clip, truncate to uint8;
  2. PSNR  = skimage.peak_signal_noise_ratio(label, result, data_range=255)
  3. SSIM  = skimage.structural_similarity(label, result,
             multichannel=True, data_range=255)   # win_size=7, uniform
             # filter, sample covariance — the skimage defaults.

skimage is not a dependency here; ``psnr_ref`` / ``ssim_ref`` re-implement
that exact protocol in numpy (float64, like skimage). ``psnr_uint8`` /
``ssim_uint8`` are jit-compatible float32 versions computed ON DEVICE so
the training loop never syncs per-image to the host (the reference's big
throughput bug, train.py:110-120).

The uniform-filter SSIM with edge cropping equals a VALID-window mean, so
no boundary handling is needed.
"""

import jax.numpy as jnp
import numpy as np


def normalize_u8(x):
    """Raw uint8 pixels -> [-1,1] float32; identity for float inputs.

    The trace-time dtype branch lets jitted steps accept either the
    loader's raw-uint8 fast path (quarter H2D bytes; see
    data/transforms.get_transform) or pre-normalized float batches —
    same f32 ops/order as the host pipeline, so the paths are
    bit-identical."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return x


def quantize_uint8(x):
    """[-1,1] NHWC float -> [0,255] 'uint8' values (still float, on device).

    Matches np.clip(((x+1)/2)*255, 0, 255).astype(np.uint8): astype
    truncates toward zero, i.e. floor for non-negative values.
    """
    v = jnp.clip((x.astype(jnp.float32) + 1.0) / 2.0 * 255.0, 0.0, 255.0)
    return jnp.floor(v)


def psnr_uint8(label, result, data_range=255.0):
    """PSNR between quantized [0,255] arrays (device, float32)."""
    err = label.astype(jnp.float32) - result.astype(jnp.float32)
    mse = jnp.mean(jnp.square(err))
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _uniform_valid(x, win):
    """VALID-window uniform filter over H,W per channel (NHWC), as two
    banded matmuls — 3-channel convs tile catastrophically on TPU (see
    ops/ssim.py separable_filter_valid)."""
    from dsgan_tpu.ops.ssim import separable_filter_valid

    w = np.full((win,), 1.0 / win, np.float32)
    return separable_filter_valid(x, w)


def ssim_uint8(label, result, data_range=255.0, win_size=7, k1=0.01, k2=0.03):
    """skimage-protocol SSIM on quantized [0,255] NHWC arrays (device).

    Uniform window, sample covariance (cov_norm = NP/(NP-1)), per-channel
    SSIM averaged — the structural_similarity defaults.
    """
    x = label.astype(jnp.float32)
    y = result.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ux = _uniform_valid(x, win_size)
    uy = _uniform_valid(y, win_size)
    uxx = _uniform_valid(x * x, win_size)
    uyy = _uniform_valid(y * y, win_size)
    uxy = _uniform_valid(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    return jnp.mean(s)


def psnr_ref(img1, img2):
    """Reference cal_psnr (DSGAN/train.py:33-41) on host numpy arrays."""
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    mse_norm = np.mean((img1 / 255.0 - img2 / 255.0) ** 2)
    if mse_norm < 1.0e-10:
        return 100.0
    data_range = 255 if img1.dtype == np.uint8 else 1.0
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(data_range**2 / mse))


def _uniform_valid_np(x, win):
    """VALID uniform filter on a 2-D float64 array via cumulative sums."""
    cs = np.cumsum(np.cumsum(x, axis=0), axis=1)
    cs = np.pad(cs, ((1, 0), (1, 0)))
    s = cs[win:, win:] - cs[:-win, win:] - cs[win:, :-win] + cs[:-win, :-win]
    return s / (win * win)


def ssim_ref(img1, img2, data_range=None, win_size=7, k1=0.01, k2=0.03):
    """Reference cal_ssim protocol (skimage structural_similarity defaults)
    on host numpy arrays; HWC multichannel or HW grayscale."""
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    if data_range is None:
        data_range = 255 if img1.dtype == np.uint8 else 1.0
    if img1.ndim == 3:
        return float(
            np.mean([
                ssim_ref(img1[..., c], img2[..., c], data_range, win_size, k1, k2)
                for c in range(img1.shape[-1])
            ])
        )
    x = img1.astype(np.float64)
    y = img2.astype(np.float64)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ux = _uniform_valid_np(x, win_size)
    uy = _uniform_valid_np(y, win_size)
    vx = cov_norm * (_uniform_valid_np(x * x, win_size) - ux * ux)
    vy = cov_norm * (_uniform_valid_np(y * y, win_size) - uy * uy)
    vxy = cov_norm * (_uniform_valid_np(x * y, win_size) - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    return float(np.mean(s))
