"""SSIM / MS-SSIM / loss parity tests.

The oracle is an independent float64 numpy implementation of the published
SSIM algorithm (Wang et al.), written here from the formula — a second
code path (numpy cumsum / direct convolution vs lax conv) so layout or
windowing bugs in the framework implementation cannot self-confirm.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from dsgan_tpu import ops
from dsgan_tpu.ops.ssim import MS_SSIM_WEIGHTS

RNG = np.random.default_rng(7)


def _gauss1d(size, sigma):
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return g / g.sum()


def _blur_valid_np(img, win):
    """Separable VALID gaussian blur of a 2-D float64 array."""
    k = len(win)
    out = np.apply_along_axis(lambda r: np.convolve(r, win[::-1], mode="valid"), 0, img)
    out = np.apply_along_axis(lambda r: np.convolve(r, win[::-1], mode="valid"), 1, out)
    return out


def _ssim_np(x, y, data_range, win_size=11, win_sigma=1.5, k=(0.01, 0.03)):
    """Per-channel gaussian SSIM + CS means for NHWC float arrays."""
    win = _gauss1d(win_size, win_sigma)
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    n, h, w, c = x.shape
    ssim_pc = np.zeros((n, c))
    cs_pc = np.zeros((n, c))
    for i in range(n):
        for j in range(c):
            xa = x[i, :, :, j].astype(np.float64)
            ya = y[i, :, :, j].astype(np.float64)
            mu1 = _blur_valid_np(xa, win)
            mu2 = _blur_valid_np(ya, win)
            s1 = _blur_valid_np(xa * xa, win) - mu1 * mu1
            s2 = _blur_valid_np(ya * ya, win) - mu2 * mu2
            s12 = _blur_valid_np(xa * ya, win) - mu1 * mu2
            cs = (2 * s12 + c2) / (s1 + s2 + c2)
            smap = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
            ssim_pc[i, j] = smap.mean()
            cs_pc[i, j] = cs.mean()
    return ssim_pc, cs_pc


def test_gaussian_window_normalized():
    w = np.asarray(ops.fspecial_gauss_1d(11, 1.5))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(w, _gauss1d(11, 1.5), rtol=1e-5)


def test_ssim_identity_is_one():
    x = jnp.asarray(RNG.random((2, 64, 64, 3), dtype=np.float32))
    assert abs(float(ops.ssim(x, x, data_range=1)) - 1.0) < 1e-5


def test_ssim_matches_numpy_oracle():
    x = RNG.random((2, 48, 48, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * RNG.standard_normal(x.shape).astype(np.float32), 0, 1)
    want, _ = _ssim_np(x, y, data_range=1)
    got = ops.ssim(jnp.asarray(x), jnp.asarray(y), data_range=1, size_average=False)
    np.testing.assert_allclose(np.asarray(got), want.mean(axis=1), rtol=2e-4, atol=2e-4)
    got_avg = ops.ssim(jnp.asarray(x), jnp.asarray(y), data_range=1)
    np.testing.assert_allclose(float(got_avg), want.mean(), rtol=2e-4, atol=2e-4)


def test_ms_ssim_matches_numpy_oracle():
    x = RNG.random((1, 180, 180, 3)).astype(np.float32)
    y = np.clip(x + 0.05 * RNG.standard_normal(x.shape).astype(np.float32), 0, 1)

    # numpy oracle of the 5-level pyramid with the reference weights
    weights = np.asarray(MS_SSIM_WEIGHTS)
    xa, ya = x.copy(), y.copy()
    mcs = []
    ssim_pc = None
    for lvl in range(5):
        ssim_pc, cs_pc = _ssim_np(xa, ya, data_range=1)
        if lvl < 4:
            mcs.append(np.maximum(cs_pc, 0))
            pads = [s % 2 for s in xa.shape[1:3]]
            xt = torch.from_numpy(xa.transpose(0, 3, 1, 2))
            yt = torch.from_numpy(ya.transpose(0, 3, 1, 2))
            xa = TF.avg_pool2d(xt, 2, padding=pads).numpy().transpose(0, 2, 3, 1)
            ya = TF.avg_pool2d(yt, 2, padding=pads).numpy().transpose(0, 2, 3, 1)
    stack = np.stack(mcs + [np.maximum(ssim_pc, 0)], axis=0)
    want = np.prod(stack ** weights.reshape(-1, 1, 1), axis=0).mean()

    got = ops.ms_ssim(jnp.asarray(x), jnp.asarray(y), data_range=1)
    np.testing.assert_allclose(float(got), want, rtol=5e-4, atol=5e-4)


def test_gan_loss_matches_torch():
    logits = RNG.standard_normal((2, 30, 30, 1)).astype(np.float32)
    lt = torch.from_numpy(logits)
    for real in (True, False):
        tgt = torch.full_like(lt, 1.0 if real else 0.0)
        want_bce = TF.binary_cross_entropy_with_logits(lt, tgt).item()
        want_mse = TF.mse_loss(lt, tgt).item()
        got_bce = float(ops.gan_loss(jnp.asarray(logits), real, "vanilla"))
        got_mse = float(ops.gan_loss(jnp.asarray(logits), real, "lsgan"))
        np.testing.assert_allclose(got_bce, want_bce, rtol=1e-5)
        np.testing.assert_allclose(got_mse, want_mse, rtol=1e-5)


def test_gan_loss_multiscale_sums_scales():
    a = jnp.asarray(RNG.standard_normal((1, 8, 8, 1)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((1, 4, 4, 1)).astype(np.float32))
    single = float(ops.gan_loss(a, True)) + float(ops.gan_loss(b, True))
    multi = float(ops.gan_loss([[a], [b]], True))
    np.testing.assert_allclose(multi, single, rtol=1e-6)


def test_tv_loss_matches_reference_formula():
    x = RNG.standard_normal((2, 32, 32, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    diff_i = torch.sum(torch.abs(xt[:, :, :, 1:] - xt[:, :, :, :-1]))
    diff_j = torch.sum(torch.abs(xt[:, :, 1:, :] - xt[:, :, :-1, :]))
    want = ((diff_i + diff_j) / (320 * 256)).item()
    got = float(ops.tv_loss(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_loss_range():
    x = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    assert float(ops.ssim_loss(x, x)) < 1e-5
    y = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    assert float(ops.ssim_loss(x, y)) > 0.1


def test_device_metrics_match_host_protocol():
    a = RNG.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    b = RNG.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    got_psnr = float(ops.psnr_uint8(jnp.asarray(a[None]), jnp.asarray(b[None])))
    np.testing.assert_allclose(got_psnr, ops.psnr_ref(a, b), rtol=1e-4)
    got_ssim = float(ops.ssim_uint8(jnp.asarray(a[None]), jnp.asarray(b[None])))
    np.testing.assert_allclose(got_ssim, ops.ssim_ref(a, b), rtol=1e-3, atol=1e-4)


def test_quantize_uint8_matches_numpy_cast():
    x = RNG.uniform(-1.3, 1.3, (1, 8, 8, 3)).astype(np.float32)
    want = np.clip((x + 1) / 2 * 255.0, 0, 255).astype(np.uint8)
    got = np.asarray(ops.metrics.quantize_uint8(jnp.asarray(x))).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def _ref_msssim_module():
    """Import the reference vendored MS_SSIM (torch) as the 5-D oracle —
    imported straight from /root/reference, never copied."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_ms_ssim", "/root/reference/DSGAN/MS_SSIM.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_ms_ssim"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ssim_5d_matches_reference_torch():
    """NDHWC video-volume SSIM vs the reference's conv3d gaussian_filter
    path (MS_SSIM.py:26-52,95-150) on the same data (NCDHW there)."""
    ref = _ref_msssim_module()
    x = RNG.uniform(0, 1, (2, 12, 24, 24, 3)).astype(np.float32)
    y = np.clip(x + RNG.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    want = ref.ssim(
        torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(y.transpose(0, 4, 1, 2, 3)),
        data_range=1.0,
    ).item()
    got = float(ops.ssim(jnp.asarray(x), jnp.asarray(y), data_range=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_5d_small_depth_skips_that_dim():
    """depth < win_size triggers the reference's skip-small-dims warning
    path: only H/W are filtered."""
    ref = _ref_msssim_module()
    x = RNG.uniform(0, 1, (1, 4, 32, 32, 1)).astype(np.float32)
    y = RNG.uniform(0, 1, (1, 4, 32, 32, 1)).astype(np.float32)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        want = ref.ssim(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
            torch.from_numpy(y.transpose(0, 4, 1, 2, 3)),
            data_range=1.0,
        ).item()
        got = float(ops.ssim(jnp.asarray(x), jnp.asarray(y), data_range=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ms_ssim_5d_matches_reference_torch():
    """NDHWC MS-SSIM vs the reference's avg_pool3d multi-scale path
    (MS_SSIM.py:153-225). H/W must survive the 4 halvings; depth is
    pooled (and eventually skip-filtered) exactly as the reference does."""
    ref = _ref_msssim_module()
    x = RNG.uniform(0, 1, (1, 16, 176, 176, 2)).astype(np.float32)
    y = np.clip(x + RNG.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        want = ref.ms_ssim(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
            torch.from_numpy(y.transpose(0, 4, 1, 2, 3)),
            data_range=1.0,
        ).item()
        got = float(ops.ms_ssim(jnp.asarray(x), jnp.asarray(y), data_range=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_module_wrappers_match_functions():
    """SSIM / MS_SSIM configured-callable wrappers (reference modules,
    MS_SSIM.py:228-311) delegate to the functional forms."""
    from dsgan_tpu.ops.ssim import MS_SSIM, SSIM

    x = jnp.asarray(RNG.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    y = jnp.asarray(RNG.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    m = SSIM(data_range=1.0, nonnegative_ssim=True)
    np.testing.assert_allclose(
        float(m(x, y)),
        float(ops.ssim(x, y, data_range=1.0, nonnegative_ssim=True)),
    )
    mm = MS_SSIM(data_range=1.0)
    np.testing.assert_allclose(
        float(mm(x, y)), float(ops.ms_ssim(x, y, data_range=1.0))
    )
