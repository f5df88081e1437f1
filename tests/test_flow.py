"""Optical flow (ops/flow.py): LK recovery of known motion, warp
correctness, and the motion-compensated temporal-consistency metric."""

import numpy as np
import pytest

from dsgan_tpu.ops import flow as F


def _smooth_image(rng, h, w, c=None):
    """Random image with enough low-frequency structure for LK."""
    shape = (h, w) if c is None else (h, w, c)
    x = rng.standard_normal(shape).astype(np.float32)
    # heavy box smoothing: cumulative sums in both axes
    for axis in (0, 1):
        k = 7
        pad = [(0, 0)] * x.ndim
        pad[axis] = (k // 2, k // 2)
        xp = np.pad(x, pad, mode="edge")
        cs = np.cumsum(xp, axis=axis)
        x = (np.take(cs, range(k - 1, k - 1 + x.shape[axis]), axis=axis)
             - np.concatenate([np.zeros_like(np.take(cs, [0], axis=axis)),
                               np.take(cs, range(0, x.shape[axis] - 1), axis=axis)],
                              axis=axis)) / k
    return x


def test_warp_bilinear_integer_shift():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((24, 24)).astype(np.float32)
    du, dv = 3.0, -2.0
    flow = np.zeros((24, 24, 2), np.float32)
    flow[..., 0] = du
    flow[..., 1] = dv
    out = np.asarray(F.warp_bilinear(img, flow))
    # out[i, j] = img[i + dv, j + du] where in bounds
    np.testing.assert_allclose(out[4:20, 4:20], img[2:18, 7:23], atol=1e-5)


def test_lk_recovers_constant_shift():
    rng = np.random.default_rng(1)
    h = w = 96
    prev = _smooth_image(rng, h, w)
    du, dv = 3, 2
    # cur[i, j] = prev[i + dv, j + du]  ->  flow pulling prev onto cur
    cur = np.roll(prev, (-dv, -du), axis=(0, 1))
    fl = np.asarray(F.estimate_flow(prev, cur))
    interior = fl[16:-16, 16:-16]
    assert abs(np.median(interior[..., 0]) - du) < 0.5
    assert abs(np.median(interior[..., 1]) - dv) < 0.5


def test_flow_warped_error_separates_flicker_from_motion():
    rng = np.random.default_rng(2)
    h = w = 96
    x_prev = _smooth_image(rng, h, w, 3)
    dv, du = 2, 3
    x_cur = np.roll(x_prev, (-dv, -du), axis=(0, 1))
    # a CONSISTENT colorizer: outputs move exactly with the inputs
    y_prev = np.tanh(x_prev * 1.7 + 0.1)
    y_cur = np.roll(y_prev, (-dv, -du), axis=(0, 1))

    fl = F.estimate_flow(x_prev, x_cur)
    err_consistent, err_in = map(float, F.flow_warped_error(y_prev, y_cur, x_prev, x_cur, fl))

    # the naive frame difference is large (everything moved)...
    naive = float(np.mean(np.abs(y_cur - y_prev)))
    # ...but the motion-compensated error is close to the input-warp floor
    assert err_consistent < 0.35 * naive
    assert err_consistent < 4.0 * max(err_in, 1e-4)

    # a FLICKERING colorizer on the same motion scores much worse
    y_cur_flicker = y_cur + rng.standard_normal(y_cur.shape).astype(np.float32) * 0.5
    err_flicker, _ = map(float, F.flow_warped_error(
        y_prev, y_cur_flicker, x_prev, x_cur, fl))
    assert err_flicker > 3.0 * err_consistent


def test_estimate_flow_accepts_channel_inputs():
    rng = np.random.default_rng(3)
    a = _smooth_image(rng, 48, 48, 3)
    fl = np.asarray(F.estimate_flow(a, a))
    assert fl.shape == (48, 48, 2)
    assert np.all(np.abs(fl) < 0.5)
