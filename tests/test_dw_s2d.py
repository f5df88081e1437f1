"""ops.dw_conv_s2d: space-to-depth dense lowering of narrow-channel
depthwise convs — exact forward and gradient parity vs the grouped conv
at the production (k, f, C) configurations and odd rectangle shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsgan_tpu import ops

CASES = [
    # (h, w, c, k, f) — includes the two production shapes:
    (16, 16, 32, 9, 2),   # MidMLKA mid32 bank
    (32, 32, 3, 7, 4),    # MixConvNeXtML c1 block dwconv
    (16, 24, 8, 7, 4),
    (12, 20, 8, 9, 2),
    (16, 16, 4, 9, 4),
]


@pytest.mark.parametrize("h,w,c,k,f", CASES)
def test_dw_conv_s2d_matches_grouped(h, w, c, k, f):
    rng = np.random.default_rng(h * 100 + c + k + f)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((k, k, 1, c)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = ops.conv2d(x, kk, b, stride=1, padding=k // 2, groups=c)
    got = ops.dw_conv_s2d(x, kk[:, :, 0, :], b, k, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


DENSE_CASES = [
    # (h, w, ci, co, k, f) — incl. the production lanefix shapes
    (16, 16, 64, 3, 3, 2),   # flagship res conv
    (16, 16, 3, 64, 3, 2),   # VGG conv0
    (12, 20, 5, 7, 5, 2),
    (16, 16, 3, 8, 7, 4),
]


@pytest.mark.parametrize("h,w,ci,co,k,f", DENSE_CASES)
def test_conv2d_s2d_matches_plain(h, w, ci, co, k, f):
    rng = np.random.default_rng(h + ci * 10 + co + k + f)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    ref = ops.conv2d(x, kk, b, stride=1, padding=k // 2)
    got = ops.conv2d_s2d(x, kk, b, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_conv2d_lanefix_forward_and_grads_match_plain():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 3, 64, 3)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((3,)), jnp.float32)

    def l_ref(xi, ki, bi):
        return jnp.sum(jnp.tanh(ops.conv2d(xi, ki, bi, stride=1, padding=1)))

    def l_fix(xi, ki, bi):
        return jnp.sum(jnp.tanh(ops.conv2d_lanefix(xi, ki, bi)))

    np.testing.assert_allclose(
        float(l_fix(x, kk, b)), float(l_ref(x, kk, b)), rtol=1e-6)
    g1 = jax.grad(l_ref, argnums=(0, 1, 2))(x, kk, b)
    g2 = jax.grad(l_fix, argnums=(0, 1, 2))(x, kk, b)
    for a, g in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_conv2d_lanefix_odd_shape_falls_back():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 15, 17, 8)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 3, 8, 3)) * 0.1, jnp.float32)
    b = jnp.zeros((3,), jnp.float32)
    g = jax.grad(lambda xi: jnp.sum(jnp.square(ops.conv2d_lanefix(xi, kk, b))))(x)
    g_ref = jax.grad(lambda xi: jnp.sum(jnp.square(
        ops.conv2d(xi, kk, b, stride=1, padding=1))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_dw_conv_s2d_gradients_match_grouped():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((7, 7, 1, 3)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((3,)), jnp.float32)

    def loss_ref(xi, ki, bi):
        return jnp.sum(jnp.tanh(ops.conv2d(xi, ki, bi, stride=1, padding=3, groups=3)))

    def loss_s2d(xi, ki, bi):
        return jnp.sum(jnp.tanh(ops.dw_conv_s2d(xi, ki[:, :, 0, :], bi, 7, 4)))

    g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kk, b)
    g2 = jax.grad(loss_s2d, argnums=(0, 1, 2))(x, kk, b)
    for a, g in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(g).reshape(np.asarray(a).shape), np.asarray(a),
            rtol=1e-4, atol=1e-4,
        )


def test_conv2d_lanefix_bf16_production_dtype():
    """The production path runs bf16 — pin fwd + dx against the plain
    bf16 lowering (identical sums; only rounding differs, so tolerances
    are bf16-resolution)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((3, 3, 64, 3)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((3,)), jnp.bfloat16)

    y_fix = ops.conv2d_lanefix(x, kk, b)
    y_ref = ops.conv2d(x, kk, b, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(y_fix, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.02, atol=0.05)

    def loss(fn, xi):
        return jnp.sum(jnp.square(fn(xi).astype(jnp.float32))) / 2

    g_fix = jax.grad(lambda xi: loss(lambda v: ops.conv2d_lanefix(v, kk, b), xi))(x)
    g_ref = jax.grad(lambda xi: loss(
        lambda v: ops.conv2d(v, kk, b, stride=1, padding=1), xi))(x)
    np.testing.assert_allclose(np.asarray(g_fix, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=0.05, atol=0.25)
