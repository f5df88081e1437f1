"""Pallas kernel parity tests (interpreter mode on CPU) vs the XLA ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsgan_tpu import ops
from dsgan_tpu.pallas.dwconv import dwconv2d

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("k,c,h", [(7, 64, 32), (3, 32, 16), (9, 32, 32), (5, 8, 8)])
def test_dwconv_forward_parity(k, c, h):
    x = jnp.asarray(RNG.standard_normal((2, h, h, c)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((k, k, c)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((c,)).astype(np.float32))
    want = ops.conv2d(x, w.reshape(k, k, 1, c), b, stride=1, padding=k // 2, groups=c)
    got = dwconv2d(x, w, b, k, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_dwconv_grad_parity():
    k, c, h = 7, 16, 16
    x = jnp.asarray(RNG.standard_normal((2, h, h, c)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((k, k, c)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((c,)).astype(np.float32))
    tgt = jnp.asarray(RNG.standard_normal((2, h, h, c)).astype(np.float32))

    def loss_ref(x, w, b):
        y = ops.conv2d(x, w.reshape(k, k, 1, c), b, stride=1, padding=k // 2, groups=c)
        return jnp.mean(jnp.square(y - tgt))

    def loss_pal(x, w, b):
        return jnp.mean(jnp.square(dwconv2d(x, w, b, k, True) - tgt))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-3, atol=1e-4)


def test_dwconv_odd_height_tiles():
    # H not divisible by 64/32/16 exercises the tile-size picker
    k, c, h = 3, 8, 24
    x = jnp.asarray(RNG.standard_normal((1, h, h, c)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((k, k, c)).astype(np.float32))
    b = jnp.zeros((c,), jnp.float32)
    want = ops.conv2d(x, w.reshape(k, k, 1, c), b, stride=1, padding=k // 2, groups=c)
    got = dwconv2d(x, w, b, k, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c,p,hw", [(64, 64, 8), (128, 64, 4)])
def test_block_mlp_parity(c, p, hw):
    from dsgan_tpu.pallas.block_mlp import block_mlp, block_mlp_reference

    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    mean = jnp.mean(h, axis=(1, 2), keepdims=True)
    rsig = 1.0 / jnp.sqrt(jnp.var(h, axis=(1, 2), keepdims=True) + 1e-5)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)).astype(np.float32)) * 0.05
    b1 = jnp.asarray(rng.standard_normal((4 * c,)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((4 * c, p)).astype(np.float32)) * 0.05
    b2 = jnp.asarray(rng.standard_normal((p,)).astype(np.float32))
    ws = jnp.asarray(rng.standard_normal((c, p)).astype(np.float32)) * 0.05

    want = block_mlp_reference(h, x, mean, rsig, w1, b1, w2, b2, ws)
    got = block_mlp(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_block_mlp_hidden_chunking():
    from dsgan_tpu.pallas.block_mlp import block_mlp, block_mlp_reference

    rng = np.random.default_rng(12)
    c, p, hw = 64, 32, 4
    h = jnp.asarray(rng.standard_normal((1, hw, hw, c)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1, hw, hw, c)).astype(np.float32))
    mean = jnp.zeros((1, 1, 1, c)); rsig = jnp.ones((1, 1, 1, c))
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)).astype(np.float32)) * 0.05
    b1 = jnp.zeros((4 * c,)); b2 = jnp.zeros((p,))
    w2 = jnp.asarray(rng.standard_normal((4 * c, p)).astype(np.float32)) * 0.05
    ws = jnp.asarray(rng.standard_normal((c, p)).astype(np.float32)) * 0.05
    want = block_mlp_reference(h, x, mean, rsig, w1, b1, w2, b2, ws)
    got = block_mlp(h, x, mean, rsig, w1, b1, w2, b2, ws,
                    hidden_chunk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
