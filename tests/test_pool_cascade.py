"""Cascaded max-pool pyramid (models/mixconvnext._pool_pyramid): the
downSkip family's pools share one pyramid — exact same values as the
direct per-scale pools (disjoint-window max composes), one
select_and_scatter per level in the backward instead of one per consumer."""
import numpy as np
import pytest


def test_pool_pyramid_matches_direct_pools():
    import jax.numpy as jnp

    from dsgan_tpu import ops
    from dsgan_tpu.models.mixconvnext import _pool_pyramid

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 32, 32, 4)).astype(np.float32))
    pyr = _pool_pyramid(x, 16)
    for s in (2, 4, 8, 16):
        np.testing.assert_array_equal(np.asarray(pyr[s]),
                                      np.asarray(ops.max_pool2d(x, s)))


def test_flagship_forward_and_grads_match_uncascaded(monkeypatch):
    import jax
    import jax.numpy as jnp

    from dsgan_tpu.models import define_G, init_params

    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = init_params(g, jax.random.PRNGKey(0), (1, 32, 32, 3),
                         "normal")["params"]

    def run():
        def loss(p, x):
            return jnp.sum(jnp.square(g.apply({"params": p}, x)))

        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        y = g.apply({"params": params}, x)
        return np.asarray(y), float(l), grads

    monkeypatch.setenv("DSGAN_POOL_CASCADE", "1")
    y_on, l_on, (gp_on, gx_on) = run()
    monkeypatch.setenv("DSGAN_POOL_CASCADE", "0")
    y_off, l_off, (gp_off, gx_off) = run()

    # forward is bit-exact (same max values through identical convs)
    np.testing.assert_array_equal(y_on, y_off)
    assert l_on == pytest.approx(l_off, rel=1e-6)
    np.testing.assert_allclose(np.asarray(gx_on), np.asarray(gx_off),
                               rtol=1e-3, atol=1e-5)
    # Param grads: a genuinely misrouted pool-argmax would shift dW/db
    # entries by O(cotangent*activation) ~ 1e-2..1 here. The tolerance
    # below is far under that but above the reassociation residue of
    # analytically-zero grads (bias-into-InstanceNorm null space leaves
    # only cancellation noise ~1e-4, reshuffled by summation order).
    flat_on = jax.tree_util.tree_leaves(gp_on)
    flat_off = jax.tree_util.tree_leaves(gp_off)
    assert len(flat_on) == len(flat_off)
    for a, b in zip(flat_on, flat_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)
