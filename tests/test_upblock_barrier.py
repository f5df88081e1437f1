"""UpBlock concat-materialization barrier (DSGAN_UPBLOCK_BARRIER,
models/mixconvnext.UpBlock): an optimization_barrier on the concat output
stops XLA fusing the pad+maximum concat producer into the MidMLKA bank
depthwise-conv thunks (fwd AND dW), which the round-5 thunk audit
measured at ~20 GB/s / ~1 TF/s in-step (docs/PERF.md "Per-thunk in-step
audit"). A barrier must be VALUE-IDENTICAL — forward, loss, and both
gradients bit-match (up to f32 reassociation) with the toggle off."""
import numpy as np
import pytest


def test_flagship_forward_and_grads_match_unbarriered(monkeypatch):
    import jax
    import jax.numpy as jnp

    from dsgan_tpu.models import define_G, init_params

    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(7)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = init_params(g, jax.random.PRNGKey(0), (1, 32, 32, 3),
                         "normal")["params"]

    def run():
        def loss(p, x):
            return jnp.sum(jnp.square(g.apply({"params": p}, x)))

        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        y = g.apply({"params": params}, x)
        return np.asarray(y), float(l), grads

    monkeypatch.setenv("DSGAN_UPBLOCK_BARRIER", "1")
    y_on, l_on, (gp_on, gx_on) = run()
    monkeypatch.setenv("DSGAN_UPBLOCK_BARRIER", "0")
    y_off, l_off, (gp_off, gx_off) = run()

    # a barrier changes scheduling only — values are identical up to
    # XLA re-fusion reassociation of f32 sums
    np.testing.assert_allclose(y_on, y_off, rtol=1e-5, atol=1e-5)
    assert l_on == pytest.approx(l_off, rel=1e-5)
    np.testing.assert_allclose(np.asarray(gx_on), np.asarray(gx_off),
                               rtol=1e-3, atol=1e-5)
    flat_on = jax.tree_util.tree_leaves(gp_on)
    flat_off = jax.tree_util.tree_leaves(gp_off)
    assert len(flat_on) == len(flat_off)
    for a, b in zip(flat_on, flat_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)
