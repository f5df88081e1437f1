"""Pallas kernel parity tests (interpreter mode on CPU) vs the XLA ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsgan_tpu import ops

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("c,p,hw", [(64, 64, 16), (128, 64, 16), (64, 128, 16)])
def test_block_core_fwd_and_grad_parity(c, p, hw):
    """Fused block-core kernel pair vs XLA reference, fwd + ALL cotangents
    (h, x, mean, rsig, and the five weight tensors), interpreter mode."""
    from dsgan_tpu.pallas.block_core import block_core, block_core_reference

    rng = np.random.default_rng(21)
    h4 = 4 * c
    h = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    mean = jnp.mean(h, axis=(1, 2))
    rsig = 1.0 / jnp.sqrt(jnp.var(h, axis=(1, 2)) + 1e-5)
    w1 = jnp.asarray(rng.standard_normal((c, h4)).astype(np.float32)) * 0.05
    b1 = jnp.asarray(rng.standard_normal((h4,)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((h4, p)).astype(np.float32)) * 0.05
    b2 = jnp.asarray(rng.standard_normal((p,)).astype(np.float32))
    ws = jnp.asarray(rng.standard_normal((c, p)).astype(np.float32)) * 0.05
    args = (h, x, mean, rsig, w1, b1, w2, b2, ws)

    want = block_core_reference(*args)
    got = block_core(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    tgt = jnp.asarray(rng.standard_normal(want.shape).astype(np.float32))
    gr = jax.grad(lambda a: jnp.mean(jnp.square(block_core_reference(*a) - tgt)))(args)
    gp = jax.grad(lambda a: jnp.mean(jnp.square(block_core(*a, True) - tgt)))(args)
    for name, a, b in zip("h x mean rsig w1 b1 w2 b2 ws".split(), gr, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"cotangent mismatch for {name}",
        )


def test_block_core_fits_rejects_ragged_hidden():
    """The kernels chunk the hidden over hc=min(h4,1024); a non-dividing
    hidden (e.g. dim=288 -> h4=1152) would silently drop the tail, so the
    gate must reject it (ADVICE r2)."""
    from dsgan_tpu.pallas.block_core import block_core_fits

    assert block_core_fits(256 * 256, 64, 256, 64)        # h4 <= 1024: ok
    assert block_core_fits(64 * 64, 256, 1024, 256)       # h4 == hc: ok
    assert not block_core_fits(64 * 64, 288, 1152, 288)   # 1152 % 1024 != 0


def test_block_core_in_full_grad_parity():
    """block_core_in (stats + folded InstanceNorm backward inside the op)
    vs plain autodiff of the reference chain instance_stats -> MLP."""
    from dsgan_tpu.pallas.block_core import block_core_in, block_core_reference

    rng = np.random.default_rng(31)
    c, p, hw = 64, 32, 16
    h4 = 4 * c
    h = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, h4)).astype(np.float32)) * 0.05
    b1 = jnp.asarray(rng.standard_normal((h4,)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((h4, p)).astype(np.float32)) * 0.05
    b2 = jnp.asarray(rng.standard_normal((p,)).astype(np.float32))
    ws = jnp.asarray(rng.standard_normal((c, p)).astype(np.float32)) * 0.05
    args = (h, x, w1, b1, w2, b2, ws)

    def ref(a):
        h, x, w1, b1, w2, b2, ws = a
        mean, rsig = ops.instance_stats(h)
        return block_core_reference(h, x, mean, rsig, w1, b1, w2, b2, ws)

    def pal(a):
        return block_core_in(*a, True)

    np.testing.assert_allclose(
        np.asarray(pal(args)), np.asarray(ref(args)), rtol=2e-4, atol=2e-4
    )
    tgt = jnp.asarray(rng.standard_normal((2, hw, hw, p)).astype(np.float32))
    gr = jax.grad(lambda a: jnp.mean(jnp.square(ref(a) - tgt)))(args)
    gp = jax.grad(lambda a: jnp.mean(jnp.square(pal(a) - tgt)))(args)
    for name, a, b in zip("h x w1 b1 w2 b2 ws".split(), gr, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"cotangent mismatch for {name}",
        )


@pytest.mark.parametrize("c1,c2,p", [(64, 64, 64), (32, 96, 64), (128, 128, 128)])
def test_block_core2_in_full_grad_parity(c1, c2, p):
    """Two-input fused block (skip-concat elimination) vs the one-input
    reference chain on the materialized concat: fwd + every cotangent."""
    from dsgan_tpu.pallas.block_core import block_core2_in, block_core_reference

    rng = np.random.default_rng(41)
    c = c1 + c2
    h4 = 4 * c
    hw = 16
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    ha, hb = mk(2, hw, hw, c1), mk(2, hw, hw, c2)
    xa, xb = mk(2, hw, hw, c1), mk(2, hw, hw, c2)
    w1 = mk(c, h4) * 0.05
    b1 = mk(h4)
    w2 = mk(h4, p) * 0.05
    b2 = mk(p)
    ws = mk(c, p) * 0.05
    args = (ha, hb, xa, xb, w1, b1, w2, b2, ws)

    def ref(a):
        ha, hb, xa, xb, w1, b1, w2, b2, ws = a
        h = jnp.concatenate([ha, hb], axis=-1)
        x = jnp.concatenate([xa, xb], axis=-1)
        mean, rsig = ops.instance_stats(h)
        return block_core_reference(h, x, mean, rsig, w1, b1, w2, b2, ws)

    def pal(a):
        return block_core2_in(*a, True)

    np.testing.assert_allclose(
        np.asarray(pal(args)), np.asarray(ref(args)), rtol=2e-4, atol=2e-4
    )
    tgt = mk(2, hw, hw, p)
    gr = jax.grad(lambda a: jnp.mean(jnp.square(ref(a) - tgt)))(args)
    gp = jax.grad(lambda a: jnp.mean(jnp.square(pal(a) - tgt)))(args)
    for name, a, b in zip("ha hb xa xb w1 b1 w2 b2 ws".split(), gr, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"cotangent mismatch for {name}",
        )


@pytest.mark.slow
def test_convnext_block_two_input_matches_concat(monkeypatch):
    """ConvNeXtBlock(x, x2) on the fused interpret path vs the same block
    applied to concat(x, x2) through the XLA fallback — identical params."""
    monkeypatch.setenv("DSGAN_PALLAS", "0")
    from dsgan_tpu.models.mixconvnext import ConvNeXtBlock
    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode("tanh")
    try:
        rng = np.random.default_rng(6)
        # parts must be >= 128 wide for the split gate (lane-width rule)
        xa = jnp.asarray(rng.standard_normal((2, 16, 16, 128)).astype(np.float32)).astype(jnp.bfloat16)
        xb = jnp.asarray(rng.standard_normal((2, 16, 16, 128)).astype(np.float32)).astype(jnp.bfloat16)
        blk = ConvNeXtBlock(128, dtype=jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), xa, xb)
        # same tree as the one-input block on the concat (checkpoint compat)
        params_cat = blk.init(jax.random.PRNGKey(0), jnp.concatenate([xa, xb], -1))
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_cat)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_cat)):
            assert a.shape == b.shape

        ref = blk.apply(params, jnp.concatenate([xa, xb], -1))
        monkeypatch.setenv("DSGAN_PALLAS_INTERPRET", "1")
        got = blk.apply(params, xa, xb)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

        def loss_two(fn_params):
            return jnp.mean(jnp.square(blk.apply(fn_params, xa, xb).astype(jnp.float32)))

        gp = jax.grad(loss_two)(params)
        monkeypatch.setenv("DSGAN_PALLAS_INTERPRET", "0")

        def loss_cat(fn_params):
            return jnp.mean(jnp.square(
                blk.apply(fn_params, jnp.concatenate([xa, xb], -1)).astype(jnp.float32)))

        gr = jax.grad(loss_cat)(params)
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(gr))
        for path, leaf in flat_p:
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32), np.asarray(flat_r[path], np.float32),
                rtol=5e-2, atol=5e-2, err_msg=str(path),
            )
    finally:
        set_gelu_mode("auto")


@pytest.mark.slow
def test_convnext_block_fused_path_parity(monkeypatch):
    """ConvNeXtBlock with the fused Pallas path (interpret, bf16) vs the
    XLA fallback: same params, same input, same output and grads."""
    monkeypatch.setenv("DSGAN_PALLAS", "0")
    from dsgan_tpu.models.mixconvnext import ConvNeXtBlock
    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode("tanh")
    try:
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
        xb = x.astype(jnp.bfloat16)
        blk = ConvNeXtBlock(64, dtype=jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), xb)

        ref = blk.apply(params, xb)
        monkeypatch.setenv("DSGAN_PALLAS_INTERPRET", "1")
        got = blk.apply(params, xb)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

        def loss(fn_params, xi):
            return jnp.mean(jnp.square(blk.apply(fn_params, xi).astype(jnp.float32)))

        gp = jax.grad(loss)(params, xb)
        monkeypatch.setenv("DSGAN_PALLAS_INTERPRET", "0")
        gr = jax.grad(loss)(params, xb)
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(gr))
        for path, leaf in flat_p:
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32), np.asarray(flat_r[path], np.float32),
                rtol=5e-2, atol=5e-2, err_msg=str(path),
            )
    finally:
        set_gelu_mode("auto")
