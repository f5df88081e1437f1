"""Resume semantics: --continue_train restores the exact trajectory
(params, Adam moments, pool, RNG, step counter, LR schedule position) —
the capability the reference breaks with its save/load filename mismatch
and unsaved optimizer state (reference base_model.py:95 vs 119, SURVEY §5)."""
import pytest
import jax
import numpy as np

from tests.test_train_step import batch, make_model


@pytest.mark.slow
def test_resume_reproduces_uninterrupted_run(tmp_path):
    rng = np.random.default_rng(0)
    batches = [batch(np.random.default_rng(i)) for i in range(6)]

    # uninterrupted: 6 steps
    m = make_model(tmp_path, name="resume_a")
    for b in batches:
        m.set_input(b)
        m.optimize_parameters()
    p_ref = [np.asarray(x) for x in jax.tree_util.tree_leaves(m.state.params_G)]

    # interrupted at step 3 + checkpoint + resume in a fresh model
    m1 = make_model(tmp_path, name="resume_b")
    for b in batches[:3]:
        m1.set_input(b)
        m1.optimize_parameters()
    m1.save_networks(1)

    m2 = make_model(tmp_path, name="resume_b", continue_train=True, which_epoch="1")
    m2.setup(m2.opt)
    assert int(m2.state.step) == 3
    for b in batches[3:]:
        m2.set_input(b)
        m2.optimize_parameters()

    p_resumed = [np.asarray(x) for x in jax.tree_util.tree_leaves(m2.state.params_G)]
    for a, b_ in zip(p_ref, p_resumed):
        np.testing.assert_array_equal(a, b_)


def test_lr_position_restored(tmp_path):
    m1 = make_model(tmp_path, name="lr_a")
    m1.set_input(batch(np.random.default_rng(0)))
    m1.optimize_parameters()
    for _ in range(12):  # into the decay region
        m1.update_learning_rate()
    lr_before = m1.lr
    m1.save_networks(12)

    m2 = make_model(tmp_path, name="lr_a", continue_train=True, which_epoch="12")
    m2.setup(m2.opt)
    assert abs(m2.lr - lr_before) < 1e-12


def test_async_save_then_restore_roundtrip(tmp_path):
    """Async orbax save is finalized before a subsequent restore reads it."""
    import jax.numpy as jnp
    from dsgan_tpu.utils import checkpoint as ckpt

    tree = {"a": jnp.arange(5, dtype=jnp.float32), "b": {"c": jnp.ones((2, 2))}}
    ckpt.save_state(str(tmp_path), 3, tree, async_save=True)
    got = ckpt.restore_state(str(tmp_path), 3, tree)
    np.testing.assert_allclose(np.asarray(got["a"]), np.arange(5, dtype=np.float32))
    assert ckpt.latest_epoch(str(tmp_path)) == 3


def test_keep_latest_retention(tmp_path):
    import jax.numpy as jnp
    from dsgan_tpu.utils import checkpoint as ckpt

    tree = {"x": jnp.zeros((2,))}
    for e in range(1, 6):
        ckpt.save_state(str(tmp_path), e, tree, async_save=True)
    ckpt.keep_latest(str(tmp_path), 2)
    import os
    left = sorted(d for d in os.listdir(tmp_path) if d.startswith("epoch_"))
    assert left == ["epoch_4", "epoch_5"]
    # the survivors are still restorable
    ckpt.restore_state(str(tmp_path), 5, tree)
    # k=0 is disabled by default but a legal "keep none" for the pre-save
    # prune path (save_networks prunes to k-1 BEFORE issuing the new save
    # so retention never blocks on the in-flight serialization)
    ckpt.keep_latest(str(tmp_path), 0)
    assert ckpt.latest_epoch(str(tmp_path)) == 5
    ckpt.keep_latest(str(tmp_path), 0, keep_none_ok=True)
    assert ckpt.latest_epoch(str(tmp_path)) is None


def test_restore_untyped_returns_host_numpy(tmp_path):
    """restore_untyped must restore leaves as HOST numpy with explicit
    RestoreArgs: a bare orbax restore(path) deserializes onto the default
    device WITHOUT a sharding, which works on CPU but fails on
    accelerator backends ('sharding passed to deserialization should be
    specified ... Got None' — hit evaluating a checkpoint on TPU)."""
    import jax.numpy as jnp
    import numpy as np
    from dsgan_tpu.utils import checkpoint as ckpt

    tree = {"params_G": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
            "step": jnp.int32(7)}
    ckpt.save_state(str(tmp_path), 1, tree, async_save=False)
    got = ckpt.restore_untyped(str(tmp_path), 1)
    import jax

    leaves = jax.tree_util.tree_leaves(got)
    assert all(isinstance(l, np.ndarray) for l in leaves)
    np.testing.assert_allclose(
        got["params_G"]["w"], np.arange(6, dtype=np.float32).reshape(2, 3))
    assert int(got["step"]) == 7
