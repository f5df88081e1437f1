"""k-step dispatch chaining (--steps_per_dispatch): a lax.scan of the
fused step over k stacked batches must reproduce k sequential steps.

Chaining exists to amortize the per-dispatch completion-event latency of
relay-attached accelerators (docs/PERF.md "End-to-end CLI gap"); it must
never change the training math. The reference has no counterpart — its
hot loop is fully synchronous (DSGAN/train.py:96-143).

Two equivalence layers, tested separately:

1. BIT-IDENTITY within the scan program: scanning k batches in one call
   equals calling the k=1 scan k times, exactly (atol=0). This pins the
   chaining logic itself — batch stacking, carry threading, RNG/pool/
   step-counter sequencing, metric stacking.
2. Cross-program (scan body vs the standalone jitted step): XLA compiles
   the two programs with different fusion choices, so gradients differ
   by float32 rounding. Losses/moments/pool agree to ~1e-6, but Adam's
   bias-corrected first moments make each update ≈ lr*sign(g), so a
   near-zero gradient that rounds to a different sign moves the param by
   2*lr. Per-element divergence after k steps is therefore bounded by
   ~k*2*lr (k=4, lr=2e-4 -> 1.6e-3); we assert with that bound, and
   assert the *pre-Adam* quantities (losses, moments, pool, visuals) at
   tight tolerance. Measured on jax 0.9.0 CPU: metrics <=1.2e-7,
   opt moments 3.3e-7, pool 2.6e-6, params 1.0e-3.
"""
import jax
import numpy as np
import pytest

from tests.test_train_step import batch, make_model

LR = 2e-4  # small_opt's lr — the cross-program Adam bound scales with it


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _assert_tree_close(a, b, atol=0.0):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(x, y, rtol=0, atol=atol)


def test_chained_bit_identical_to_k1_scan():
    """Layer 1: one k=4 scan == four k=1 scans, bit-for-bit. Same scan
    program family -> identical compiled body -> any mismatch is a real
    threading bug (stacking order, carry, RNG splits, pool indexing)."""
    k = 4
    batches = [batch(np.random.default_rng(i)) for i in range(k)]
    import tempfile, pathlib

    tmp = pathlib.Path(tempfile.mkdtemp())

    m1 = make_model(tmp, name="k1x4")
    for b in batches:
        m1.set_input_chunk([b])
        m1.optimize_parameters_chunk()

    m2 = make_model(tmp, name="k4")
    m2.set_input_chunk(batches)
    m2.optimize_parameters_chunk()

    _assert_tree_close(m1.state.params_G, m2.state.params_G, atol=0.0)
    _assert_tree_close(m1.state.params_D, m2.state.params_D, atol=0.0)
    _assert_tree_close(m1.state.opt_G, m2.state.opt_G, atol=0.0)
    _assert_tree_close(m1.state.pool_images, m2.state.pool_images, atol=0.0)
    np.testing.assert_array_equal(
        np.asarray(m1.state.rng), np.asarray(m2.state.rng)
    )
    assert int(m1.state.step) == int(m2.state.step) == k
    np.testing.assert_array_equal(np.asarray(m1.fake_B), np.asarray(m2.fake_B))
    # the k=4 metrics sequence, step by step, equals the four k=1 runs'
    assert all(np.asarray(v).shape[0] == k for v in m2._metrics_seq.values())


def test_chained_equals_sequential_pix2pix(tmp_path):
    """Layer 2: chained vs the standalone single-step program. Pre-Adam
    quantities tight; params at the documented k*2*lr Adam bound."""
    k = 4
    batches = [batch(np.random.default_rng(i)) for i in range(k)]

    m_seq = make_model(tmp_path, name="seq")
    for b in batches:
        m_seq.set_input(b)
        m_seq.optimize_parameters()
    seq_metrics = {kk: float(np.asarray(v)) for kk, v in m_seq._metrics.items()}

    m_chn = make_model(tmp_path, name="chn")
    m_chn.set_input_chunk(batches)
    m_chn.optimize_parameters_chunk()

    adam_bound = 2 * k * 2 * LR  # 2x margin over the k*2*lr sign bound
    _assert_tree_close(m_seq.state.params_G, m_chn.state.params_G, atol=adam_bound)
    _assert_tree_close(m_seq.state.params_D, m_chn.state.params_D, atol=adam_bound)
    # moments accumulate (1-beta)-damped gradients — rounding only
    _assert_tree_close(m_seq.state.opt_G, m_chn.state.opt_G, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(m_seq.state.rng), np.asarray(m_chn.state.rng)
    )
    assert int(m_chn.state.step) == k
    np.testing.assert_array_equal(
        np.asarray(m_seq.state.pool_count), np.asarray(m_chn.state.pool_count)
    )
    _assert_tree_close(m_seq.state.pool_images, m_chn.state.pool_images, atol=1e-4)

    # stacked metrics: one entry per sub-step; last matches the sequential
    # run's final step (pre-Adam -> tight)
    ms = m_chn._metrics_seq
    assert all(np.asarray(v).shape[0] == k for v in ms.values())
    for kk, v in seq_metrics.items():
        np.testing.assert_allclose(
            float(np.asarray(ms[kk][-1])), v, rtol=1e-4, atol=1e-5
        )
    # _metrics mirrors the last sub-step (what the CLI prints)
    np.testing.assert_allclose(
        float(np.asarray(m_chn._metrics["loss_G"])),
        float(np.asarray(ms["loss_G"][-1])), rtol=0, atol=0,
    )

    # the carried visual is the LAST sub-step's fake_B
    np.testing.assert_allclose(
        np.asarray(m_seq.fake_B), np.asarray(m_chn.fake_B), rtol=0, atol=1e-4
    )


@pytest.mark.slow
def test_chained_equals_sequential_cyclegan(tmp_path):
    from dsgan_tpu.models.cycle_gan import CycleGANModel
    from tests.test_cyclegan import cyc_opt

    rng = np.random.default_rng(0)
    batches = [
        {
            "A": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32),
            "B": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32),
        }
        for _ in range(3)
    ]

    m_seq = CycleGANModel()
    m_seq.initialize(cyc_opt(tmp_path, name="cseq"))
    for b in batches:
        m_seq.set_input(b)
        m_seq.optimize_parameters()

    m_chn = CycleGANModel()
    m_chn.initialize(cyc_opt(tmp_path, name="cchn"))
    m_chn.set_input_chunk(batches)
    m_chn.optimize_parameters_chunk()

    adam_bound = 2 * 3 * 2 * LR  # same k*2*lr cross-program Adam bound
    _assert_tree_close(m_seq.state.params_G_A, m_chn.state.params_G_A, atol=adam_bound)
    _assert_tree_close(m_seq.state.params_D_B, m_chn.state.params_D_B, atol=adam_bound)
    assert int(m_chn.state.step) == 3
    # dict-valued batch outs (visuals) ride the generic carry; forwards
    # through O(k*2*lr)-diverged params
    np.testing.assert_allclose(
        np.asarray(m_seq.rec_A), np.asarray(m_chn.rec_A), rtol=0, atol=2e-2
    )


@pytest.mark.slow
def test_cli_chained_matches_unchained_trajectory(tmp_path):
    """--steps_per_dispatch 2 through the REAL train CLI lands on the
    same epoch-1 checkpoint as the default path (within the cross-program
    Adam bound), including an epoch tail shorter than the chunk (3
    batches per epoch, k=2 -> one chained chunk + one single-step tail
    per epoch)."""
    from PIL import Image

    from dsgan_tpu.train import main as train_main
    from dsgan_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(0)
    d = tmp_path / "data" / "train_all"
    d.mkdir(parents=True)
    for pfx in "ab":  # half-split pairing
        for i in range(6):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{pfx}_{i}.png")

    common = [
        "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--batchSize", "2", "--w_vgg", "0", "--pool_size", "4",
        "--dtype", "float32", "--nThreads", "1", "--serial_batches",
        "--no_flip", "--seed", "7", "--data_axis", "1", "--spatial_axis", "1",
        "--niter", "1", "--niter_decay", "0", "--print_freq", "100",
    ]
    outs = {}
    for tag, extra in (("plain", []), ("chained", ["--steps_per_dispatch", "2"])):
        out = str(tmp_path / f"out_{tag}")
        train_main(
            common + extra + ["--name", tag],
            dataset_path=str(tmp_path / "data"),
            out_path=out,
        )
        outs[tag] = ckpt.restore_untyped(
            str(tmp_path / f"out_{tag}" / "checkpoints" / tag), 1
        )["state"]

    assert int(np.asarray(outs["chained"]["step"])) == 3
    adam_bound = 2 * 3 * 2 * LR
    for key in ("params_G", "params_D"):
        la = jax.tree_util.tree_leaves(outs["plain"][key])
        lb = jax.tree_util.tree_leaves(outs["chained"][key])
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=adam_bound
            )


def test_chained_on_mesh_matches_single_device(tmp_path):
    """Chaining composes with the device mesh: the chunk shards
    (k unsharded, N over data, H over spatial) and the result matches the
    single-device chained run."""
    k = 2
    batches = [batch(np.random.default_rng(i)) for i in range(k)]

    m1 = make_model(tmp_path, name="mesh_ref")
    m1.set_input_chunk(batches)
    m1.optimize_parameters_chunk()

    m2 = make_model(tmp_path, name="mesh_chn", data_axis=2, spatial_axis=2)
    assert m2.mesh is not None
    m2.set_input_chunk(batches)
    m2.optimize_parameters_chunk()

    for a, b in zip(_leaves(m1.state.params_G), _leaves(m2.state.params_G)):
        # Adam + f32 cross-device reduction-order bound (same as
        # test_parallel's step-level tests)
        np.testing.assert_allclose(a, b, rtol=0, atol=4e-3)
