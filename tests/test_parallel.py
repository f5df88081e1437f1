"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
data-parallel equivalence and the driver's dryrun_multichip hook."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsgan_tpu.models import define_D, define_G, init_params
from dsgan_tpu.models.pix2pix import (
    Pix2PixConfig,
    Pix2PixState,
    make_adam,
    make_train_step,
)
from dsgan_tpu.parallel import get_mesh, make_parallel_step, replicate, shard_batch
from dsgan_tpu.utils.image_pool import init_pool


def _tiny_setup(h=32, w=32, pool=0):
    g = define_G(3, 3, 8, "resnet_6blocks", dtype=None)
    d = define_D(6, 8, "basic", dtype=None)
    kg, kd, ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params_G = init_params(g, kg, (1, h, w, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, h, w, 6), "normal")["params"]
    cfg = Pix2PixConfig(pool_size=pool, use_vgg=False)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(max(pool, 0), (h, w, 6), jnp.float32)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    return g, d, cfg, state


def test_mesh_shapes():
    m = get_mesh(4, 2)
    assert m.devices.shape == (4, 2)
    m = get_mesh(0, 2)
    assert m.devices.shape == (4, 2)  # 8 cpu devices / spatial 2


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """The DP-sharded step must produce the same params as single-device
    (same batch, replicated state) — psum-of-grads == full-batch grads."""
    h = w = 32
    g, d, cfg, state = _tiny_setup(h, w, pool=0)
    rng = np.random.default_rng(0)
    real_A = rng.uniform(-1, 1, (8, h, w, 3)).astype(np.float32)
    real_B = rng.uniform(-1, 1, (8, h, w, 3)).astype(np.float32)
    lr = jnp.float32(1e-3)

    step_fn = make_train_step(g, d, None, None, cfg)
    sstep = jax.jit(step_fn)
    mesh = get_mesh(8, 1)
    pstep = make_parallel_step(step_fn, mesh, donate_state=False)

    # two chained steps each way: a sharding bug would compound into the
    # second step's losses
    s1, m1a, _ = sstep(state, jnp.asarray(real_A), jnp.asarray(real_B), lr)
    s1, m1b, _ = sstep(s1, jnp.asarray(real_A), jnp.asarray(real_B), lr)

    s8 = replicate(state, mesh)
    ra, rb = shard_batch(real_A, mesh), shard_batch(real_B, mesh)
    s8, m8a, _ = pstep(s8, ra, rb, lr)
    s8, m8b, _ = pstep(s8, ra, rb, lr)

    for k in ("loss_G", "loss_D", "loss_G_L1"):
        np.testing.assert_allclose(float(m1a[k]), float(m8a[k]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(m1b[k]), float(m8b[k]), rtol=1e-4, atol=1e-5)
    # Adam normalizes each step to ~lr * sign(grad), so float32
    # reduction-order noise on near-zero grads can flip individual
    # elements by O(lr) per step; bound drift by ~4*lr as a sanity backstop
    # (the loss assertions above are the real equivalence check).
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_G),
                    jax.tree_util.tree_leaves(s8.params_G)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=4e-3)


@pytest.mark.slow
def test_spatial_sharding_compiles_and_runs():
    """H-sharded convs (XLA halo exchange) over a (2,2) mesh."""
    h = w = 32
    g, d, cfg, state = _tiny_setup(h, w, pool=2)
    mesh = get_mesh(2, 2)
    step_fn = make_train_step(g, d, None, None, cfg)
    pstep = make_parallel_step(step_fn, mesh, donate_state=False)
    rng = np.random.default_rng(1)
    real_A = shard_batch(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32), mesh)
    real_B = shard_batch(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32), mesh)
    s, m, _ = pstep(replicate(state, mesh), real_A, real_B, jnp.float32(1e-3))
    assert np.isfinite(float(m["loss_G"]))
    assert np.isfinite(float(m["loss_D"]))


@pytest.mark.slow
def test_spatial_sharded_train_matches_single_device():
    """The spatially-sharded TRAIN step must match single-device numerics
    (same batch), exactly as the DP axis is held to: losses across two
    chained steps and post-step params agree. The spatial axis shards H
    through every conv's halo exchange AND through both loss reductions."""
    h = w = 32
    g, d, cfg, state = _tiny_setup(h, w, pool=0)
    rng = np.random.default_rng(3)
    real_A = rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32)
    real_B = rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32)
    lr = jnp.float32(1e-3)

    step_fn = make_train_step(g, d, None, None, cfg)
    sstep = jax.jit(step_fn)
    s1, m1a, _ = sstep(state, jnp.asarray(real_A), jnp.asarray(real_B), lr)
    s1, m1b, _ = sstep(s1, jnp.asarray(real_A), jnp.asarray(real_B), lr)

    mesh = get_mesh(2, 4)  # batch 2 over data axis, H over 4-way spatial
    pstep = make_parallel_step(step_fn, mesh, donate_state=False)
    sp = replicate(state, mesh)
    ra, rb = shard_batch(real_A, mesh), shard_batch(real_B, mesh)
    sp, mpa, _ = pstep(sp, ra, rb, lr)
    sp, mpb, _ = pstep(sp, ra, rb, lr)

    for k in ("loss_G", "loss_D", "loss_G_L1", "loss_ssim", "loss_tv"):
        np.testing.assert_allclose(float(m1a[k]), float(mpa[k]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(m1b[k]), float(mpb[k]), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_G),
                    jax.tree_util.tree_leaves(sp.params_G)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=4e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params_D),
                    jax.tree_util.tree_leaves(sp.params_D)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=4e-3)


@pytest.mark.slow
def test_cli_mesh_matches_single_device_trajectory(tmp_path):
    """--data_axis/--spatial_axis through the REAL train CLI: a 2x2-mesh
    run and a forced single-device run over the same deterministic data
    order (--serial_batches, fixed --seed) must land on the same epoch-1
    checkpoint. This is the product-path counterpart of the step-level
    equivalence tests above — it covers resolve_mesh, _place_state/_place_batch,
    make_parallel_step AND sharded-state checkpointing end to end."""
    from PIL import Image

    from dsgan_tpu.train import main as train_main
    from dsgan_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(0)
    d = tmp_path / "data" / "train_all"
    d.mkdir(parents=True)
    for pfx in "ab":  # half-split pairing: a_* = domain A, b_* = B
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{pfx}_{i}.png")

    common = [
        "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--batchSize", "2", "--w_vgg", "0", "--pool_size", "0",
        "--dtype", "float32", "--nThreads", "1", "--serial_batches",
        "--no_flip", "--seed", "7",
        "--niter", "1", "--niter_decay", "0", "--print_freq", "100",
    ]
    outs = {}
    for tag, axes in (
        ("single", ["--data_axis", "1", "--spatial_axis", "1"]),
        ("mesh", ["--data_axis", "2", "--spatial_axis", "2"]),
    ):
        out = str(tmp_path / f"out_{tag}")
        train_main(
            common + axes + ["--name", tag],
            dataset_path=str(tmp_path / "data"),
            out_path=out,
        )
        tree = ckpt.restore_untyped(
            str(tmp_path / f"out_{tag}" / "checkpoints" / tag), 1
        )
        outs[tag] = tree["state"]

    for key in ("params_G", "params_D"):
        la = jax.tree_util.tree_leaves(outs["single"][key])
        lb = jax.tree_util.tree_leaves(outs["mesh"][key])
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            # Adam + f32 reduction-order noise bound (see the step-level
            # tests above): per-element drift is O(lr) per step, 2 steps.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=4e-3
            )


@pytest.mark.slow
def test_dryrun_multichip_hook():
    """Run the driver's multichip dryrun hook the way the driver does —
    in a FRESH process (the driver never invokes it inside a long-lived
    interpreter, so the subprocess is the faithful contract).

    History of the in-process SIGABRT (rounds 3-4): dryrun_multichip(8)
    used to abort in XLA:CPU when invoked late in the full ~190-test
    suite while passing standalone. Round 5 root-caused it with
    tools/dryrun_abort_bisect.py (fresh-subprocess prefix bisect over the
    fast lane): at jax/jaxlib 0.9.0 the abort is NO LONGER REPRODUCIBLE —
    the full fast lane (35 files) run in-process followed by
    dryrun_multichip(8) in the same interpreter completes DRYRUN_OK
    (1292 s, rc=0; /tmp/dryrun_bisect.jsonl record, 2026-08-21). The
    trigger was a since-fixed jaxlib defect, not suite state this repo
    controls. The subprocess isolation here stays as defense-in-depth and
    because it IS the driver's invocation shape."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import sys; sys.path.insert(0, '/root/repo');"
         "import __graft_entry__ as ge; ge.dryrun_multichip(8);"
         "print('DRYRUN_OK')"],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.slow
def test_spatial_sharded_inference_mixconvnext():
    """512^2-class inference pattern at test scale: MixConvNeXtML forward
    with batch+height sharding over a (2,4) mesh."""
    from dsgan_tpu.parallel import make_parallel_infer

    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=None)
    params = init_params(g, jax.random.PRNGKey(0), (1, 64, 64, 3), "normal")["params"]
    mesh = get_mesh(2, 4)
    infer = make_parallel_infer(lambda p, x: g.apply({"params": p}, x), mesh)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y_ref = g.apply({"params": params}, jnp.asarray(x))
    y = infer(replicate(params, mesh), shard_batch(x, mesh))
    assert y.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-3, atol=2e-4)
