"""Conditional DDPM colorization model (the functional successor to the
reference's broken dissuion_model.py scratch)."""
import argparse

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dsgan_tpu.models.diffusion import (
    DenoiseUNet,
    DiffusionConfig,
    DiffusionState,
    make_ddim_sampler,
    make_diffusion_train_step,
    make_schedule,
)
from dsgan_tpu.models.pix2pix import make_adam


def test_schedule_matches_reference_formula():
    """bar_alpha/bar_beta reproduce dissuion_model.py:29-35 exactly."""
    T = 1000
    t = np.arange(1, T + 1)
    alpha = np.sqrt(1 - 0.02 * t / T)
    bar_alpha = np.cumprod(alpha)
    bar_beta = np.sqrt(1 - bar_alpha**2)
    ba, bb = make_schedule(T)
    np.testing.assert_allclose(np.asarray(ba), bar_alpha, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bb), bar_beta, rtol=1e-6)
    # unit-variance preservation: ba^2 + bb^2 == 1
    np.testing.assert_allclose(
        np.asarray(ba) ** 2 + np.asarray(bb) ** 2, 1.0, rtol=1e-6
    )


def _tiny():
    net = DenoiseUNet(out_nc=3, nf=8, dtype=None)
    h = w = 16
    xt = jnp.zeros((2, h, w, 3), jnp.float32)
    cond = jnp.zeros((2, h, w, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), xt, cond, jnp.zeros((2,), jnp.int32))["params"]
    return net, params, h, w


def test_denoiser_shapes():
    net, params, h, w = _tiny()
    xt = jnp.asarray(np.random.default_rng(0).normal(size=(2, h, w, 3)).astype(np.float32))
    cond = jnp.asarray(np.random.default_rng(1).normal(size=(2, h, w, 3)).astype(np.float32))
    y = net.apply({"params": params}, xt, cond, jnp.asarray([3, 500]))
    assert y.shape == (2, h, w, 3)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow
def test_train_step_learns_and_sampler_runs():
    net, params, h, w = _tiny()
    cfg = DiffusionConfig(timesteps=100)
    adam = make_adam(cfg.beta1)
    state = DiffusionState(
        params=params, opt=adam.init(params),
        rng=jax.random.PRNGKey(1), step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_diffusion_train_step(net, cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
    losses = []
    for _ in range(60):
        state, m = step(state, A, B, jnp.float32(2e-3))
        losses.append(float(m["loss_G"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        f"noise-prediction loss did not improve: {losses[:3]} -> {losses[-3:]}"
    )

    sample = jax.jit(make_ddim_sampler(net, cfg, sample_steps=5))
    img = sample(state.params, A, jax.random.PRNGKey(2))
    assert img.shape == (2, h, w, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_registry_dispatch_and_cli_options():
    from dsgan_tpu.models.registry import find_model_using_name, get_option_setter

    cls = find_model_using_name("diffusion")
    assert cls.__name__ == "DiffusionModel"
    parser = argparse.ArgumentParser()
    get_option_setter("diffusion")(parser, True)
    opts = parser.parse_args([])
    assert opts.timesteps == 1000 and opts.sample_steps == 20


def test_diffusion_cli_train_and_eval_metrics(tmp_path):
    """--model diffusion end to end: train CSVs carry sampled SSIM/PSNR
    (--metric_freq probe) and the test CLI writes per-image metrics.csv."""
    import csv
    import os

    from PIL import Image

    from dsgan_tpu.test import main as test_main
    from dsgan_tpu.train import main as train_main

    rng = np.random.default_rng(0)
    for phase in ("train_all", "test_all"):
        d = tmp_path / "data" / phase
        d.mkdir(parents=True)
        for pfx in "ab":
            for i in range(2):
                arr = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{pfx}_{i}.png")

    common = [
        "--model", "diffusion", "--diff_nf", "8", "--sample_steps", "3",
        "--timesteps", "20",
        "--loadSize_w", "16", "--loadSize_h", "16",
        "--fineSize_w", "16", "--fineSize_h", "16",
        "--batchSize", "1", "--dtype", "float32", "--nThreads", "1",
    ]
    out = str(tmp_path / "out")
    train_main(
        common + ["--niter", "1", "--niter_decay", "0", "--print_freq", "2",
                  "--metric_freq", "1", "--name", "diff"],
        dataset_path=str(tmp_path / "data"),
        out_path=out,
    )
    with open(os.path.join(out, "each_epoch.csv")) as f:
        rows = list(csv.reader(f))
    assert rows, "no each_epoch rows"
    # sampled-probe metrics populated (columns: epoch, phase, ssim, psnr)
    assert float(rows[-1][3]) != 0.0, f"psnr column empty: {rows[-1]}"

    results = str(tmp_path / "results")
    test_main(
        common + ["--name", "diff", "--which_epoch", "1",
                  "--results_dir", results, "--how_many", "2"],
        dataset_path=str(tmp_path / "data"),
        out_path=out,
    )
    import glob

    [mpath] = glob.glob(os.path.join(results, "diff", "**", "metrics.csv"),
                        recursive=True)
    with open(mpath) as f:
        rows = list(csv.reader(f))
    assert rows[-1][0] == "mean" and rows[-1][2] != ""
