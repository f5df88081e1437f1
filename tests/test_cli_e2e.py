"""End-to-end CLI smoke tests: train for one tiny epoch, then evaluate —
the full minimum slice (options -> data -> fused step -> checkpoint ->
eval harness) through the real entry points."""
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def tiny_dataset(tmp_path):
    rng = np.random.default_rng(0)
    for phase in ("train_all", "test_all"):
        d = tmp_path / "data" / phase
        d.mkdir(parents=True)
        # half-split pairing: files a_* sort before b_* -> first half = A
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"a_{i}.png")
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"b_{i}.png")
    return str(tmp_path / "data")


COMMON = [
    "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
    "--loadSize_w", "32", "--loadSize_h", "32",
    "--fineSize_w", "32", "--fineSize_h", "32",
    "--batchSize", "2", "--w_vgg", "0",
    "--dtype", "float32", "--nThreads", "2",
]

TRAIN_ONLY = ["--pool_size", "4"]


@pytest.mark.slow
def test_train_cli_end_to_end(tiny_dataset, tmp_path):
    from dsgan_tpu.train import main

    out = str(tmp_path / "out")
    main(
        COMMON + TRAIN_ONLY + ["--niter", "1", "--niter_decay", "0", "--print_freq", "2",
                  "--name", "e2e"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    ckpt_dir = os.path.join(out, "checkpoints", "e2e")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))
    assert os.path.isfile(os.path.join(out, "result.csv"))
    assert os.path.isfile(os.path.join(out, "each_epoch.csv"))
    imgs = os.listdir(os.path.join(out, "train_img"))
    assert imgs, "no triptych dumps written"
    assert os.path.isfile(os.path.join(ckpt_dir, "opt.txt"))


def test_test_cli_after_training(tiny_dataset, tmp_path):
    from dsgan_tpu.test import main as test_main
    from dsgan_tpu.train import main as train_main

    out = str(tmp_path / "out")
    train_main(
        COMMON + TRAIN_ONLY + ["--niter", "1", "--niter_decay", "0", "--print_freq", "100",
                  "--name", "e2e"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    results = str(tmp_path / "results")
    test_main(
        COMMON + ["--name", "e2e", "--which_epoch", "1",
                  "--results_dir", results, "--how_many", "3"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    web_dir = os.path.join(results, "e2e", "test_all/_1")
    assert os.path.isfile(os.path.join(web_dir, "index.html"))
    assert os.path.isfile(os.path.join(web_dir, "metrics.csv"))
    with open(os.path.join(web_dir, "metrics.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[-1].startswith("mean")


@pytest.mark.slow
def test_cyclegan_cli_end_to_end(tmp_path):
    """CycleGAN through the real CLI: unaligned phaseA/phaseB dirs."""
    import numpy as np
    from PIL import Image

    from dsgan_tpu.train import main

    rng = np.random.default_rng(0)
    for side in ("A", "B"):
        d = tmp_path / "data" / ("train_all" + side)
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"x_{i}.png")

    out = str(tmp_path / "out")
    main(
        ["--model", "cycle_gan", "--dataset_mode", "unaligned",
         "--phase", "train_all",
         "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
         "--loadSize_w", "32", "--loadSize_h", "32",
         "--fineSize_w", "32", "--fineSize_h", "32",
         "--batchSize", "2", "--pool_size", "2", "--dtype", "float32",
         "--niter", "1", "--niter_decay", "0", "--print_freq", "2",
         "--nThreads", "1", "--name", "cyc_e2e"],
        dataset_path=str(tmp_path / "data"),
        out_path=out,
    )
    import os

    assert os.path.isdir(os.path.join(out, "checkpoints", "cyc_e2e", "epoch_1"))


def test_testmodel_single_dataset_cli(tiny_dataset, tmp_path):
    """--model test: inference-only TestModel over a single-image dataset
    (reference test_model.py semantics)."""
    import os

    from dsgan_tpu.test import main as test_main
    from dsgan_tpu.train import main as train_main

    out = str(tmp_path / "out")
    train_main(
        COMMON + TRAIN_ONLY + ["--niter", "1", "--niter_decay", "0",
                  "--print_freq", "100", "--name", "tm"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    results = str(tmp_path / "results")
    test_main(
        COMMON + ["--model", "test", "--dataset_mode", "single",
                  "--name", "tm", "--which_epoch", "1",
                  "--results_dir", results, "--how_many", "2"],
        dataset_path=os.path.join(tiny_dataset, "test_all"),
        out_path=out,
    )
    web_dir = os.path.join(results, "tm", "test_all/_1")
    assert os.path.isfile(os.path.join(web_dir, "index.html"))


def test_batch_norm_recipe_end_to_end(tiny_dataset, tmp_path):
    """--norm batch trains, checkpoints its BatchNorm running averages,
    and the eval harness normalizes with them (torch eval semantics)."""
    import numpy as np

    from dsgan_tpu.test import main as test_main
    from dsgan_tpu.train import main as train_main
    from dsgan_tpu.utils import checkpoint as ckpt

    out = str(tmp_path / "out")
    train_main(
        COMMON + TRAIN_ONLY + ["--norm", "batch", "--niter", "1",
                  "--niter_decay", "0", "--print_freq", "100", "--name", "bn"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    tree = ckpt.restore_untyped(os.path.join(out, "checkpoints", "bn"), 1)
    stats = tree["state"].get("stats_G")
    assert stats, "no batch_stats in the checkpoint"
    leaves = [np.asarray(v) for v in
              __import__("jax").tree_util.tree_leaves(stats)]
    assert any(np.abs(l).max() > 0 for l in leaves), "running stats never updated"
    # running mean must have moved off its init (zeros) somewhere
    means = [np.asarray(v) for k, v in _flat_items(stats) if k.endswith("mean")]
    assert any(np.abs(m).max() > 1e-6 for m in means)

    results = str(tmp_path / "results")
    test_main(
        COMMON + ["--norm", "batch", "--name", "bn", "--which_epoch", "1",
                  "--results_dir", results, "--how_many", "2"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    web_dir = os.path.join(results, "bn", "test_all/_1")
    assert os.path.isfile(os.path.join(web_dir, "metrics.csv"))


def _flat_items(tree, prefix=""):
    out = []
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.extend(_flat_items(v, key))
        else:
            out.append((key, v))
    return out


@pytest.mark.slow
def test_keep_ckpts_retention_through_cli(tiny_dataset, tmp_path):
    """--keep_ckpts k must end the run with exactly k checkpoints (the
    newest), and the pre-save prune must never drop below k while a save
    is in flight (the old checkpoint survives until the new one lands)."""
    from dsgan_tpu.train import main as train_main

    out = str(tmp_path / "out")
    train_main(
        COMMON + TRAIN_ONLY + ["--niter", "3", "--niter_decay", "0",
                  "--print_freq", "100", "--keep_ckpts", "1",
                  "--name", "keep"],
        dataset_path=tiny_dataset,
        out_path=out,
    )
    ckpt_dir = os.path.join(out, "checkpoints", "keep")
    epochs = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("epoch_"))
    assert epochs == ["epoch_3"], epochs


@pytest.mark.slow
def test_sigterm_preempt_checkpoint_and_resume(tiny_dataset, tmp_path):
    """Graceful preemption: SIGTERM mid-training checkpoints the full
    state (label 'preempt') and exits 0; --continue_train
    --which_epoch preempt resumes it."""
    import signal
    import subprocess
    import sys
    import time as _time

    out = str(tmp_path / "out")
    args = [
        sys.executable, "-m", "dsgan_tpu.train", "--platform", "cpu",
        "--dataroot", tiny_dataset, "--checkpoints_dir",
        os.path.join(out, "checkpoints"), "--name", "pre",
        "--niter", "500", "--niter_decay", "0", "--print_freq", "1",
    ] + COMMON + TRAIN_ONLY
    proc = subprocess.Popen(args, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    ckpt_dir = os.path.join(out, "checkpoints", "pre")
    log = os.path.join(ckpt_dir, "loss_log.txt")
    deadline = _time.time() + 180
    # wait until at least one training iteration has logged
    while _time.time() < deadline:
        if os.path.isfile(log) and len(open(log).readlines()) >= 2:
            break
        if proc.poll() is not None:
            raise AssertionError(
                "trainer exited early:\n" + proc.stdout.read().decode())
        _time.sleep(0.5)
    else:
        proc.kill()
        raise AssertionError("trainer never reached a training iteration")
    proc.send_signal(signal.SIGTERM)
    out_text = proc.stdout.read().decode()
    assert proc.wait(timeout=120) == 0, out_text
    assert "preempt" in out_text
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_preempt")), out_text

    # resume from the preempt state through the in-process entry point
    from dsgan_tpu.train import main as train_main

    train_main(
        COMMON + TRAIN_ONLY + [
            "--niter", "1", "--niter_decay", "0", "--print_freq", "2",
            "--name", "pre", "--continue_train", "--which_epoch", "preempt",
            "--checkpoints_dir", os.path.join(out, "checkpoints"),
        ],
        dataset_path=tiny_dataset,
        out_path=None,
    )
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))
