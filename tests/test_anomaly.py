"""Failure-detection subsystem (--detect_anomaly): a NaN'd training run
must abort with a forensic dump instead of training to completion and
saving garbage checkpoints (the reference has no failure detection at
all, SURVEY §5)."""
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def tiny_dataset(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "data" / "train_all"
    d.mkdir(parents=True)
    for i in range(2):
        arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"a_{i}.png")
    for i in range(2):
        arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"b_{i}.png")
    return str(tmp_path / "data")


ARGS = [
    "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
    "--loadSize_w", "32", "--loadSize_h", "32",
    "--fineSize_w", "32", "--fineSize_h", "32",
    "--batchSize", "2", "--w_vgg", "0", "--pool_size", "2",
    "--dtype", "float32", "--nThreads", "1",
    "--niter", "1", "--niter_decay", "0", "--print_freq", "1",
]


def test_nan_lr_aborts_with_forensic_dump(tiny_dataset, tmp_path):
    from dsgan_tpu.models.base_model import AnomalyDetected
    from dsgan_tpu.train import main

    out = str(tmp_path / "out")
    # lr=NaN poisons params after the first update; the guard must trip
    # on the next fetched metrics, not at the end of training
    with pytest.raises(AnomalyDetected) as exc:
        main(ARGS + ["--lr", "nan", "--name", "nanrun"],
             dataset_path=tiny_dataset, out_path=out)
    assert exc.value.bad_metrics, "no metric names recorded"

    ckpt_dir = os.path.join(out, "checkpoints", "nanrun")
    dump = os.path.join(ckpt_dir, "anomaly")
    assert os.path.isfile(os.path.join(dump, "report.txt"))
    assert os.path.isfile(os.path.join(dump, "real_A.npy"))
    # forensic state checkpoint restorable via --which_epoch anomaly
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_anomaly"))
    # and no regular epoch checkpoint was persisted from the poisoned run
    assert not os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))


def test_debug_nans_names_the_op(tiny_dataset, tmp_path):
    """--debug_nans (jax_debug_nans) raises at the first NaN-producing op,
    for localizing what --detect_anomaly caught in production."""
    import jax

    from dsgan_tpu.train import main

    try:
        with pytest.raises(FloatingPointError):
            main(ARGS + ["--lr", "nan", "--debug_nans", "--name", "dbg"],
                 dataset_path=tiny_dataset, out_path=str(tmp_path / "o"))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_clean_run_unaffected(tiny_dataset, tmp_path):
    from dsgan_tpu.train import main

    out = str(tmp_path / "out2")
    main(ARGS + ["--name", "ok"], dataset_path=tiny_dataset, out_path=out)
    ckpt_dir = os.path.join(out, "checkpoints", "ok")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))
    assert not os.path.isdir(os.path.join(ckpt_dir, "anomaly"))
