"""Golden snapshot of the CLI flag surface.

The flag names and defaults are this framework's compatibility contract
with the reference's recipes (reference DSGAN/options/*.py) — existing
DS-GAN command lines must keep running unchanged. Any rename, removal,
or default change must be deliberate: update the golden here AND the
docs (README/RECIPES/COVERAGE) in the same commit.
"""

import argparse

import pytest

TRAIN_DEFAULTS = {
    # -- reference-parity flags (names/defaults from the reference CLI)
    "batchSize": 1, "beta1": 0.5, "checkpoints_dir": "./checkpoints/",
    "continue_train": False, "dataroot": "./datasets",
    "dataset_mode": "aligned", "display_freq": 100, "display_id": 1,
    "display_ncols": 4, "display_port": 8097,
    "display_server": "http://localhost", "display_winsize": 256,
    "epoch_count": 1, "fineSize_h": 256, "fineSize_w": 256,
    "gpu_ids": "0", "init_type": "normal", "input_nc": 3,
    "loadSize_h": 256, "loadSize_w": 256, "lr": 0.0002,
    "lr_decay_iters": 50, "lr_policy": "lambda",
    "max_dataset_size": float("inf"), "model": "pix2pix", "nThreads": 4,
    "n_layers_D": 3, "name": "experiment_name", "ndf": 32, "ngf": 32,
    "niter": 10, "niter_decay": 10, "no_dropout": False, "no_flip": False,
    "no_html": False, "no_lsgan": False, "norm": "instance",
    "output_nc": 3, "phase": "train_all/", "pool_size": 50,
    "print_freq": 100, "resize_or_crop": "resize_and_crop",
    "save_epoch_freq": 50, "save_latest_freq": 5000,
    "serial_batches": False, "suffix": "", "update_html_freq": 1000,
    "use_GAN": 1, "use_condition": 1, "verbose": False,
    "w_gan": 0.01, "w_ss": 1.25, "w_tv": 1.0, "w_vgg": 1.0,
    "which_direction": "AtoB", "which_epoch": "1",
    "which_model_netD": "basic", "which_model_netG": "MixConvNeXtML",
    # -- TPU-native additions (no reference counterpart)
    "data_axis": 0, "spatial_axis": 1, "num_hosts": 1, "platform": "",
    "dtype": "bfloat16", "gelu": "auto", "native_loader": "auto",
    "remat": False, "seed": 20, "vgg_weights": "",
    "keep_ckpts": 0, "detect_anomaly": 1, "debug_nans": False,
    "profile_dir": "", "profile_steps": "10:13",
    "steps_per_dispatch": 1,
}

TEST_ONLY_DEFAULTS = {
    "ntest": float("inf"), "results_dir": "./results/",
    "aspect_ratio": 1.0, "phase": "test_all/", "which_epoch": "1",
    "load_npz": "", "how_many": 1000, "inception_weights": "",
}


def _surface(options_cls, is_train):
    opts = options_cls()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser = opts.initialize(parser)
    return {a.dest: a.default for a in parser._actions if a.dest != "help"}


def test_train_flag_surface_matches_golden():
    from dsgan_tpu.options.train_options import TrainOptions

    got = _surface(TrainOptions, True)
    assert got == TRAIN_DEFAULTS, (
        sorted(set(got) ^ set(TRAIN_DEFAULTS)),
        {k: (got.get(k), TRAIN_DEFAULTS.get(k))
         for k in set(got) & set(TRAIN_DEFAULTS)
         if got[k] != TRAIN_DEFAULTS[k]},
    )


def test_test_flag_surface_matches_golden():
    from dsgan_tpu.options.test_options import TestOptions

    got = _surface(TestOptions, False)
    # test options = base surface with the train-only group replaced
    train_only = set(TRAIN_DEFAULTS) - set(got)
    assert "lr" in train_only and "niter" in train_only
    for k, v in TEST_ONLY_DEFAULTS.items():
        assert got.get(k) == v, (k, got.get(k), v)


@pytest.mark.parametrize("flag,value,attr,want", [
    ("--w_gan", "0.5", "w_gan", 0.5),         # typed (ref leaves untyped)
    ("--use_GAN", "0", "use_GAN", 0),
    ("--batchSize", "4", "batchSize", 4),
])
def test_numeric_flags_parse_typed(flag, value, attr, want):
    from dsgan_tpu.options.train_options import TrainOptions

    opt = TrainOptions().parse(argv=[
        flag, value, "--name", "optsurf",
        "--checkpoints_dir", "/tmp/dsgan_optsurf",
    ])
    got = getattr(opt, attr)
    assert got == want and type(got) is type(want)
