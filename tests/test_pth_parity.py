"""Checkpoint-parity: convert randomly-initialized reference torch
networks' state_dicts and check our NHWC flax implementations produce the
same outputs. This is the strongest structural-equivalence evidence short
of trained weights (which need the real datasets)."""
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dsgan_tpu.models import define_D, define_G
from dsgan_tpu.utils.pth_convert import (
    convert_mixconvnext,
    convert_nlayer_discriminator,
)

REF = "/root/reference/DSGAN"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.mark.slow
def test_mixconvnext_forward_parity_with_converted_weights(tmp_path):
    sys.path.insert(0, os.path.join(REF, "models", "model"))
    try:
        import MixConvNeXtML as refmod

        torch.manual_seed(0)
        net = refmod.MixConvNeXtML().eval()
    finally:
        sys.path.pop(0)
    pth = tmp_path / "g.pth"
    torch.save(net.state_dict(), pth)

    params = convert_mixconvnext(str(pth))
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=None)

    x = np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(g.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_patchgan_forward_parity_with_converted_weights(tmp_path):
    import functools

    import torch.nn as tnn

    sys.path.insert(0, REF)
    try:
        from models import networks as refnets

        torch.manual_seed(0)
        norm_layer = functools.partial(
            tnn.InstanceNorm2d, affine=False, track_running_stats=False
        )
        net = refnets.NLayerDiscriminator(6, 32, 3, norm_layer, use_sigmoid=False).eval()
    finally:
        sys.path.pop(0)
    pth = tmp_path / "d.pth"
    torch.save(net.state_dict(), pth)

    params = convert_nlayer_discriminator(str(pth))
    d = define_D(6, 32, "basic", dtype=None)

    x = np.random.default_rng(1).uniform(-1, 1, (1, 64, 64, 6)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(d.apply({"params": params}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_eval_cli_with_converted_npz(tmp_path):
    """End-to-end: pth_convert g -> .npz -> `dsgan_tpu.test --load_npz`
    (the reference-checkpoint quality-parity evaluation path)."""
    from PIL import Image

    sys.path.insert(0, os.path.join(REF, "models", "model"))
    try:
        import MixConvNeXtML as refmod

        torch.manual_seed(1)
        net = refmod.MixConvNeXtML().eval()
    finally:
        sys.path.pop(0)
    pth = tmp_path / "g.pth"
    torch.save(net.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import save_params_npz

    npz = tmp_path / "g.npz"
    save_params_npz(convert_mixconvnext(str(pth)), str(npz))

    droot = tmp_path / "data" / "test_all"
    os.makedirs(droot)
    rng = np.random.default_rng(0)
    for i in range(4):
        for pfx in "ab":
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            ).save(droot / f"{pfx}_{i}.png")

    from dsgan_tpu import test as eval_cli

    eval_cli.main([
        "--dataroot", str(tmp_path / "data"), "--name", "npz_eval",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--load_npz", str(npz), "--how_many", "2",
        "--dtype", "float32",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--loadSize_w", "32", "--loadSize_h", "32",
    ])
    out = tmp_path / "results" / "npz_eval" / "test_all" / "_1" / "metrics.csv"
    assert out.exists()
    assert "mean" in out.read_text()
