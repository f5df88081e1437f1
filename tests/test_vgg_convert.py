"""Golden test for the VGG16 weight converter — the one converter that
gates quality parity (the perceptual loss, reference DSGAN/models/vgg.py:5-28).

torchvision is not installed here, so we build a SYNTHETIC state_dict with
torchvision's exact vgg16.features layout (13 convs at indices
0,2,5,7,10,12,14,17,19,21,24,26,28 interleaved with ReLU/MaxPool), run a
hand-rolled torch forward of that structure, and require our converted
flax extractor to reproduce every tap.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dsgan_tpu.models.vgg import VGG16_CONVS, Vgg16Features, load_torchvision_npz
from dsgan_tpu.utils.pth_convert import convert_vgg16


def _synthetic_torchvision_sd(rng):
    """features.{idx}.weight/.bias for the 13 VGG16 convs, OIHW layout."""
    sd = {}
    in_ch = 3
    for out_ch, idx in VGG16_CONVS:
        # He-ish scaling keeps activations O(1) through all 13 layers; with
        # bigger weights the activations blow up ~1000x by relu5_3 and f32
        # reassociation noise amplified across ReLU boundaries drowns the
        # comparison
        std = (2.0 / (9 * in_ch)) ** 0.5
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, std, (out_ch, in_ch, 3, 3)).astype(np.float32)
        )
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        )
        in_ch = out_ch
    # torchvision state_dicts also carry the classifier head; the converter
    # must ignore it
    sd["classifier.0.weight"] = torch.zeros(4096, 25088)
    sd["classifier.0.bias"] = torch.zeros(4096)
    return sd


def _torch_taps(sd, x_nchw):
    """Reference forward: torchvision vgg16.features structure with relu
    taps at indices 3, 8, 15, 22, 29 (reference vgg.py slices)."""
    h = x_nchw
    taps = []
    conv_idx = [idx for _, idx in VGG16_CONVS]
    tap_after = {3, 8, 15, 22, 29}
    pool_at = {4, 9, 16, 23}
    for i in range(30):
        if i in conv_idx:
            w = sd[f"features.{i}.weight"]
            b = sd[f"features.{i}.bias"]
            h = torch.nn.functional.conv2d(h, w, b, padding=1)
        elif i in pool_at:
            h = torch.nn.functional.max_pool2d(h, 2)
        else:  # ReLU slots
            h = torch.nn.functional.relu(h)
        if i in tap_after:
            taps.append(h.detach().numpy())
    return taps


@pytest.mark.slow
def test_convert_vgg16_forward_parity(tmp_path):
    rng = np.random.default_rng(7)
    sd = _synthetic_torchvision_sd(rng)

    pth = tmp_path / "vgg16.pth"
    torch.save(sd, str(pth))
    npz = tmp_path / "vgg16.npz"
    convert_vgg16(str(pth), str(npz))

    params = load_torchvision_npz(str(npz))
    model = Vgg16Features(dtype=None)  # f32 for strict parity

    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ours = model.apply(params, jnp.asarray(x))
    theirs = _torch_taps(sd, torch.tensor(x.transpose(0, 3, 1, 2)))

    assert len(ours) == len(theirs) == 5
    for i, (a, b) in enumerate(zip(ours, theirs)):
        b_nhwc = b.transpose(0, 2, 3, 1)
        assert a.shape == b_nhwc.shape, f"tap {i} shape"
        np.testing.assert_allclose(
            np.asarray(a), b_nhwc, rtol=2e-4, atol=2e-4,
            err_msg=f"tap {i} mismatch",
        )


def test_random_init_vgg_warns():
    """Training without --vgg_weights must warn loudly (the perceptual loss
    silently degrading to random features was a round-1 finding)."""
    import warnings

    from dsgan_tpu.options.train_options import TrainOptions
    from dsgan_tpu.models import create_model

    opt = TrainOptions().parse(argv=[
        "--dataroot", "/tmp", "--name", "warncheck",
        "--checkpoints_dir", "/tmp/dsgan_warncheck",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--dtype", "float32",
    ])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        create_model(opt)
    msgs = [str(r.message) for r in rec]
    assert any("RANDOM-INIT" in m for m in msgs), msgs
