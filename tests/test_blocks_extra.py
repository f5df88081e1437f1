"""Converted-weight forward parity for the reference's ORPHANED modules
(networks.py dead blocks + networks_wnet.py) against the actual imported
reference classes — closing the last SURVEY §2.1 inventory rows
(models/blocks_extra.py)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_ROOT = "/root/reference/DSGAN"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF_ROOT), reason="reference tree not present"
)


def _import_ref_networks():
    for name in ("pytorch_msssim", "pytorch_ssim"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import models.networks as ref_networks

    return ref_networks


def _import_ref_wnet():
    _import_ref_networks()
    mdir = REF_ROOT + "/models"
    if mdir not in sys.path:
        sys.path.insert(0, mdir)
    import networks_wnet

    return networks_wnet


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.05, generator=g)
        for b in module.buffers():  # BatchNorm running stats
            if b.dtype.is_floating_point:
                b.uniform_(0.5, 1.5, generator=g)
    module.eval()
    return module


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_cbam_block_converted_forward_parity(tmp_path):
    ref = _import_ref_networks()
    tm = _randomize(ref.cbam_block(16), seed=3)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "cbam.pth")
    torch.save({"m." + k: v for k, v in tm.state_dict().items()}, pth)
    from dsgan_tpu.utils.pth_convert import _cbam, _load_state_dict

    params = jax.tree_util.tree_map(jnp.asarray, _cbam(_load_state_dict(pth), "m"))

    from dsgan_tpu.models.blocks_extra import CBAMBlock

    got = np.asarray(CBAMBlock(dtype=None).apply(
        {"params": params}, jnp.asarray(_nhwc(x))))
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-5, atol=1e-6)


def test_resdecoder_cbam_converted_forward_parity():
    ref = _import_ref_networks()
    tm = _randomize(ref.ResDecoderBlockCBAM(16, 24), seed=5)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    from dsgan_tpu.utils.pth_convert import _cbam, _conv_b

    params = {
        "conv1": _conv_b(sd, "conv1.1"), "cbam1": _cbam(sd, "conv1.4"),
        "conv2": _conv_b(sd, "conv2.1"), "cbam2": _cbam(sd, "conv2.4"),
        "shortcut": _conv_b(sd, "shortcut.0"),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    from dsgan_tpu.models.blocks_extra import ResDecoderBlockCBAM

    got = np.asarray(ResDecoderBlockCBAM(24, dtype=None).apply(
        {"params": params}, jnp.asarray(_nhwc(x)), train=False))
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


def test_unetpp_converted_forward_parity(tmp_path):
    ref = _import_ref_networks()
    tm = _randomize(ref.UnetPlusPlus(), seed=7)
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "upp.pth")
    torch.save(tm.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import convert_unetpp

    params = jax.tree_util.tree_map(jnp.asarray, convert_unetpp(pth))

    from dsgan_tpu.models.blocks_extra import UnetPlusPlus

    got = np.asarray(UnetPlusPlus(ngf=64, dtype=None).apply(
        {"params": params}, jnp.asarray(_nhwc(x)), train=False))
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm", ["batch", "instance"])
def test_wnet_converted_forward_parity(tmp_path, norm):
    import functools

    wn = _import_ref_wnet()
    if norm == "batch":
        tm = wn.wnet(8, 16)  # default norm_layer=nn.BatchNorm2d
    else:
        tm = wn.wnet(8, 16, norm_layer=functools.partial(
            torch.nn.InstanceNorm2d, affine=False, track_running_stats=False))
    _randomize(tm, seed=41 + int(norm == "batch"))

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "wnet.pth")
    torch.save(tm.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import convert_wnet

    params, batch_stats = convert_wnet(pth, norm=norm)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if norm == "batch":
        variables["batch_stats"] = jax.tree_util.tree_map(
            jnp.asarray, batch_stats)

    from dsgan_tpu.models.blocks_extra import WNet

    got = np.asarray(WNet(16, norm, dtype=None).apply(
        variables, jnp.asarray(_nhwc(x)), train=False))
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)


def test_wnet_shared_prelu_is_single_param():
    """The reference shares ONE PReLU slope across all stages
    (networks_wnet.py:9) — our WNet must hold exactly one slope param."""
    from dsgan_tpu.models.blocks_extra import WNet

    v = WNet(8, "instance", dtype=None).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))
    from flax import traverse_util

    slopes = [p for p in traverse_util.flatten_dict(v["params"])
              if p[-1] == "negative_slope"]
    assert len(slopes) == 1


def test_fennet_shapes():
    """FENNet has no forward in the reference; ours runs the evident
    stage_1 -> pool -> wnet pipeline: 3ch -> 64ch at half resolution."""
    from dsgan_tpu.models.blocks_extra import FENNet

    m = FENNet(norm="instance", dtype=None)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 16, 64)


@pytest.mark.parametrize("name", ["unetpp", "wnet"])
def test_define_g_extension_names(name):
    from dsgan_tpu.models.registry import define_G, init_params

    g = define_G(3, 3, 8, name, dtype=None)
    v = init_params(g, jax.random.PRNGKey(0), (1, 32, 32, 3), "normal")
    y = g.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert y.shape == (2, 32, 32, 3)


def test_convc_block_reference_is_broken_and_repair_matches_intent():
    """The reference ConvC_Block (networks.py:926-946) pads every branch
    by 1, so the k1/k3/k5/k7 outputs have four different spatial sizes and
    the concat raises — dead code that could never have run. Our
    ConvCBlock repairs it with 'same' padding; parity is checked against a
    torch oracle using the REFERENCE module's own weights and norm tail,
    only the paddings corrected."""
    import torch.nn.functional as F

    ref = _import_ref_networks()
    tm = _randomize(ref.ConvC_Block(8, 4), seed=7)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 12, 12)).astype(np.float32)

    with pytest.raises(RuntimeError):
        with torch.no_grad():
            tm(torch.from_numpy(x))

    with torch.no_grad():
        xt = torch.from_numpy(x)
        outs = [
            F.conv2d(xt, getattr(tm, f"Conv{k}").weight,
                     getattr(tm, f"Conv{k}").bias, padding=k // 2)
            for k in (1, 3, 5, 7)
        ]
        want = tm.ConvC(torch.cat(outs, 1)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    from dsgan_tpu.utils.pth_convert import _conv_b

    params = jax.tree_util.tree_map(
        jnp.asarray, {f"conv{k}": _conv_b(sd, f"Conv{k}") for k in (1, 3, 5, 7)}
    )
    from dsgan_tpu.models.blocks_extra import ConvCBlock

    got = np.asarray(ConvCBlock(4, dtype=None).apply(
        {"params": params}, jnp.asarray(_nhwc(x)), train=False))
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-4, atol=1e-5)
