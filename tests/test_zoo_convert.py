"""Converted-weight forward parity for the generator ZOO against the
ACTUAL reference torch modules (imported from /root/reference, never
copied) — extends the checkpoint-import surface beyond the flagship
(test_pth_parity covers MixConvNeXtML + the PatchGAN discriminator)."""

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


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.05, generator=g)
    module.eval()
    return module


@pytest.mark.parametrize("use_dropout", [False, True])
def test_resnet_generator_converted_forward_parity(tmp_path, use_dropout):
    import functools

    ref_networks = _import_ref_networks()
    norm_layer = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=False)
    tm = ref_networks.ResnetGenerator(
        3, 3, ngf=8, norm_layer=norm_layer, use_dropout=use_dropout,
        n_blocks=4)
    _randomize(tm, seed=11 + use_dropout)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "rg.pth")
    torch.save(tm.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import convert_resnet_generator

    params = convert_resnet_generator(pth)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    from dsgan_tpu.models.generators_zoo import ResnetGenerator

    g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=4,
                        use_dropout=use_dropout, dtype=None)
    got = np.asarray(g.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False))
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_dropout", [False, True])
def test_unet_generator_converted_forward_parity(tmp_path, use_dropout):
    import functools

    ref_networks = _import_ref_networks()
    norm_layer = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=False)
    tm = ref_networks.UnetGenerator(
        3, 3, num_downs=5, ngf=8, norm_layer=norm_layer,
        use_dropout=use_dropout)
    _randomize(tm, seed=23 + use_dropout)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "ug.pth")
    torch.save(tm.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import convert_unet_generator

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_unet_generator(pth))

    from dsgan_tpu.models.generators_zoo import UnetGenerator

    g = UnetGenerator(output_nc=3, num_downs=5, ngf=8,
                      use_dropout=use_dropout, dtype=None)
    got = np.asarray(g.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False))
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)


def test_gll_generator_converted_forward_parity(tmp_path):
    import functools

    ref_networks = _import_ref_networks()
    norm_layer = functools.partial(
        torch.nn.InstanceNorm2d, affine=False, track_running_stats=False)
    tm = ref_networks.LocalEnhancer(
        3, 3, ngf=8, n_downsample_global=2, n_blocks_global=3,
        n_local_enhancers=1, n_blocks_local=2, norm_layer=norm_layer)
    _randomize(tm, seed=31)

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "gll.pth")
    torch.save(tm.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import convert_gll_generator

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_gll_generator(pth))

    from dsgan_tpu.models.generators_zoo import LocalEnhancer

    g = LocalEnhancer(output_nc=3, ngf=8, n_downsample_global=2,
                      n_blocks_global=3, n_local_enhancers=1,
                      n_blocks_local=2, dtype=None)
    got = np.asarray(g.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False))
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)
