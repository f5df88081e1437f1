"""AOT serving export (dsgan_tpu/export.py): artifact round-trip parity
with the live inference path, batch polymorphism, and the export CLI."""
import json
import os

import numpy as np
import pytest


def _tiny_gen(nc=3, ngf=8):
    import jax
    import jax.numpy as jnp

    from dsgan_tpu.models import define_G, init_params

    g = define_G(nc, nc, ngf, "resnet_6blocks", dtype=jnp.float32, inference=True)
    variables = init_params(g, jax.random.PRNGKey(0), (1, 32, 32, nc), "normal")
    return g, variables


def test_roundtrip_matches_live_inference(tmp_path):
    from dsgan_tpu import ops
    from dsgan_tpu.export import export_generator, load_artifact, save_artifact
    from dsgan_tpu.models.pix2pix import _apply_net

    g, variables = _tiny_gen()
    blob, meta = export_generator(g, variables, 32, 32, 3,
                                  platforms=("cpu",), uint8_io=True)
    path = save_artifact(str(tmp_path / "g.stablehlo"), blob, meta)
    call, meta2 = load_artifact(path)
    assert meta2["uint8_io"] is True

    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    got = np.asarray(call(x))
    assert got.dtype == np.uint8 and got.shape == (2, 32, 32, 3)

    # live path: normalize -> apply -> quantize (the train/eval contract)
    y = _apply_net(g, variables["params"], ops.normalize_u8(x), False)
    want = np.asarray(ops.metrics.quantize_uint8(y)).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_batch_polymorphic_artifact(tmp_path):
    from dsgan_tpu.export import export_generator, load_artifact, save_artifact

    g, variables = _tiny_gen()
    blob, meta = export_generator(g, variables, 32, 32, 3,
                                  platforms=("cpu",), uint8_io=True)
    if meta["batch"] != "polymorphic":
        pytest.skip("model not batch-polymorphic in this build")
    path = save_artifact(str(tmp_path / "g.stablehlo"), blob, meta)
    call, _ = load_artifact(path)
    for b in (1, 3):
        x = np.zeros((b, 32, 32, 3), np.uint8)
        assert np.asarray(call(x)).shape == (b, 32, 32, 3)


@pytest.mark.slow
def test_export_cli_after_training(tmp_path):
    from PIL import Image

    from dsgan_tpu.export import load_artifact
    from dsgan_tpu.export import main as export_main
    from dsgan_tpu.train import main as train_main

    rng = np.random.default_rng(0)
    d = tmp_path / "data" / "train_all"
    d.mkdir(parents=True)
    for i in range(2):
        for pfx in "ab":
            arr = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{pfx}_{i}.png")

    common = [
        "--which_model_netG", "resnet_6blocks", "--ngf", "8", "--ndf", "8",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--dtype", "float32", "--nThreads", "1", "--name", "exp",
    ]
    out = str(tmp_path / "out")
    train_main(common + ["--batchSize", "2", "--w_vgg", "0", "--pool_size", "2",
                         "--niter", "1", "--niter_decay", "0", "--print_freq", "8"],
               dataset_path=str(tmp_path / "data"), out_path=out)

    art = str(tmp_path / "g.stablehlo")
    export_main(common + ["--which_epoch", "1", "--out", art, "--platforms", "cpu"],
                dataset_path=str(tmp_path / "data"), out_path=out)
    assert os.path.isfile(art) and os.path.isfile(art + ".json")
    meta = json.load(open(art + ".json"))
    assert meta["height"] == 32 and meta["input_nc"] == 3

    call, _ = load_artifact(art)
    x = np.zeros((1, 32, 32, 3), np.uint8)
    y = np.asarray(call(x))
    assert y.shape == (1, 32, 32, 3) and y.dtype == np.uint8


def test_flagship_generator_exports(tmp_path):
    """MixConvNeXtML contains custom-VJP ops (the s2d-packed dw convs) —
    the export path must lower their FORWARDS to plain StableHLO and
    round-trip exactly."""
    import jax
    import jax.numpy as jnp

    from dsgan_tpu import ops
    from dsgan_tpu.export import export_generator, load_artifact, save_artifact
    from dsgan_tpu.models import define_G, init_params
    from dsgan_tpu.models.pix2pix import _apply_net

    g = define_G(3, 3, 16, "MixConvNeXtML", dtype=jnp.float32, inference=True)
    variables = init_params(g, jax.random.PRNGKey(0), (1, 64, 64, 3), "normal")
    blob, meta = export_generator(g, variables, 64, 64, 3,
                                  platforms=("cpu",), uint8_io=True)
    path = save_artifact(str(tmp_path / "g.stablehlo"), blob, meta)
    call, _ = load_artifact(path)

    rng = np.random.default_rng(2)
    x = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    got = np.asarray(call(x)).astype(np.int32)
    y = _apply_net(g, variables["params"], ops.normalize_u8(x), False)
    want = np.asarray(ops.metrics.quantize_uint8(y)).astype(np.int32)
    # AOT and JIT compilations may fuse the f32 graph differently; a pixel
    # landing exactly on a quantization boundary may round apart (measured:
    # 1/12288 at +-1). Identical beyond that.
    diff = np.abs(got - want)
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, (
        int(diff.max()), float((diff > 0).mean()))
