"""Native C++ runtime tests: decode parity vs PIL, batch fast path parity
with the Python dataset pipeline (skipped when the toolchain is absent)."""
import argparse

import numpy as np
import pytest
from PIL import Image

rt = pytest.importorskip("dsgan_tpu.runtime")

pytestmark = pytest.mark.skipif(not rt.available(), reason="native runtime unavailable")


@pytest.fixture()
def imgdir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "train_all"
    d.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(d / f"a_{i}.png")
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(d / f"b_{i}.jpg", quality=95)
    return tmp_path


def test_decode_matches_pil(imgdir):
    for name in ("train_all/a_0.png", "train_all/b_0.jpg"):
        p = str(imgdir / name)
        want = np.asarray(Image.open(p).convert("RGB")).astype(np.float32) / 255 * 2 - 1
        got, ok = rt.load_batch([p], [0], [0], [0], 64, 64)
        assert ok == 1
        np.testing.assert_allclose(got[0], want, atol=1e-6)


def test_native_batch_matches_python_pipeline(imgdir):
    from dsgan_tpu.data.datasets import AlignedDataset

    opt = argparse.Namespace(
        dataroot=str(imgdir), phase="train_all", resize_or_crop="resize_and_crop",
        loadSize_w=64, loadSize_h=64, fineSize_w=64, fineSize_h=64,
        which_direction="AtoB", input_nc=3, output_nc=3, no_flip=True, seed=1,
    )
    ds = AlignedDataset()
    ds.initialize(opt)
    nb = ds.native_batch([0, 1, 2])
    assert nb is not None and nb["A"].shape == (3, 64, 64, 3)

    ds2 = AlignedDataset()
    ds2.initialize(opt)
    for i in range(3):
        item = ds2[i]
        np.testing.assert_allclose(nb["A"][i], item["A"], atol=1e-6)
        np.testing.assert_allclose(nb["B"][i], item["B"], atol=1e-6)


def test_bad_file_returns_zero(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    out, ok = rt.load_batch([str(bad)], [0], [0], [0], 8, 8)
    assert ok == 0
    assert np.all(out == 0)
