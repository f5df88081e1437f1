"""Direct unit tests for the data-transform pipeline and UnalignedDataset
indexing (reference base_dataset.py:17-39 / unaligned_dataset.py)."""
import argparse
import os

import numpy as np
import pytest
from PIL import Image

from dsgan_tpu.data import transforms as T
from dsgan_tpu.data.datasets import UnalignedDataset


def _opt(**kw):
    ns = argparse.Namespace(
        resize_or_crop="resize_and_crop",
        fineSize_w=8, fineSize_h=8, loadSize_w=12, loadSize_h=12,
        no_flip=True, which_direction="AtoB", input_nc=3, output_nc=3,
        serial_batches=False, seed=7, phase="train",
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))


def test_resize_and_crop_mode():
    tf = T.get_transform(_opt(), np.random.default_rng(0))
    out = tf(_img(30, 20))
    assert out.shape == (8, 8, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_crop_mode_no_resize():
    """'crop' leaves size alone, then random-crops to fineSize — pixels
    must come from the original image unchanged (modulo [-1,1] scaling)."""
    img = _img(16, 16, seed=3)
    tf = T.get_transform(_opt(resize_or_crop="crop"), np.random.default_rng(1))
    out = tf(img)
    assert out.shape == (8, 8, 3)
    src = np.asarray(img, np.float32) / 255.0 * 2 - 1
    # the 8x8 crop must be a contiguous window of the source
    found = any(
        np.allclose(out, src[y:y + 8, x:x + 8], atol=1e-6)
        for y in range(9) for x in range(9)
    )
    assert found


def test_scale_width_mode_preserves_aspect():
    tf = T.get_transform(_opt(resize_or_crop="scale_width"), np.random.default_rng(0))
    out = tf(_img(32, 16))  # 2:1 -> width 8 => height 4
    assert out.shape == (4, 8, 3)


def test_scale_width_and_crop_mode():
    tf = T.get_transform(
        _opt(resize_or_crop="scale_width_and_crop"), np.random.default_rng(0)
    )
    out = tf(_img(48, 24))  # scaled to loadSize width 12 (height 6), crop 8x8 -> h<8 clamps
    # height after scale = 6 < fineSize 8: crop clamps offset to 0 and slicing
    # yields the full 6 rows
    assert out.shape[1] == 8 and out.shape[2] == 3


def test_unknown_mode_raises():
    tf = T.get_transform(_opt(resize_or_crop="nope"), np.random.default_rng(0))
    with pytest.raises(ValueError):
        tf(_img(8, 8))


def test_flip_applies_horizontally():
    img = _img(8, 8, seed=5)
    opt = _opt(resize_or_crop="crop", no_flip=False, fineSize_w=8, fineSize_h=8)
    rng = np.random.default_rng(0)
    # drive until a flip occurs; flip is exactly reversal of columns
    src = np.asarray(img, np.float32) / 255.0 * 2 - 1
    tf = T.get_transform(opt, rng)
    outs = [tf(img) for _ in range(20)]
    assert any(np.allclose(o, src[:, ::-1, :], atol=1e-6) for o in outs)
    assert any(np.allclose(o, src, atol=1e-6) for o in outs)


def test_joint_random_crop_same_window():
    rng = np.random.default_rng(0)
    a = np.arange(10 * 10 * 1, dtype=np.float32).reshape(10, 10, 1)
    b = a + 1000
    ca, cb = T.joint_random_crop(a, b, 4, 4, rng)
    assert ca.shape == (4, 4, 1)
    np.testing.assert_allclose(cb - ca, 1000)


def _unaligned_root(tmp_path, na=3, nb=5):
    for d, n in (("trainA", na), ("trainB", nb)):
        os.makedirs(tmp_path / d)
        for i in range(n):
            _img(8, 8, seed=i).save(tmp_path / d / f"{i}.png")
    return str(tmp_path)


def test_unaligned_serial_indexing(tmp_path):
    opt = _opt(resize_or_crop="crop", serial_batches=True, phase="train")
    opt.dataroot = _unaligned_root(tmp_path)
    ds = UnalignedDataset()
    ds.initialize(opt)
    assert len(ds) == 5  # max(A_size, B_size), reference unaligned_dataset.py:55
    item = ds[4]
    # A wraps modulo A_size=3 -> A index 1; B serial -> index 4
    assert item["A_paths"].endswith("1.png")
    assert item["B_paths"].endswith("4.png")
    assert item["A"].shape == (8, 8, 3) and item["B"].shape == (8, 8, 3)


def test_unaligned_random_b_pairing(tmp_path):
    opt = _opt(resize_or_crop="crop", serial_batches=False, phase="train")
    opt.dataroot = _unaligned_root(tmp_path)
    ds = UnalignedDataset()
    ds.initialize(opt, rng=np.random.default_rng(0))
    bs = {ds[0]["B_paths"] for _ in range(20)}
    assert len(bs) > 1  # random pairing draws different B files


def test_unaligned_gray_channels(tmp_path):
    opt = _opt(resize_or_crop="crop", input_nc=1, output_nc=3, phase="train")
    opt.dataroot = _unaligned_root(tmp_path)
    ds = UnalignedDataset()
    ds.initialize(opt)
    item = ds[0]
    assert item["A"].shape == (8, 8, 1)
    assert item["B"].shape == (8, 8, 3)


def test_uint8_pipeline_bit_identical_to_f32(tmp_path):
    """The uint8 host path + on-device normalize must reproduce the f32
    host pipeline BIT-exactly: same crop/flip RNG draws, and /255*2-1 is
    the same f32 op sequence on either side of the transfer."""
    import argparse

    import jax.numpy as jnp

    from dsgan_tpu.data.datasets import AlignedDataset

    rng = np.random.default_rng(0)
    d = tmp_path / "train_all"
    d.mkdir()
    for pfx in "ab":
        arr = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{pfx}_0.png")

    opt = argparse.Namespace(
        dataroot=str(tmp_path), phase="train_all", resize_or_crop="resize_and_crop",
        loadSize_w=40, loadSize_h=40, fineSize_w=32, fineSize_h=32,
        which_direction="AtoB", input_nc=3, output_nc=3, no_flip=False, seed=5,
    )
    ds = AlignedDataset(); ds.initialize(opt)
    item = ds[0]
    assert item["A"].dtype == np.uint8  # fast path engaged

    # replay the f32 host pipeline with the same RNG stream
    ref_rng = np.random.default_rng(5)
    A = np.asarray(Image.open(ds.A_paths[0]).convert("RGB"), np.float32) / 255.0
    w_off = int(ref_rng.integers(0, 40 - 32 - 1 + 1))
    h_off = int(ref_rng.integers(0, 40 - 32 - 1 + 1))
    A = A[h_off:h_off + 32, w_off:w_off + 32, :] * 2.0 - 1.0
    if ref_rng.random() < 0.5:
        A = A[:, ::-1, :]

    dev = np.asarray(
        jnp.asarray(item["A"]).astype(jnp.float32) / 255.0 * 2.0 - 1.0
    )
    np.testing.assert_array_equal(dev, A.astype(np.float32))


def test_image_folder_dataset(tmp_path):
    """ImageFolder: working flat-directory dataset (the reference class,
    image_folder.py:41-66, is dead code that crashes on the half-split
    tuple; ours honors the documented contract)."""
    from dsgan_tpu.data.image_folder import ImageFolder

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        arr = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im_{i}.png")
    (d / "notes.txt").write_text("skip me")

    ds = ImageFolder(str(d))
    assert len(ds) == 4
    assert np.asarray(ds[0]).shape == (8, 8, 3)

    ds_p = ImageFolder(str(d), transform=lambda im: np.asarray(im) / 255.0,
                       return_paths=True)
    img, path = ds_p[1]
    assert path.endswith("im_1.png")
    assert img.max() <= 1.0

    import pytest as _pytest
    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(RuntimeError):
        ImageFolder(str(empty))
