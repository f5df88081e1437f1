"""Image transforms (reference DSGAN/data/base_dataset.py get_transform +
aligned_dataset.py inline pipeline), PIL+numpy, no torch.

All outputs are HWC float32 in [-1, 1].
"""

import numpy as np
from PIL import Image


def to_array(img):
    """PIL -> HWC float32 in [0,1] (ToTensor semantics)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def normalize(arr):
    """[0,1] -> [-1,1] (Normalize(0.5,0.5,0.5))."""
    return arr * 2.0 - 1.0


def resize(img, w, h):
    return img.resize((w, h), Image.BICUBIC)


def scale_width(img, target_width):
    ow, oh = img.size
    if ow == target_width:
        return img
    h = int(target_width * oh / ow)
    return img.resize((target_width, h), Image.BICUBIC)


def crop(arr, y, x, th, tw):
    return arr[y:y + th, x:x + tw, :]


def hflip(arr):
    return arr[:, ::-1, :]


def rgb_to_gray(arr):
    """Luma projection matching the reference's 0.299/0.587/0.114 mix
    (aligned_dataset.py:78-84), applied on [-1,1] arrays."""
    tmp = arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114
    return tmp[..., None]


def get_transform(opt, rng, uint8=False):
    """Compose the --resize_or_crop pipeline for unaligned/single datasets
    (reference base_dataset.py:17-39). Returns fn(PIL) -> HWC [-1,1]
    float32 — or, with ``uint8=True``, raw HWC uint8 with the identical
    spatial pipeline (crop/flip are dtype-agnostic), deferring the
    /255*2-1 normalize to the accelerator. The device normalize applies
    the same f32 operations in the same order, so the two paths are
    bit-identical; uint8 quarters the host->device transfer bytes (the
    axon-relay H2D measures ~1.4 GB/s — 19 ms/step of f32 pixels at the
    default recipe)."""
    mode = opt.resize_or_crop
    fw, fh = opt.fineSize_w, opt.fineSize_h
    lw, lh = opt.loadSize_w, opt.loadSize_h
    do_flip = not opt.no_flip

    def apply(img, rng=rng):
        if mode == "resize_and_crop":
            img = resize(img, lw, lh)
        elif mode == "scale_width" or mode == "scale_width_and_crop":
            img = scale_width(img, fw if mode == "scale_width" else lw)
        elif mode == "crop":
            pass
        else:
            raise ValueError(f"unknown resize_or_crop mode: {mode}")
        if uint8:
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
        else:
            arr = to_array(img)
        if mode in ("resize_and_crop", "crop", "scale_width_and_crop"):
            h, w = arr.shape[:2]
            y = int(rng.integers(0, max(h - fh, 0) + 1))
            x = int(rng.integers(0, max(w - fw, 0) + 1))
            arr = crop(arr, y, x, fh, fw)
        if do_flip and rng.random() < 0.5:
            arr = hflip(arr)
        return arr if uint8 else normalize(arr)

    return apply


def joint_random_crop(a, b, crop_h, crop_w, rng):
    """Joint random crop of a paired (A, B) sample (the working equivalent
    of the reference's unused TransCrop, aligned_dataset.py:14-25)."""
    h, w = a.shape[:2]
    y = int(rng.integers(0, max(h - crop_h, 0) + 1))
    x = int(rng.integers(0, max(w - crop_w, 0) + 1))
    return crop(a, y, x, crop_h, crop_w), crop(b, y, x, crop_h, crop_w)
