"""Small host-side helpers (reference DSGAN/util/util.py)."""

import os

import numpy as np


def tensor2im(x):
    """First batch element of an NHWC [-1,1] array -> uint8 HWC RGB
    (reference util.py:10-19). uint8 inputs (the raw-pixel loader fast
    path) pass through unchanged — they ARE the image bytes."""
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.dtype == np.uint8:
        return arr
    arr = (arr + 1.0) / 2.0 * 255.0
    return np.clip(arr, 0, 255).astype(np.uint8)


def save_image(image_numpy, image_path):
    from PIL import Image

    Image.fromarray(image_numpy).save(image_path)


def diagnose_network(grads, name="network"):
    """Mean absolute gradient over a grad pytree (reference util.py:22-32)."""
    import jax

    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return 0.0
    total = sum(float(np.abs(np.asarray(g)).mean()) for g in leaves)
    mean = total / len(leaves)
    print(name)
    print(mean)
    return mean


def print_numpy(x, val=True, shp=False):
    x = np.asarray(x).astype(np.float64)
    if shp:
        print("shape,", x.shape)
    if val:
        x = x.flatten()
        print(
            "mean = %3.3f, min = %3.3f, max = %3.3f, median = %3.3f, std=%3.3f"
            % (np.mean(x), np.min(x), np.max(x), np.median(x), np.std(x))
        )


def mkdirs(paths):
    if isinstance(paths, list) and not isinstance(paths, str):
        for path in paths:
            mkdir(path)
    else:
        mkdir(paths)


def mkdir(path):
    os.makedirs(path, exist_ok=True)
