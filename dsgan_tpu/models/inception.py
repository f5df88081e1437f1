"""Inception-v3 pool3 feature extractor for FID/KID evaluation.

The reference (yglbgyx/DS-GAN) evaluates only per-image SSIM/PSNR
(reference DSGAN/train.py:33-44) and qualitative figures; distribution
metrics (FID/KID) are the standard protocol in the I2V literature it
compares against (README.md:11-20 cites I2VGAN, PearlGAN, MUGAN — all
FID-reporting papers). This module supplies the missing evaluator.

Architecture: torchvision ``Inception3`` (eval mode, aux logits off,
``transform_input=False``) truncated at the 2048-d global-average-pooled
``Mixed_7c`` output ("pool3"). Two build flavors:

* ``fid_variant=True`` (default) — the pytorch-fid/TF-FID graph: the
  in-block average pools use ``count_include_pad=False`` and the LAST
  InceptionE block (Mixed_7c) uses a max pool in its pool branch. This
  is the graph the published FID numbers assume; feed it the TF-ported
  FID weights (pt_inception-2015-12-05) OR torchvision weights (then
  numbers are self-consistent but not paper-comparable).
* ``fid_variant=False`` — the literal torchvision inception_v3 graph.

Weights: one-time offline conversion of a torch state_dict via
``dsgan_tpu.utils.pth_convert.convert_inception`` (both weight files
above share torchvision's Inception3 key schema). Without weights the
features are random-init and any FID is meaningless — callers warn.

Inputs are NHWC in [-1, 1] (this framework's image convention, and
exactly what the FID weights expect: pytorch-fid maps [0,1] -> [-1,1]
before the stem). Callers resize to 299x299 bilinear first
(``prepare_images``).
"""

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from dsgan_tpu import ops

# He init, NOT the GAN zoo's N(0, 0.02): random-init features exist only
# for pipeline smokes, and 0.02-std kernels decay the signal to a
# constant over 17 conv layers (making any FID exactly 0).
he_normal = jax.nn.initializers.he_normal(in_axis=(0, 1, 2), out_axis=3)
ones = jax.nn.initializers.ones
zeros = jax.nn.initializers.zeros

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)


class BasicConv2d(nn.Module):
    """Conv (no bias) + folded eval-mode BatchNorm + ReLU.

    Param tree mirrors torchvision's BasicConv2d (conv.weight +
    bn.{weight,bias,running_mean,running_var}) so conversion is a rename.
    """

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", he_normal,
            (*self.kernel, x.shape[-1], self.features), jnp.float32)
        scale = self.param("bn_scale", ones, (self.features,), jnp.float32)
        bias = self.param("bn_bias", zeros, (self.features,), jnp.float32)
        mean = self.param("bn_mean", zeros, (self.features,), jnp.float32)
        var = self.param("bn_var", ones, (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        y = ops.conv2d(x.astype(dt), w.astype(dt),
                       stride=self.stride, padding=self.padding)
        g = scale * jax.lax.rsqrt(var + BN_EPS)
        return nn.relu(y * g.astype(dt) + (bias - mean * g).astype(dt))


def _avg_pool(x, fid_variant):
    # pytorch-fid patches the in-block 3x3/s1/p1 average pools to
    # count_include_pad=False (matching the original TF graph).
    return ops.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=not fid_variant)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=dt, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=dt, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=dt,
                         name="branch5x5_2")(b5)
        bd = BasicConv2d(64, (1, 1), dtype=dt, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=dt,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=dt,
                         name="branch3x3dbl_3")(bd)
        bp = _avg_pool(x, self.fid_variant)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=dt,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=dt, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=dt, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=dt,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=dt,
                         name="branch3x3dbl_3")(bd)
        bp = ops.max_pool2d(x, 3, stride=2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=dt, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=dt, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=dt,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=dt,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=dt, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=dt,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=dt,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=dt,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=dt,
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x, self.fid_variant)
        bp = BasicConv2d(192, (1, 1), dtype=dt, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=dt, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=dt, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=dt, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=dt,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=dt,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=dt, name="branch7x7x3_4")(b7)
        bp = ops.max_pool2d(x, 3, stride=2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid's FIDInceptionE_2 (Mixed_7c): max pool in the pool branch.
    pool_mode: str = "avg"  # avg | max
    fid_variant: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=dt, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=dt, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=dt,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=dt,
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=dt, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=dt,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=dt,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=dt,
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = ops.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg_pool(x, self.fid_variant)
        bp = BasicConv2d(192, (1, 1), dtype=dt, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionPool3(nn.Module):
    """Stem + Mixed_5b..7c + global average pool -> (N, 2048) features."""

    fid_variant: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt, fv = self.dtype, self.fid_variant
        h = BasicConv2d(32, (3, 3), stride=2, dtype=dt, name="Conv2d_1a_3x3")(x)
        h = BasicConv2d(32, (3, 3), dtype=dt, name="Conv2d_2a_3x3")(h)
        h = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=dt,
                        name="Conv2d_2b_3x3")(h)
        h = ops.max_pool2d(h, 3, stride=2)
        h = BasicConv2d(80, (1, 1), dtype=dt, name="Conv2d_3b_1x1")(h)
        h = BasicConv2d(192, (3, 3), dtype=dt, name="Conv2d_4a_3x3")(h)
        h = ops.max_pool2d(h, 3, stride=2)
        h = InceptionA(32, fv, dtype=dt, name="Mixed_5b")(h)
        h = InceptionA(64, fv, dtype=dt, name="Mixed_5c")(h)
        h = InceptionA(64, fv, dtype=dt, name="Mixed_5d")(h)
        h = InceptionB(dtype=dt, name="Mixed_6a")(h)
        h = InceptionC(128, fv, dtype=dt, name="Mixed_6b")(h)
        h = InceptionC(160, fv, dtype=dt, name="Mixed_6c")(h)
        h = InceptionC(160, fv, dtype=dt, name="Mixed_6d")(h)
        h = InceptionC(192, fv, dtype=dt, name="Mixed_6e")(h)
        h = InceptionD(dtype=dt, name="Mixed_7a")(h)
        h = InceptionE("avg", fv, dtype=dt, name="Mixed_7b")(h)
        h = InceptionE("max" if fv else "avg", fv, dtype=dt, name="Mixed_7c")(h)
        # global average pool ("pool3") -> 2048-d
        return jnp.mean(h.astype(jnp.float32), axis=(1, 2))


# ---------------------------------------------------------------- weights

_BN_MAP = {
    "bn.weight": "bn_scale",
    "bn.bias": "bn_bias",
    "bn.running_mean": "bn_mean",
    "bn.running_var": "bn_var",
}


def load_torchvision_npz(npz_path):
    """Map a converted torchvision Inception3 state_dict (.npz, see
    pth_convert.convert_inception) onto InceptionPool3's param tree."""
    data = np.load(npz_path)
    params = {}

    def put(tree_path, value):
        node = params
        for k in tree_path[:-1]:
            node = node.setdefault(k, {})
        node[tree_path[-1]] = value

    for key in data.files:
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue  # classifier head / aux tower: not in the pool3 graph
        tail2 = ".".join(parts[-2:])
        if tail2 == "conv.weight":
            # OIHW -> HWIO
            w = np.transpose(data[key], (2, 3, 1, 0)).astype(np.float32)
            put((*parts[:-2], "kernel"), w)
        elif tail2 in _BN_MAP:
            if parts[-1] == "num_batches_tracked":
                continue
            put((*parts[:-2], _BN_MAP[tail2]), data[key].astype(np.float32))
        elif parts[-1] == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized inception key: {key}")
    return {"params": params}


def prepare_images(x, dtype=jnp.float32):
    """NHWC [-1,1] any-size -> 299x299 [-1,1] (bilinear, the FID protocol)."""
    x = x.astype(dtype)
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear")
    return jnp.clip(x, -1.0, 1.0)


class FeatureAccumulator:
    """Streaming pool3-feature extraction: ``add()`` images one at a time
    (HWC uint8 or [-1,1] float, gray or RGB; mixed sizes are host-resized
    to the first image's size, then batch-resized to 299 on device),
    keeping only one image batch + the (N, 2048) features in memory.
    ``result()`` flushes and returns the feature matrix."""

    def __init__(self, apply, variables, batch):
        self._apply = apply
        self._variables = variables
        self._batch = max(1, int(batch))
        self._buf = []
        self._feats = []
        self._shape = None  # HWC of the first image = the batch shape

    def add(self, im):
        im = np.asarray(im)
        if im.dtype == np.uint8:
            im = im.astype(np.float32) / 127.5 - 1.0
        if im.ndim == 2:
            im = im[..., None]
        if im.shape[-1] == 1:
            im = np.repeat(im, 3, axis=-1)
        im = im.astype(np.float32)
        if self._shape is None:
            self._shape = im.shape
        elif im.shape != self._shape:
            from PIL import Image

            th, tw = self._shape[:2]
            u8 = np.clip((im + 1.0) * 127.5, 0, 255).astype(np.uint8)
            im = np.asarray(
                Image.fromarray(u8).resize((tw, th), Image.BILINEAR),
                np.float32) / 127.5 - 1.0
        self._buf.append(im)
        if len(self._buf) == self._batch:
            self._flush()

    def _flush(self):
        n = len(self._buf)
        if n == 0:
            return
        chunk = np.stack(self._buf, axis=0)
        if n < self._batch:  # pad to the compiled batch shape
            chunk = np.concatenate(
                [chunk, np.zeros((self._batch - n, *chunk.shape[1:]),
                                 chunk.dtype)], axis=0)
        self._feats.append(
            np.asarray(self._apply(self._variables, jnp.asarray(chunk)))[:n])
        self._buf.clear()

    def result(self):
        self._flush()
        if not self._feats:
            return np.zeros((0, 2048), np.float32)
        return np.concatenate(self._feats, axis=0)


def make_feature_accumulators(weights, fid_variant=True, batch=8,
                              dtype=jnp.float32):
    """Load weights + jit once; returns a zero-arg factory of
    FeatureAccumulator instances sharing that compiled extractor.

    ``weights``: path to a converted .npz (pth_convert.convert_inception),
    or the literal string ``"random"`` for random-init features (pipeline
    tests only — any FID from these is meaningless, and we say so loudly).
    """
    model = InceptionPool3(fid_variant=fid_variant, dtype=dtype)
    if weights == "random":
        print("WARNING: FID/KID over RANDOM-INIT inception features — "
              "numbers are meaningless; supply --inception_weights "
              "(converted via dsgan_tpu.utils.pth_convert convert_inception)")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32))
    else:
        variables = load_torchvision_npz(weights)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    apply = jax.jit(lambda v, x: model.apply(v, prepare_images(x)))
    return lambda: FeatureAccumulator(apply, variables, batch)


def make_feature_fn(weights, fid_variant=True, batch=8, dtype=jnp.float32):
    """Build `extract(images) -> (N, 2048) np.ndarray` over an iterable
    of images (see FeatureAccumulator for accepted formats)."""
    new_acc = make_feature_accumulators(weights, fid_variant, batch, dtype)

    def extract(images):
        acc = new_acc()
        for im in images:
            acc.add(im)
        return acc.result()

    return extract
