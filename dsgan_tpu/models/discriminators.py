"""Discriminator zoo (reference DSGAN/models/networks.py:533-699).

All NHWC flax modules returning raw logits (optionally sigmoid'd when the
recipe selects a no_lsgan + sigmoid discriminator, matching
use_sigmoid=opt.no_lsgan in pix2pix_model.py:98).
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from dsgan_tpu import ops
from dsgan_tpu.models.layers import Conv, Norm, leaky_relu, norm_uses_bias


class NLayerDiscriminator(nn.Module):
    """PatchGAN (reference networks.py:533-579). With ndf=32 and a
    conditional 6-channel 256^2 input this yields 30x30 patch logits."""

    ndf: int = 32
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        use_bias = norm_uses_bias(self.norm)
        kw, padw = 4, 1

        h = Conv(self.ndf, kw, 2, padw, dtype=self.dtype, name="conv0")(x)
        h = leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = Conv(self.ndf * nf_mult, kw, 2, padw, bias=use_bias,
                     dtype=self.dtype, name=f"conv{n}")(h)
            h = Norm(self.norm, name=f"norm{n}")(h, train)
            h = leaky_relu(h, 0.2)

        nf_mult = min(2**self.n_layers, 8)
        h = Conv(self.ndf * nf_mult, kw, 1, padw, bias=use_bias,
                 dtype=self.dtype, name=f"conv{self.n_layers}")(h)
        h = Norm(self.norm, name=f"norm{self.n_layers}")(h, train)
        h = leaky_relu(h, 0.2)

        h = Conv(1, kw, 1, padw, dtype=self.dtype, name="conv_out")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h.astype(in_dtype)


class PixelDiscriminator(nn.Module):
    """1x1-conv per-pixel discriminator (reference networks.py:634-656)."""

    ndf: int = 32
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        use_bias = norm_uses_bias(self.norm)
        h = Conv(self.ndf, 1, dtype=self.dtype, name="conv0")(x)
        h = leaky_relu(h, 0.2)
        h = Conv(self.ndf * 2, 1, bias=use_bias, dtype=self.dtype, name="conv1")(h)
        h = Norm(self.norm, name="norm1")(h, train)
        h = leaky_relu(h, 0.2)
        h = Conv(1, 1, bias=use_bias, dtype=self.dtype, name="conv2")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h.astype(in_dtype)


class _NLayerMulti(nn.Module):
    """Per-scale sub-discriminator of the multiscale D (reference
    networks.py:582-631; note its padding is ceil(3/2)=2, not 1)."""

    ndf: int = 32
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw, padw = 4, 2
        h = Conv(self.ndf, kw, 2, padw, dtype=self.dtype, name="conv0")(x)
        h = leaky_relu(h, 0.2)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv(nf, kw, 2, padw, dtype=self.dtype, name=f"conv{n}")(h)
            h = Norm(self.norm, name=f"norm{n}")(h, train)
            h = leaky_relu(h, 0.2)
        nf = min(nf * 2, 512)
        h = Conv(nf, kw, 1, padw, dtype=self.dtype, name=f"conv{self.n_layers}")(h)
        h = Norm(self.norm, name=f"norm{self.n_layers}")(h, train)
        h = leaky_relu(h, 0.2)
        h = Conv(1, kw, 1, padw, dtype=self.dtype, name="conv_out")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        return h


class MultiscaleDiscriminator(nn.Module):
    """num_D=3 pyramid of PatchGANs over AvgPool(3,2,1,count_include_pad=
    False) downsampled inputs (reference networks.py:659-699). Returns a
    list of [logits] per scale, finest-input scale processed by the
    highest-index sub-D first, matching the reference's ordering."""

    ndf: int = 32
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    num_d: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        result = []
        h = x
        for i in range(self.num_d):
            d = _NLayerMulti(self.ndf, self.n_layers, self.norm, self.use_sigmoid,
                             dtype=self.dtype, name=f"scale{self.num_d - 1 - i}")
            result.append([d(h, train).astype(in_dtype)])
            if i != self.num_d - 1:
                h = ops.avg_pool2d(h, 3, stride=2, padding=1, count_include_pad=False)
        return result
