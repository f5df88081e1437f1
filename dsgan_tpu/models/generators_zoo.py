"""Alternate generators selectable via --which_model_netG (reference
networks.py define_G dispatch, :81-113): resnet_9blocks / resnet_6blocks /
unet_128 / unet_256 / gll (pix2pixHD-style global+local) / cascaded (CRN).

All NHWC flax modules. The reference's `cascaded.forward` is missing its
return statement (networks.py:881) — a pure defect; here it returns its
final conv (documented deviation).
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from dsgan_tpu import ops
from dsgan_tpu.models.layers import Conv, ConvTranspose, Norm, PReLU, leaky_relu, norm_uses_bias


def _pad(x, padding_type, p):
    if padding_type == "reflect":
        return ops.reflect_pad2d(x, p)
    if padding_type == "replicate":
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    raise NotImplementedError(f"padding [{padding_type}] is not implemented")


class ResnetBlock(nn.Module):
    """Johnson-style residual block, PReLU variant (networks.py:403-442)."""

    norm: str = "instance"
    use_dropout: bool = False
    padding_type: str = "reflect"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = x.shape[-1]
        use_bias = norm_uses_bias(self.norm)
        h = _pad(x, self.padding_type, 1)
        h = Conv(dim, 3, bias=use_bias, dtype=self.dtype, name="conv1")(h)
        h = Norm(self.norm, name="norm1")(h, train)
        h = PReLU(name="prelu")(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _pad(h, self.padding_type, 1)
        h = Conv(dim, 3, bias=use_bias, dtype=self.dtype, name="conv2")(h)
        h = Norm(self.norm, name="norm2")(h, train)
        return x + h


class ResnetGenerator(nn.Module):
    """resnet_6blocks / resnet_9blocks (networks.py:215-262)."""

    output_nc: int = 3
    ngf: int = 32
    n_blocks: int = 9
    norm: str = "instance"
    use_dropout: bool = False
    padding_type: str = "reflect"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        use_bias = norm_uses_bias(self.norm)
        h = ops.reflect_pad2d(x, 3)
        h = Conv(self.ngf, 7, bias=use_bias, dtype=self.dtype, name="conv_in")(h)
        h = Norm(self.norm, name="norm_in")(h, train)
        h = PReLU(name="prelu_in")(h)

        n_down = 2
        for i in range(n_down):
            mult = 2**i
            h = Conv(self.ngf * mult * 2, 3, 2, 1, bias=use_bias,
                     dtype=self.dtype, name=f"down{i}")(h)
            h = Norm(self.norm, name=f"down_norm{i}")(h, train)
            h = PReLU(name=f"down_prelu{i}")(h)

        for i in range(self.n_blocks):
            h = ResnetBlock(self.norm, self.use_dropout, self.padding_type,
                            dtype=self.dtype, name=f"block{i}")(h, train)

        for i in range(n_down):
            mult = 2 ** (n_down - i)
            h = ConvTranspose(self.ngf * mult // 2, 3, 2, 1, 1, use_bias=use_bias,
                              dtype=self.dtype, name=f"up{i}")(h)
            h = Norm(self.norm, name=f"up_norm{i}")(h, train)
            h = PReLU(name=f"up_prelu{i}")(h)

        h = ops.reflect_pad2d(h, 3)
        h = Conv(self.output_nc, 7, dtype=self.dtype, name="conv_out")(h)
        return jnp.tanh(h).astype(in_dtype)


class UnetGenerator(nn.Module):
    """unet_128 (num_downs=7) / unet_256 (num_downs=8), networks.py:449-472.

    Implemented iteratively (encoder list + decoder list) — clearer than
    the reference's recursive wrapper and identical in structure:
      enc channels: ngf, 2ngf, 4ngf, 8ngf, 8ngf, ..., 8ngf   (num_downs)
      innermost has no norm after downconv; dropout on the 8ngf middle
      levels when enabled.
    """

    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 32
    norm: str = "instance"
    use_dropout: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        use_bias = norm_uses_bias(self.norm)
        ngf = self.ngf
        enc_ch = [ngf, ngf * 2, ngf * 4] + [ngf * 8] * (self.num_downs - 3)

        skips = []
        h = x
        for i, ch in enumerate(enc_ch):
            if i == 0:
                h = Conv(ch, 4, 2, 1, bias=use_bias, dtype=self.dtype, name=f"down{i}")(h)
            else:
                h = leaky_relu(h, 0.2)
                # Reference parity (networks.py:491 + 529): downrelu is an
                # INPLACE LeakyReLU, so it mutates the tensor the block
                # later concatenates as the skip — the u-net skip carries
                # the POST-relu activation, not the raw block input.
                skips[i - 1] = h
                h = Conv(ch, 4, 2, 1, bias=use_bias, dtype=self.dtype, name=f"down{i}")(h)
                if i != len(enc_ch) - 1:  # innermost level has no down-norm
                    h = Norm(self.norm, name=f"down_norm{i}")(h, train)
            skips.append(h)

        # decoder: innermost first
        dec_out_ch = list(reversed([self.output_nc] + enc_ch[:-1]))
        for j, ch in enumerate(dec_out_ch):
            i = len(enc_ch) - 1 - j  # matching encoder level
            outermost = i == 0
            innermost = j == 0
            h = PReLU(name=f"up_prelu{i}")(h)
            h = ConvTranspose(ch, 4, 2, 1, 0,
                              use_bias=use_bias or outermost,
                              dtype=self.dtype, name=f"up{i}")(h)
            if outermost:
                h = jnp.tanh(h)
                break
            h = Norm(self.norm, name=f"up_norm{i}")(h, train)
            # dropout applies to the middle 8ngf levels (not innermost),
            # matching UnetGenerator's use_dropout placement
            if self.use_dropout and not innermost and ch == ngf * 8:
                h = nn.Dropout(0.5, deterministic=not train)(h)
            h = jnp.concatenate([skips[i - 1], h], axis=-1)
        return h.astype(in_dtype)


class ResnetBlockGLL(nn.Module):
    """pix2pixHD residual block (networks.py:360-399)."""

    norm: str = "instance"
    padding_type: str = "reflect"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = x.shape[-1]
        h = _pad(x, self.padding_type, 1)
        h = Conv(dim, 3, dtype=self.dtype, name="conv1")(h)
        h = Norm(self.norm, name="norm1")(h, train)
        h = PReLU(name="prelu")(h)
        h = _pad(h, self.padding_type, 1)
        h = Conv(dim, 3, dtype=self.dtype, name="conv2")(h)
        h = Norm(self.norm, name="norm2")(h, train)
        return x + h


class GlobalGenerator(nn.Module):
    """pix2pixHD global net (networks.py:327-357). ``truncated`` drops the
    final [pad, conv, tanh] triple — the LocalEnhancer consumes that form."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "instance"
    truncated: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ops.reflect_pad2d(x, 3)
        h = Conv(self.ngf, 7, dtype=self.dtype, name="conv_in")(h)
        h = Norm(self.norm, name="norm_in")(h, train)
        h = PReLU(name="prelu_in")(h)
        for i in range(self.n_downsampling):
            mult = 2**i
            h = Conv(self.ngf * mult * 2, 3, 2, 1, dtype=self.dtype, name=f"down{i}")(h)
            h = Norm(self.norm, name=f"down_norm{i}")(h, train)
            h = PReLU(name=f"down_prelu{i}")(h)
        for i in range(self.n_blocks):
            h = ResnetBlockGLL(self.norm, dtype=self.dtype, name=f"block{i}")(h, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTranspose(self.ngf * mult // 2, 3, 2, 1, 1,
                              dtype=self.dtype, name=f"up{i}")(h)
            h = Norm(self.norm, name=f"up_norm{i}")(h, train)
            h = PReLU(name=f"up_prelu{i}")(h)
        if self.truncated:
            return h
        h = ops.reflect_pad2d(h, 3)
        h = Conv(self.output_nc, 7, dtype=self.dtype, name="conv_out")(h)
        return jnp.tanh(h)


class LocalEnhancer(nn.Module):
    """The 'gll' generator (networks.py:265-324): truncated GlobalGenerator
    on a 2x-downsampled pyramid + one local enhancer branch."""

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm: str = "instance"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        n_le = self.n_local_enhancers

        pyramid = [x]
        for _ in range(n_le):
            pyramid.append(
                ops.avg_pool2d(pyramid[-1], 3, stride=2, padding=1, count_include_pad=False)
            )

        ngf_global = self.ngf * (2**n_le)
        out = GlobalGenerator(
            self.output_nc, ngf_global, self.n_downsample_global,
            self.n_blocks_global, self.norm, truncated=True,
            dtype=self.dtype, name="global",
        )(pyramid[-1], train)

        for n in range(1, n_le + 1):
            ngf_l = self.ngf * (2 ** (n_le - n))
            inp = pyramid[n_le - n]
            h = ops.reflect_pad2d(inp, 3)
            h = Conv(ngf_l, 7, dtype=self.dtype, name=f"le{n}_conv_in")(h)
            h = Norm(self.norm, name=f"le{n}_norm_in")(h, train)
            h = PReLU(name=f"le{n}_prelu_in")(h)
            h = Conv(ngf_l * 2, 3, 2, 1, dtype=self.dtype, name=f"le{n}_down")(h)
            h = Norm(self.norm, name=f"le{n}_down_norm")(h, train)
            h = PReLU(name=f"le{n}_down_prelu")(h)

            h = h + out
            for i in range(self.n_blocks_local):
                h = ResnetBlockGLL(self.norm, dtype=self.dtype, name=f"le{n}_block{i}")(h, train)
            h = ConvTranspose(ngf_l, 3, 2, 1, 1, dtype=self.dtype, name=f"le{n}_up")(h)
            h = Norm(self.norm, name=f"le{n}_up_norm")(h, train)
            h = PReLU(name=f"le{n}_up_prelu")(h)
            if n == n_le:
                h = ops.reflect_pad2d(h, 3)
                h = Conv(self.output_nc, 7, dtype=self.dtype, name=f"le{n}_conv_out")(h)
                h = jnp.tanh(h)
            out = h
        return out.astype(in_dtype)


class _CascadeLayerNorm(nn.Module):
    """The cascaded net's whole-sample LayerNorm (networks.py:703-725):
    normalizes by mean/std over ALL dims per sample (std with Bessel
    correction, eps added to std), learnable per-channel affine."""

    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = x.shape[1] * x.shape[2] * x.shape[3]
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.sum(jnp.square(xf - mean), axis=(1, 2, 3), keepdims=True) / (n - 1)
        y = (xf - mean) / (jnp.sqrt(var) + self.eps)
        return (gamma * y + beta).astype(x.dtype)


class CascadedGenerator(nn.Module):
    """CRN-style cascaded refinement net (networks.py:728-881), fixed to
    actually return its output."""

    output_nc: int = 3
    ngf: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        pyramid = [x]
        for _ in range(6):
            pyramid.append(ops.avg_pool2d(pyramid[-1], 2, stride=2))
        # pyramid[i] has size /2^i ; start at /64 (level 6)
        widths = [16, 16, 8, 4, 2, 1]
        h = None
        for li, w_mult in enumerate(widths):
            level_in = pyramid[6 - li]
            inp = level_in if h is None else jnp.concatenate([h, level_in], axis=-1)
            h = Conv(self.ngf * w_mult, 3, 1, 1, dtype=self.dtype, name=f"conv{li}a")(inp)
            h = _CascadeLayerNorm(name=f"ln{li}a")(h)
            h = leaky_relu(h, 0.2)
            h = Conv(self.ngf * w_mult, 3, 1, 1, dtype=self.dtype, name=f"conv{li}b")(h)
            h = _CascadeLayerNorm(name=f"ln{li}b")(h)
            h = leaky_relu(h, 0.2)
            tgt = pyramid[5 - li].shape[1:3]
            h = ops.upsample_bilinear(h, tgt)
        h = jnp.concatenate([h, pyramid[0]], axis=-1)
        h = Conv(self.output_nc, 3, 1, 1, dtype=self.dtype, name="conv_out")(h)
        return h.astype(in_dtype)
