"""The reference's orphaned building blocks, rebuilt as working modules.

Reference networks.py:948-1130 (ChannelAttention / SpatialAttention /
cbam_block, UnetPlusPlus, ResDecoderBlockCBAM, ConvD/N/U blocks) and
networks_wnet.py (wnet, FENNet) are dead code there — never reachable
from define_G/define_D — but they are part of the component inventory
(SURVEY §2.1 rows "Dead blocks" and "wnet"). Rebuilt here as NHWC flax
modules with converted-weight forward parity vs the IMPORTED reference
classes (tests/test_blocks_extra.py), and exposed through define_G under
the extension names ``unetpp`` and ``wnet`` (documented as extensions —
the reference's dispatch cannot reach them).

ConvC_Block (networks.py:926-946) is broken by construction in the
reference — it concatenates k1/k3/k5/k7 conv outputs that all use
padding=1 and therefore have four different spatial sizes (verified to
raise in torch; tests/test_blocks_extra.py). ``ConvCBlock`` below
rebuilds the evident intent: 'same' padding (k//2) per branch so the
concat is well-formed; everything else (four parallel convs, channel
concat, norm, LeakyReLU) is the reference computation.

Reference quirks kept for parity:
* UnetPlusPlus's forward applies conv1_2/att1_2 twice and never uses its
  conv1_4/att1_4 layers (networks.py:1066-1067) — the dead params are
  not created here; weight sharing reproduces the actual computation.
* wnet shares ONE PReLU instance (one learnable slope) across all eleven
  stages (networks_wnet.py:9) — mirrored by calling a single module.
* torch ``nn.LeakyReLU()`` default slope is 0.01 (not the 0.2 used by
  the discriminators) — these blocks use the 0.01 default.
* FENNet defines layers but no forward (networks_wnet.py:53-66); the
  evident pipeline stage_1 -> pool -> wnet is implemented and documented
  as an extension.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsgan_tpu import ops
from dsgan_tpu.models.layers import Conv, ConvTranspose, Norm, PReLU, leaky_relu


class ChannelAttentionCBAM(nn.Module):
    """cbam ChannelAttention (networks.py:948-965): shared 1x1 MLP with a
    PReLU over global-avg and global-max pooled descriptors, sigmoid sum."""

    ratio: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = Conv(c // self.ratio, 1, bias=False, dtype=self.dtype, name="fc1")
        fc2 = Conv(c, 1, bias=False, dtype=self.dtype, name="fc2")
        act = PReLU(name="relu1")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(act(fc1(avg))) + fc2(act(fc1(mx)))
        return jax.nn.sigmoid(out)


class SpatialAttentionCBAM(nn.Module):
    """cbam SpatialAttention (networks.py:967-981): conv over the
    [channel-mean, channel-max] map pair, sigmoid gate."""

    kernel_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.kernel_size not in (3, 7):
            raise ValueError("kernel size must be 3 or 7")
        pad = 3 if self.kernel_size == 7 else 1
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=-1)
        h = Conv(1, self.kernel_size, padding=pad, bias=False,
                 dtype=self.dtype, name="conv1")(h)
        return jax.nn.sigmoid(h)


class CBAMBlock(nn.Module):
    """cbam_block (networks.py:983-992): channel gate then spatial gate."""

    ratio: int = 8
    kernel_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x * ChannelAttentionCBAM(self.ratio, dtype=self.dtype,
                                     name="channelattention")(x)
        x = x * SpatialAttentionCBAM(self.kernel_size, dtype=self.dtype,
                                     name="spatialattention")(x)
        return x


class ConvDBlock(nn.Module):
    """ConvD_Block (networks.py:883-898): conv+IN+lrelu, maxpool2,
    conv3+IN+lrelu. (The reference passes in_channels to the norm — benign
    with affine-free InstanceNorm, whose num_features is unused.)"""

    out_channels: int
    kernel: int = 3
    pad: int = 1
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv(self.out_channels, self.kernel, padding=self.pad,
                 dtype=self.dtype, name="conv1")(x)
        h = Norm(self.norm, name="norm1")(h, train)
        h = leaky_relu(h, 0.01)
        h = ops.max_pool2d(h, 2)
        h = Conv(self.out_channels, 3, padding=1, dtype=self.dtype,
                 name="conv2")(h)
        h = Norm(self.norm, name="norm2")(h, train)
        return leaky_relu(h, 0.01)


class ConvNBlock(nn.Module):
    """ConvN_Block (networks.py:900-911): conv3+IN+lrelu."""

    out_channels: int
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv(self.out_channels, 3, padding=1, dtype=self.dtype,
                 name="conv1")(x)
        h = Norm(self.norm, name="norm1")(h, train)
        return leaky_relu(h, 0.01)


class ConvUBlock(nn.Module):
    """ConvU_Block (networks.py:913-924): deconv4 s2 p1 + IN + lrelu."""

    out_channels: int
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ConvTranspose(self.out_channels, 4, 2, 1, 0, dtype=self.dtype,
                          name="deconv")(x)
        h = Norm(self.norm, name="norm1")(h, train)
        return leaky_relu(h, 0.01)


class ConvCBlock(nn.Module):
    """ConvC_Block (networks.py:926-946), repaired: four parallel convs
    k1/k3/k5/k7 -> channel concat (4*out_channels) -> norm -> lrelu.

    The reference gives every branch padding=1, so the branch outputs are
    H+2/H/H-2/H-4 and the concat raises — dead code that could never have
    run. The repair is the minimal one: 'same' padding (k//2) per branch,
    which is the only choice that makes the written concat well-formed."""

    out_channels: int
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = [
            Conv(self.out_channels, k, padding=k // 2, dtype=self.dtype,
                 name=f"conv{k}")(x)
            for k in (1, 3, 5, 7)
        ]
        h = jnp.concatenate(outs, axis=-1)
        h = Norm(self.norm, name="norm1")(h, train)
        return leaky_relu(h, 0.01)


class UnetPlusPlus(nn.Module):
    """UnetPlusPlus (networks.py:995-1071): CBAM-gated 3-level encoder/
    decoder with a parallel full-resolution refinement branch. Channel
    widths are hard-coded in the reference (64/128/256); `ngf` scales them
    (ngf=64 is the reference layout)."""

    output_nc: int = 3
    ngf: int = 64
    norm: str = "instance"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        w = self.ngf
        h = ops.reflect_pad2d(x, 3)
        c21 = CBAMBlock(dtype=self.dtype, name="att2_1")(
            ConvDBlock(w, 7, 0, self.norm, self.dtype, name="conv2_1")(h, train))
        c31 = CBAMBlock(dtype=self.dtype, name="att3_1")(
            ConvDBlock(w * 2, 3, 1, self.norm, self.dtype, name="conv3_1")(c21, train))
        c41 = CBAMBlock(dtype=self.dtype, name="att4_1")(
            ConvDBlock(w * 4, 3, 1, self.norm, self.dtype, name="conv4_1")(c31, train))
        c42 = CBAMBlock(dtype=self.dtype, name="att4_2")(
            ConvNBlock(w * 4, self.norm, self.dtype, name="conv4_2")(c41, train))
        c43 = CBAMBlock(dtype=self.dtype, name="att4_3")(
            ConvUBlock(w * 2, self.norm, self.dtype, name="conv4_3")(c42, train))
        c32 = CBAMBlock(dtype=self.dtype, name="att3_2")(
            ConvNBlock(w * 2, self.norm, self.dtype, name="conv3_2")(c31, train))
        c33 = CBAMBlock(dtype=self.dtype, name="att3_3")(
            ConvUBlock(w, self.norm, self.dtype, name="conv3_3")(c32 + c43, train))
        c22 = CBAMBlock(dtype=self.dtype, name="att2_2")(
            ConvNBlock(w, self.norm, self.dtype, name="conv2_2")(c21, train))
        c23 = CBAMBlock(1, dtype=self.dtype, name="att2_3")(
            ConvUBlock(self.output_nc, self.norm, self.dtype,
                       name="conv2_3")(c22 + c33, train))
        # full-res branch: conv1_2/att1_2 applied TWICE (the reference's
        # conv1_4/att1_4 params are dead — networks.py:1066-1067)
        conv1_2 = ConvNBlock(self.output_nc, self.norm, self.dtype, name="conv1_2")
        att1_2 = CBAMBlock(1, dtype=self.dtype, name="att1_2")
        c12 = att1_2(conv1_2(x, train))
        c14 = att1_2(conv1_2(c12, train))
        out = Conv(self.output_nc, 3, padding=1, dtype=self.dtype,
                   name="conv")(c23 + c14)
        return out.astype(in_dtype)


class ResDecoderBlockCBAM(nn.Module):
    """ResDecoderBlockCBAM (networks.py:1103-1130): two reflect-padded
    CBAM-gated conv stages plus a 1x1 shortcut."""

    planes: int
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        inplanes = x.shape[-1]
        h = ops.reflect_pad2d(x, 1)
        h = Conv(inplanes, 3, dtype=self.dtype, name="conv1")(h)
        h = Norm(self.norm, name="norm1")(h, train)
        h = leaky_relu(h, 0.01)
        h = CBAMBlock(dtype=self.dtype, name="cbam1")(h)
        r = ops.reflect_pad2d(h, 1)
        r = Conv(self.planes, 3, dtype=self.dtype, name="conv2")(r)
        r = Norm(self.norm, name="norm2")(r, train)
        r = leaky_relu(r, 0.01)
        r = CBAMBlock(dtype=self.dtype, name="cbam2")(r)
        s = Conv(self.planes, 1, dtype=self.dtype, name="shortcut")(x)
        s = Norm(self.norm, name="norm_s")(s, train)
        s = leaky_relu(s, 0.01)
        return r + s


class WNet(nn.Module):
    """wnet (networks_wnet.py:4-51): W-shaped conv net — a 3-level
    encoder-decoder pass followed by a second pass with dense additive
    skips into the first pass's feature maps. Maps C-channel input back
    to C channels; ``width`` is the base feature width (the reference's
    ``output_nc`` constructor arg). One PReLU slope is shared across all
    stages (reference quirk)."""

    width: int
    norm: str = "batch"  # reference default norm_layer=nn.BatchNorm2d
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_nc = x.shape[-1]
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        w = self.width
        act = PReLU(name="activate")  # ONE shared learnable slope

        def cnb(h, ch, name):
            h = Conv(ch, 3, padding=1, dtype=self.dtype, name=name + "_conv")(h)
            h = Norm(self.norm, name=name + "_norm")(h, train)
            return act(h)

        def tnb(h, ch, name):
            h = ConvTranspose(ch, 4, 2, 1, 0, dtype=self.dtype,
                              name=name + "_deconv")(h)
            h = Norm(self.norm, name=name + "_norm")(h, train)
            return act(h)

        e11 = cnb(x, w, "en_down_1_1")
        e21 = cnb(ops.max_pool2d(e11, 2), w * 2, "en_down_2_1")
        e31 = cnb(ops.max_pool2d(e21, 2), w * 4, "en_down_3_1")
        eu22 = tnb(e31, w * 2, "en_up_2_2") + e21
        eu12 = tnb(eu22, w, "en_up_1_2") + e11
        d11 = cnb(eu12, w, "de_down_1_1") + e11
        d21 = cnb(ops.max_pool2d(d11, 2), w * 2, "de_down_2_1") + e21 + eu22
        d31 = cnb(ops.max_pool2d(d21, 2), w * 4, "de_down_3_1") + e31
        du22 = tnb(d31, w * 2, "de_up_2_2") + d21 + e21 + eu22
        du12 = tnb(du22, w, "de_up_1_2") + e11 + eu12 + d11
        return cnb(du12, in_nc, "de_up_1_3").astype(in_dtype)


class FENNet(nn.Module):
    """FENNet (networks_wnet.py:53-66). The reference defines stage_1
    (reflect-pad 7x7 stem + 3x3 conv, both norm+PReLU), an overlapping
    avg-pool, and a wnet(64,128) — but no forward; the evident pipeline
    stage_1 -> pool -> wnet is implemented here (extension). Output is
    64 channels at half resolution (a feature-extraction front end, not
    an image generator). The stem hard-codes 3 input / 64 output channels
    like the reference."""

    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ops.reflect_pad2d(x.astype(self.dtype or x.dtype), 3)
        h = Conv(64, 7, dtype=self.dtype, name="stage1_conv1")(h)
        h = Norm(self.norm, name="stage1_norm1")(h, train)
        h = PReLU(name="stage1_prelu1")(h)
        h = Conv(64, 3, padding=1, dtype=self.dtype, name="stage1_conv2")(h)
        h = Norm(self.norm, name="stage1_norm2")(h, train)
        h = PReLU(name="stage1_prelu2")(h)
        h = ops.avg_pool2d(h, 3, stride=2, padding=1, count_include_pad=False)
        return WNet(128, self.norm, self.dtype, name="wnet")(h, train)
