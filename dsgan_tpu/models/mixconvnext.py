"""MixConvNeXtML — the DS-GAN dual-stream generator, TPU-native.

Re-designed from the behavior of reference
DSGAN/models/model/MixConvNeXtML.py (structure cited per block below),
not translated: everything is NHWC (so the reference Block's
NCHW->NHWC permute dance disappears — channels-last is simply the native
layout), pointwise MLPs are Dense ops that XLA tiles onto the MXU, and
the depthwise 7x7/9x9 convs are the Pallas-fusion targets.

Streams:
  * Global: ConvNeXt-style U-Net, encoder 64->1024 over 256^2->16^2 with
    dense cross-scale "downSkip" projections summed into each decoder
    input (reference MixConvNeXtML.py:428-494).
  * Local: OriginMLKA mini U-Net of multi-kernel (3/5/7/9) grouped-conv
    blocks with CBAM channel attention (reference :76-189).
  * Fusion: 3x3 conv over (global + local); output is UNBOUNDED — the
    reference has no final tanh (:492-494) and recipes depend on that.
"""

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsgan_tpu import ops
from dsgan_tpu.models.layers import (
    Conv, ConvTranspose, Dense, PReLU, gelu,
)


class ChannelAttention(nn.Module):
    """CBAM channel gate (reference CA, MixConvNeXtML.py:5-22)."""

    ratio: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        fc1 = Conv(dim // self.ratio, 1, bias=False, dtype=self.dtype, name="fc1")
        fc2 = Conv(dim, 1, bias=False, dtype=self.dtype, name="fc2")
        act = PReLU(name="relu1")
        avg_out = fc2(act(fc1(ops.adaptive_avg_pool(x))))
        max_out = fc2(act(fc1(ops.adaptive_max_pool(x))))
        return nn.sigmoid(avg_out + max_out)


class _DenseParams(nn.Module):
    """Raw Dense-layout params ({kernel, bias}) so fused and XLA block
    paths share one checkpoint-compatible tree."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        from dsgan_tpu.models.layers import normal02, zeros

        k = self.param("kernel", normal02, (self.in_features, self.features), jnp.float32)
        b = self.param("bias", zeros, (self.features,), jnp.float32)
        return k, b


class _Conv1x1Params(nn.Module):
    """Raw 1x1-Conv kernel param (HWIO, no bias), checkpoint-compatible
    with the previous nn.Conv 'shortcut' submodule."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        from dsgan_tpu.models.layers import normal02

        return self.param(
            "kernel", normal02, (1, 1, self.in_features, self.features), jnp.float32
        )


class ConvNeXtBlock(nn.Module):
    """Reference Block (MixConvNeXtML.py:203-243): 1x1 shortcut +
    [dw7x7 -> IN -> Dense(4d) -> GELU -> Dense(plans)].

    On TPU in bf16 with tanh-flavor GELU, the whole post-dwconv body runs
    as ONE fused Pallas kernel (pallas.block_core, custom fwd+bwd): the
    4*dim hidden never touches HBM. The XLA path below is the fallback
    (f32 runs, exact-erf GELU, CPU, and shapes the kernel's VMEM gate
    rejects) and the numerical reference for its parity tests."""

    plans: int
    dtype: Any = None
    # forward-only builds skip the fused Pallas path: its win is the fused
    # backward; at pure inference it loses to XLA (18.6 vs 11.5 ms full-G
    # at 512^2 b1 on v5e)
    inference: bool = False

    @nn.compact
    def __call__(self, x, x2=None):
        from dsgan_tpu.models.layers import _GELU_MODE
        from dsgan_tpu.pallas import (
            block_core2_in, block_core_fits, block_core_in,
            pallas_enabled, pallas_interpret,
        )

        # Two-argument form (decoder skip-concat elimination): the block
        # input is semantically concat(x, x2) and the parameter layout is
        # identical to the one-input block on that concat — but every
        # consumer is channel-separable (dwconv, IN stats, K-split GEMMs),
        # so on the fused path the 2C-wide tensor never exists in HBM.
        c1 = x.shape[-1]
        dim = c1 + (x2.shape[-1] if x2 is not None else 0)
        dtype = self.dtype or x.dtype
        w1, b1 = _DenseParams(4 * dim, dim, name="pwconv1")()
        w2, b2 = _DenseParams(self.plans, 4 * dim, name="pwconv2")()
        wsc = _Conv1x1Params(self.plans, dim, name="shortcut")()

        tanh_gelu = _GELU_MODE == "tanh" or (
            _GELU_MODE == "auto" and dtype == jnp.bfloat16
        )
        hw = x.shape[1] * x.shape[2]
        use_fused = (
            not self.inference
            and (pallas_enabled() or pallas_interpret())
            and dtype == jnp.bfloat16
            and tanh_gelu
            and dim >= 32
            and hw % 128 == 0
            and block_core_fits(hw, dim, 4 * dim, self.plans)
        )
        # The split pays only when BOTH parts fill the 128-wide vector
        # lanes: at uc4 (64+64 @256^2) the two half-width depthwise convs
        # and narrow GEMMs run at half lane utilization and LOSE 9.2 ms
        # fwd+bwd vs the concat path (tools/split_probe.py, v5e b16);
        # at 128+128/256+256 the split wins (uc3 10.45 -> 9.93 ms).
        split = (
            x2 is not None
            and use_fused
            and min(c1, dim - c1) >= 128
        )
        if x2 is not None and not split:
            # the non-split path consumes the concat exactly as the
            # one-input block would (single dwconv; same param tree)
            x = jnp.concatenate([x.astype(dtype), x2.astype(dtype)], axis=-1)
            x2 = None

        if dim <= 8:
            assert x2 is None, "split inputs are a decoder path (dim >= 128)"
            # Small-channel depthwise conv (c1: dim=3): XLA's feature-
            # grouped lowering is catastrophic at tiny C (26.2 ms fwd+bwd
            # at 16x256^2x3 on v5e). Preferred path: space-to-depth dense
            # conv (ops.dw_conv_s2d, f=4 -> 48 packed channels) — the
            # earlier diagonal-masked dense conv at the ORIGINAL width was
            # 3.0 ms but still ran N=3 output lanes. Params stay in the
            # grouped layout (checkpoint-identical).
            kdw, bdw = _DWParams(7, dim, name="dwconv")()
            if x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
                h = ops.dw_conv_s2d(
                    x.astype(dtype), kdw[:, :, 0, :].astype(dtype),
                    bdw.astype(dtype), 7, 4,
                )
            else:
                eye = jnp.eye(dim, dtype=kdw.dtype)[None, None]
                wd = eye * kdw[:, :, 0, :][:, :, None, :]
                wd, bd = jax.lax.optimization_barrier(
                    (wd.astype(dtype), bdw.astype(dtype))
                )
                h = ops.conv2d(x.astype(dtype), wd, bd, stride=1, padding=3)
        elif split:
            # per-part depthwise convs with the concat-layout params sliced:
            # dw(concat(a,b)) == concat(dw_a(a), dw_b(b))
            kdw, bdw = _DWParams(7, dim, name="dwconv")()
            kdw = kdw.astype(dtype)
            bdw = bdw.astype(dtype)
            h = ops.conv2d(x.astype(dtype), kdw[..., :c1], bdw[:c1],
                           stride=1, padding=3, groups=c1)
            h2 = ops.conv2d(x2.astype(dtype), kdw[..., c1:], bdw[c1:],
                            stride=1, padding=3, groups=dim - c1)
        else:
            h = Conv(dim, 7, padding=3, groups=dim, dtype=dtype, name="dwconv")(x)

        xc = x.astype(dtype)
        if use_fused:
            if split:
                return block_core2_in(
                    h.astype(dtype), h2.astype(dtype),
                    xc, x2.astype(dtype),
                    w1.astype(dtype), b1.astype(dtype),
                    w2.astype(dtype), b2.astype(dtype),
                    wsc[0, 0].astype(dtype),
                    pallas_interpret(),
                )
            return block_core_in(
                h.astype(dtype), xc,
                w1.astype(dtype), b1.astype(dtype),
                w2.astype(dtype), b2.astype(dtype),
                wsc[0, 0].astype(dtype),
                pallas_interpret(),
            )
        sc = ops.conv2d(xc, wsc.astype(dtype))
        hn = ops.instance_norm(h).astype(dtype)
        hn = hn @ w1.astype(dtype) + b1.astype(dtype)
        hn = gelu(hn)
        hn = hn @ w2.astype(dtype) + b2.astype(dtype)
        return sc + hn


class UpBlock(nn.Module):
    """Reference upSample (MixConvNeXtML.py:48-66): ConvT(3,2,1,1) + IN +
    GELU, then channel-concat the encoder skip.

    split=True returns the (upsampled, skip) pair UNconcatenated for
    consumers that are channel-separable (the decoder's two-input
    ConvNeXtBlock) — the concat is pure HBM traffic there."""

    features: int
    dtype: Any = None
    split: bool = False

    @nn.compact
    def __call__(self, x, skip):
        h = ConvTranspose(self.features, 3, 2, 1, 1, dtype=self.dtype, name="deconv")(x)
        h = gelu(ops.instance_norm(h))
        if self.split:
            return h, skip
        out = jnp.concatenate([h, skip], axis=-1)
        if _upblock_barrier_enabled():
            # Materialize the concat (identical values — barrier only blocks
            # fusion): without this, XLA fuses the concat (a pad+maximum
            # kLoop) INTO every consuming depthwise-conv thunk of the
            # MidMLKA bank that follows (fwd, dW), knocking them off the
            # fast emitters — the round-5 thunk audit measured upc3 fwd
            # 6.37 ms / dW 6.81 ms in-step at ~20 GB/s, ~1 TF/s vs
            # 1.14 / 2.17 ms isolated with materialized inputs
            # (docs/PERF.md "Per-thunk in-step audit"). Same pathology and
            # same cure as the bank-kernel barrier in MidMLKA.
            import jax as _jax

            out = _jax.lax.optimization_barrier(out)
        return out


class DownProject(nn.Module):
    """One downSkip projection (MixConvNeXtML.py:328-426): maxpool(scale)
    -> 1x1 conv (no bias) -> IN -> GELU.

    pool=False takes an already-pooled input (the cascaded pyramid below)
    — the parameter tree is identical either way (pooling is param-free)."""

    features: int
    scale: int
    dtype: Any = None
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        h = ops.max_pool2d(x, self.scale) if self.pool else x
        h = Conv(self.features, 1, bias=False, dtype=self.dtype, name="proj")(h)
        return gelu(ops.instance_norm(h))


def _pool_cascade_enabled():
    import os

    return os.environ.get("DSGAN_POOL_CASCADE", "1") == "1"


def _upblock_barrier_enabled():
    import os

    return os.environ.get("DSGAN_UPBLOCK_BARRIER", "1") == "1"


def _pool_pyramid(x, max_scale):
    """Cascaded disjoint-window max pyramid: pyr[s] == max_pool2d(x, s)
    elementwise (max over non-overlapping windows composes exactly; only
    argmax tie-breaking in the gradient can differ). The whole family
    costs one full-res pass plus a geometric tail, and — the real win —
    the backward runs ONE select_and_scatter per level instead of one
    full-res select_and_scatter per consumer: the four down64_to* pools
    alone spent ~3.4 ms/step of select_and_scatter before this
    (xprof attribution, docs/PERF.md)."""
    pyr = {1: x}
    s = 1
    while s < max_scale:
        pyr[2 * s] = ops.max_pool2d(pyr[s], 2)
        s *= 2
    return pyr


class _DWParams(nn.Module):
    """Parameter holder matching a depthwise Conv's tree (kernel+bias) so
    the fused multi-kernel bank below keeps checkpoint compatibility with
    the unfused per-group convs."""

    k: int
    feats: int

    @nn.compact
    def __call__(self):
        from dsgan_tpu.models.layers import normal02, zeros

        kern = self.param("kernel", normal02, (self.k, self.k, 1, self.feats), jnp.float32)
        bias = self.param("bias", zeros, (self.feats,), jnp.float32)
        return kern, bias


class MidMLKA(nn.Module):
    """Reference MidMLKA (MixConvNeXtML.py:76-117): channel-split into 4
    groups -> depthwise conv k3/5/7/9 -> concat -> 1x1 -> channel-attention
    gate -> IN -> residual -> GELU.

    TPU note (fuse_bank=True, the default): the four per-group convs run
    on dim/4 channels (as low as 8) — catastrophic lane utilization. They
    are algebraically one depthwise conv whose per-channel kernel is the
    group's kernel zero-padded to 9x9, so we run ONE full-width depthwise
    conv instead; parameters remain per-group (checkpoint-identical)."""

    dtype: Any = None
    fuse_bank: bool = True

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        q = dim // 4
        banks = [
            _DWParams(k, q, name=f"X{k}")() for k in (3, 5, 7, 9)
        ]
        if self.fuse_bank:
            kmax = 9
            kerns = []
            biases = []
            for (kern, bias), k in zip(banks, (3, 5, 7, 9)):
                p = (kmax - k) // 2
                kerns.append(jnp.pad(kern, ((p, p), (p, p), (0, 0), (0, 0))))
                biases.append(bias)
            wk = jnp.concatenate(kerns, axis=-1).astype(x.dtype)   # (9,9,1,dim)
            bk = jnp.concatenate(biases).astype(x.dtype)
            import jax as _jax
            from dsgan_tpu import ops as _ops

            if dim <= 32 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                # space-to-depth dense-conv path (ops.dw_conv_s2d): the
                # mid32 bank at 32ch/128^2 runs 4.56 -> 3.05 ms f+b (v5e
                # b16); params stay banked (checkpoint-identical)
                out = _ops.dw_conv_s2d(x, wk[:, :, 0, :], bk, 9, 2)
            else:
                # Materialize the assembled kernel before the conv: without
                # this barrier XLA fuses the pad+concat INTO the convolution
                # and its lowering falls off the fast depthwise path
                # (measured 6.5 ms vs 1.14 ms at 128ch/128^2/b16 on v5e).
                wk, bk = _jax.lax.optimization_barrier((wk, bk))
                out = _ops.conv2d(x, wk, bk, stride=1, padding=kmax // 2, groups=dim)
                # NOTE (r3, measured): an optimization_barrier on `out`
                # (to keep the tail out of the conv thunk) is NEUTRAL
                # in-step (132.74 vs 132.84 ms device) — the bank conv's
                # in-step excess vs its isolated cost (6.4 vs 2.5 ms at
                # upc3) is memory-space/scheduling, not output fusion.
                # See docs/PERF.md "closed experiments".
        else:
            xs = jnp.split(x, 4, axis=-1)
            outs = []
            for (kern, bias), k, xi in zip(banks, (3, 5, 7, 9), xs):
                from dsgan_tpu import ops as _ops

                outs.append(
                    _ops.conv2d(
                        xi, kern.astype(xi.dtype), bias.astype(xi.dtype),
                        stride=1, padding=k // 2, groups=q,
                    )
                )
            out = jnp.concatenate(outs, axis=-1)
        out = Conv(dim, 1, dtype=self.dtype, name="conv")(out)
        gate = ChannelAttention(dtype=self.dtype, name="attn")(out)
        # Gated InstanceNorm without materializing out*gate: the CBAM gate
        # is a POSITIVE per-(b,c) scalar g, and InstanceNorm statistics of
        # g*out are (g*mean, g^2*var), so
        #     IN(out*g) = (out - mean) * g * rsqrt(g^2*var + eps)
        # — algebraically identical (incl. the eps interaction the gate
        # survives through), but needs only out's own stats and ONE fused
        # elementwise pass instead of gate-mul + second stats + normalize.
        gf = gate[:, 0, 0, :].astype(jnp.float32)
        xf = out.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2))
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(mean), 0.0
        )
        s = gf * jax.lax.rsqrt(jnp.square(gf) * var + 1e-5)
        scale = s[:, None, None, :].astype(out.dtype)
        shift = (mean * s)[:, None, None, :].astype(out.dtype)
        return gelu(out * scale - shift + x)


class OriginMLKA(nn.Module):
    """The local stream (reference OriginMLKA, MixConvNeXtML.py:119-189)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d1 = Conv(32, 1, bias=False, dtype=self.dtype, name="to32")(x)
        d2 = MidMLKA(dtype=self.dtype, name="mid32")(ops.max_pool2d(d1, 2))
        d3 = Conv(64, 1, bias=False, dtype=self.dtype, name="to64")(d2)
        d4 = MidMLKA(dtype=self.dtype, name="mid64")(ops.max_pool2d(d3, 2))
        d5 = Conv(128, 1, bias=False, dtype=self.dtype, name="to128")(d4)
        d6 = MidMLKA(dtype=self.dtype, name="mid128")(ops.max_pool2d(d5, 2))
        d7 = Conv(256, 1, bias=False, dtype=self.dtype, name="to256")(d6)
        d8 = MidMLKA(dtype=self.dtype, name="mid256")(ops.max_pool2d(d7, 2))

        u1 = UpBlock(128, dtype=self.dtype, name="up1")(d8, d6)
        u1 = Conv(128, 1, bias=False, dtype=self.dtype, name="upc1_proj")(u1)
        u1 = MidMLKA(dtype=self.dtype, name="upc1")(u1)
        u2 = MidMLKA(dtype=self.dtype, name="upc2")(UpBlock(64, dtype=self.dtype, name="up2")(u1, d4))
        u3 = MidMLKA(dtype=self.dtype, name="upc3")(UpBlock(64, dtype=self.dtype, name="up3")(u2, d3))
        u4 = ConvTranspose(64, 3, 2, 1, 1, dtype=self.dtype, name="up4")(u3)
        u4 = ops.instance_norm(u4)

        sc = Conv(64, 1, bias=False, dtype=self.dtype, name="shortcut")(x)
        sc = ops.instance_norm(sc)
        return gelu(u4 + sc)


class MixConvNeXtML(nn.Module):
    """The full dual-stream generator (reference MixConvNeXtML.py:428-494).

    Input/output: NHWC, H and W divisible by 16. Output is unbounded
    (no tanh), matching the reference.
    """

    dtype: Any = jnp.bfloat16
    remat: Any = False  # rematerialize Blocks: trades ~1 extra forward
    #                     of each Block for most of the G residual memory
    #                     (enables larger batches / 512^2-class inputs).
    #                     False | True (save nothing) | "dots" (save matmul
    #                     outputs, recompute the IN/GELU/elementwise chains
    #                     — the bytes-for-flops trade for an HBM-bound step)
    inference: bool = False  # forward-only build: disables the train-only
    #                          fused Pallas block path (see ConvNeXtBlock)

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        x = x.astype(self.dtype or x.dtype)
        dt = self.dtype
        import functools as _ft

        if self.remat == "dots":
            import jax as _jax

            _B = nn.remat(
                ConvNeXtBlock,
                policy=_jax.checkpoint_policies.dots_saveable,
            )
        elif self.remat:
            _B = nn.remat(ConvNeXtBlock)
        else:
            _B = ConvNeXtBlock
        Block = _ft.partial(_B, inference=self.inference)

        # -- global stream encoder + dense cross-scale skips (the downSkip
        # family projects every encoder level to every deeper decoder
        # scale). Each encoder level's pools — the stride-2 encoder pool
        # AND all its downSkip pools — share one cascaded max pyramid
        # (_pool_pyramid): same values, one select_and_scatter per level
        # in the backward instead of one per consumer.
        cas = _pool_cascade_enabled()

        def _skips(r, pyramid_max, name, specs):
            pyr = _pool_pyramid(r, pyramid_max) if cas else None
            d = [
                DownProject(c, s, dtype=dt, pool=not cas,
                            name=f"{name}_to{s}")(pyr[s] if cas else r)
                for c, s in specs
            ]
            pooled2 = pyr[2] if cas else ops.max_pool2d(r, 2)
            return d, pooled2

        r1 = Block(64, dtype=dt, name="c1")(x)
        d64, p1 = _skips(r1, 16, "down64",
                         ((128, 2), (256, 4), (512, 8), (1024, 16)))
        r2 = Block(128, dtype=dt, name="c2")(p1)
        d128, p2 = _skips(r2, 8, "down128",
                          ((256, 2), (512, 4), (1024, 8)))
        r3 = Block(256, dtype=dt, name="c3")(p2)
        d256, p3 = _skips(r3, 4, "down256", ((512, 2), (1024, 4)))
        r4 = Block(512, dtype=dt, name="c4")(p3)
        d512, p4 = _skips(r4, 2, "down512", ((1024, 2),))
        r5 = Block(1024, dtype=dt, name="c5")(p4)

        # -- decoder with skip fusion: UpBlock hands the (upsampled, skip)
        # pair to the two-input ConvNeXtBlock unconcatenated — on the fused
        # TPU path the 2C-wide concat never exists in HBM (see ConvNeXtBlock)
        o1 = Block(512, dtype=dt, name="uc1")(
            *UpBlock(512, dtype=dt, split=True, name="u1")(r5 + d64[3] + d128[2] + d256[1] + d512[0], r4)
        )
        o2 = Block(256, dtype=dt, name="uc2")(
            *UpBlock(256, dtype=dt, split=True, name="u2")(o1 + d64[2] + d128[1] + d256[0], r3)
        )
        o3 = Block(128, dtype=dt, name="uc3")(
            *UpBlock(128, dtype=dt, split=True, name="u3")(o2 + d64[1] + d128[0], r2)
        )
        o4 = Block(64, dtype=dt, name="uc4")(
            *UpBlock(64, dtype=dt, split=True, name="u4")(o3 + d64[0], r1)
        )

        # -- local stream + fusion
        loc = OriginMLKA(dtype=dt, name="local")(x)
        # plain conv, NOT ops.conv2d_lanefix: the s2d-packed dx wins 1.8 ms
        # isolated but LOSES 1.9 ms in the full step (device 141.35 vs
        # 139.46 ms A/B) — the packing reshapes block fusion. Closed
        # experiment, docs/PERF.md.
        out = Conv(3, 3, padding=1, dtype=dt, name="res")(o4 + loc)
        return out.astype(in_dtype)
