"""Fused ConvNeXt-Block core (InstanceNorm-apply -> MLP -> +shortcut) as a
Pallas TPU kernel pair with a custom VJP.

The reference Block body (MixConvNeXtML.py:230-243) after its depthwise
conv is, per pixel row r of an NHWC feature map flattened to (M, C):

    out[r] = gelu((h[r] - mean)*rsig @ W1 + b1) @ W2 + b2  +  x[r] @ Ws

XLA materializes the normalized tensor, the 4C-wide hidden, the GELU
output, and the shortcut in HBM — ~6 full-tensor round trips; at the
decoder's 256^2 blocks the hidden alone is 0.5 GB/step. The profiled
train step is HBM-bandwidth-bound (92 GB accessed / 153 ms at batch 16 =
~70% of v5e's 819 GB/s), so these round trips ARE the step time; the MXU
sits at ~15%. This kernel keeps everything per row-tile in VMEM:

  forward:  grid (B, M/TM); per step DMA h,x tiles in, compute the
            normalize+MLP+shortcut chain on-core, DMA the out tile back.
            HBM traffic: read h,x once, write out once.
  backward: same grid; recomputes the hidden from h (cheap on the idle
            MXU), produces dn (norm-output cotangent), dx, and
            accumulates dW1/db1/dW2/db2/dWs in persistent f32 VMEM
            blocks across the sequential TPU grid, plus the per-(b,c)
            sums S1=sum(dn), S2=sum(dn*(h-mean)) that the caller folds
            into the InstanceNorm-statistics cotangents.

The custom_vjp boundary is the norm-apply+MLP only: `mean`/`rsig` are
ordinary differentiable inputs, so XLA's autodiff of the (cheap) stats
reductions composes with the kernel's S1/S2 instead of this file
re-deriving the full InstanceNorm backward.

GELU is the tanh approximation computed on the bf16 hidden — identical
flavor to the framework's bf16 training configuration (models/layers.py
set_gelu_mode); the XLA fallback path stays in ConvNeXtBlock for f32 /
exact-GELU runs (torch golden parity uses that path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715


def _fwd_vmem(tm, c, h4, p, hc):
    return (
        2 * (2 * tm * c * 2)          # h, x tiles (double-buffered)
        + 2 * (tm * p * 2)            # out tile
        + (c * h4 + h4 + h4 * p + p + c * p) * 2  # weights bf16
        + 2 * c * 4 * 2               # stats rows
        + tm * hc * 4 * 2             # hidden chunk f32 + gelu temp
        + tm * p * 4                  # f32 accumulator
        + tm * c * 4                  # normalized tile
    )


def _bwd_vmem(tm, c, h4, p, hc):
    return (
        2 * (2 * tm * c * 2 + tm * p * 2)   # h, x, g tiles
        + 2 * (2 * tm * c * 2)              # dn, dx tiles
        + (c * h4 + h4 * p + c * p + h4) * 4  # persistent f32 param grads
        + (h4 + p + 4 * c) * 4              # db1, db2, s1, s2
        + (c * h4 + h4 + h4 * p + c * p) * 2  # weights bf16
        + tm * hc * 4 * 4                   # h1/tanh/da/dg1 chunks f32
        + tm * c * 4 * 2                    # f32 dn acc + (h-mean)
    )


def _pick_tm(m_per_image, est, budget=14 * 1024 * 1024):
    for tm in (2048, 1024, 512, 256, 128):
        if m_per_image % tm != 0:
            continue
        if est(tm) <= budget:
            return tm
    return None


def block_core_fits(hw, c, h4, p):
    """Static gate: True if both kernels fit VMEM at some tile size.

    Also requires the hidden width to split evenly into the kernels'
    VMEM chunks (hc = min(h4, 1024)): the chunk loops iterate
    ``h4 // hc`` times, so a remainder would be silently dropped."""
    hc = min(h4, 1024)
    if h4 % hc != 0:
        return False
    tf = _pick_tm(hw, lambda tm: _fwd_vmem(tm, c, h4, p, hc))
    tb = _pick_tm(hw, lambda tm: _bwd_vmem(tm, c, h4, p, hc))
    return tf is not None and tb is not None


def _fwd_kernel(mean_ref, rsig_ref, h_ref, x_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, ws_ref, o_ref, *, hc):
    # NOTE: elementwise math deliberately in f32 — a bf16-internal variant
    # was measured SLOWER on v5e (fwd 3.43 vs 3.36 ms, fwd+bwd 15.1 vs
    # 12.8 ms at the 256^2 decoder shape): the VPU runs bf16 at f32 rate
    # and the extra casts are pure overhead.
    mean = mean_ref[0, 0, :]
    rsig = rsig_ref[0, 0, :]
    a = ((h_ref[0].astype(jnp.float32) - mean) * rsig).astype(h_ref.dtype)
    acc = jnp.dot(x_ref[0], ws_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b2_ref[0, :].astype(jnp.float32)
    h4 = w1_ref.shape[1]
    for i in range(h4 // hc):
        sl = slice(i * hc, (i + 1) * hc)
        h1 = jnp.dot(a, w1_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[0, sl].astype(jnp.float32)
        g = jax.nn.gelu(h1.astype(h_ref.dtype), approximate=True)
        acc = acc + jnp.dot(g, w2_ref[sl, :], preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(mean_ref, rsig_ref, h_ref, x_ref, g_ref, w1_ref, b1_ref,
                w2_ref, ws_ref,
                dn_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dws_ref,
                s1_ref, s2_ref, *, hc):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    first = jnp.logical_and(bi == 0, ti == 0)

    @pl.when(first)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dws_ref[...] = jnp.zeros_like(dws_ref)

    @pl.when(ti == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    mean = mean_ref[0, 0, :]
    rsig = rsig_ref[0, 0, :]
    hm = h_ref[0].astype(jnp.float32) - mean          # (TM, C) f32
    a = (hm * rsig).astype(h_ref.dtype)               # normalized
    g = g_ref[0]                                      # (TM, P) cotangent

    # shortcut branch
    dx_ref[0] = jax.lax.dot_general(
        g, ws_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    dws_ref[...] += jax.lax.dot_general(
        x_ref[0], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    h4 = w1_ref.shape[1]
    dn = jnp.zeros(hm.shape, jnp.float32)
    for i in range(h4 // hc):
        sl = slice(i * hc, (i + 1) * hc)
        h1 = jnp.dot(a, w1_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[0, sl].astype(jnp.float32)
        # ONE tanh serves both the recomputed gelu value and its analytic
        # grad: gelu(x) = 0.5 x (1 + th). (jax.nn.gelu here would evaluate
        # a SECOND tanh — the bwd kernel is VPU-bound and tanh dominates.)
        u = _SQRT_2_OVER_PI * (h1 + _GELU_C * h1 * h1 * h1)
        th = jnp.tanh(u)
        ag = (0.5 * h1 * (1.0 + th)).astype(h_ref.dtype)
        dgelu = 0.5 * (1.0 + th) + 0.5 * h1 * (1.0 - th * th) * (
            _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * h1 * h1)
        )
        da = jax.lax.dot_general(
            g, w2_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (TM, HC)
        dg1 = da * dgelu
        dg1_b = dg1.astype(h_ref.dtype)
        dw2_ref[sl, :] += jax.lax.dot_general(
            ag, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[0, sl] += jnp.sum(dg1, axis=0)
        dw1_ref[:, sl] += jax.lax.dot_general(
            a, dg1_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dn = dn + jax.lax.dot_general(
            dg1_b, w1_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dn_ref[0] = dn.astype(dn_ref.dtype)
    s1_ref[0] += jnp.sum(dn, axis=0, keepdims=True)
    s2_ref[0] += jnp.sum(dn * hm, axis=0, keepdims=True)


def _fwd_impl(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret):
    b, hh, ww, c = h.shape
    p = w2.shape[1]
    h4 = w1.shape[1]
    hc = min(h4, 1024)
    assert h4 % hc == 0, "hidden width must divide into VMEM chunks (gate with fits())"
    hw = hh * ww
    tm = _pick_tm(hw, lambda tm: _fwd_vmem(tm, c, h4, p, hc))
    assert tm is not None, "shape too large for fused block kernel (gate with fits())"
    hm = h.reshape(b, hw, c)
    xm = x.reshape(b, hw, c)
    kern = functools.partial(_fwd_kernel, hc=hc)
    out = pl.pallas_call(
        kern,
        grid=(b, hw // tm),
        in_specs=[
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, h4), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, p), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ws
        ],
        out_specs=pl.BlockSpec(
            (1, tm, p), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, p), h.dtype),
        interpret=interpret,
    )(mean.reshape(b, 1, c), rsig.reshape(b, 1, c), hm, xm,
      w1, b1.reshape(1, h4), w2, b2.reshape(1, p), ws)
    return out.reshape(b, hh, ww, p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def block_core(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret=False):
    """Fused normalize+MLP+shortcut.

    h, x: (B, H, W, C) activations (h = dwconv output, x = block input).
    mean, rsig: (B, C) f32 InstanceNorm statistics of h over (H, W).
    w1 (C,4C) b1 (4C,) w2 (4C,P) b2 (P,) ws (C,P), all in compute dtype.
    Returns (B, H, W, P).
    """
    return _fwd_impl(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret)


def _vjp_fwd(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret):
    out = _fwd_impl(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret)
    return out, (h, x, mean, rsig, w1, b1, w2, b2, ws)


def _bwd_impl(h, x, mean, rsig, w1, b1, w2, b2, ws, g, interpret):
    b, hh, ww, c = h.shape
    p = w2.shape[1]
    h4 = w1.shape[1]
    hc = min(h4, 1024)
    assert h4 % hc == 0, "hidden width must divide into VMEM chunks (gate with fits())"
    hw = hh * ww
    tm = _pick_tm(hw, lambda tm: _bwd_vmem(tm, c, h4, p, hc))
    assert tm is not None, "shape too large for fused block kernel (gate with fits())"
    hm = h.reshape(b, hw, c)
    xm = x.reshape(b, hw, c)
    gm = g.reshape(b, hw, p)
    kern = functools.partial(_bwd_kernel, hc=hc)
    row = lambda bi, ti: (bi, ti, 0)
    stat = lambda bi, ti: (bi, 0, 0)
    whole = lambda bi, ti: (0, 0)
    dn, dx, dw1, db1, dw2, db2, dws, s1, s2 = pl.pallas_call(
        kern,
        grid=(b, hw // tm),
        in_specs=[
            pl.BlockSpec((1, 1, c), stat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), stat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, p), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, h4), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ws
        ],
        out_specs=[
            pl.BlockSpec((1, tm, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h4), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h4), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((h4, p), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, p), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), stat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), stat, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), h.dtype),      # dn
            jax.ShapeDtypeStruct((b, hw, c), x.dtype),      # dx
            jax.ShapeDtypeStruct((c, h4), jnp.float32),     # dW1
            jax.ShapeDtypeStruct((1, h4), jnp.float32),     # db1
            jax.ShapeDtypeStruct((h4, p), jnp.float32),     # dW2
            jax.ShapeDtypeStruct((1, p), jnp.float32),      # db2
            jax.ShapeDtypeStruct((c, p), jnp.float32),      # dWs
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),   # S1
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),   # S2
        ],
        interpret=interpret,
    )(mean.reshape(b, 1, c), rsig.reshape(b, 1, c), hm, xm, gm,
      w1, b1.reshape(1, h4), w2, ws)
    return (
        dn.reshape(b, hh, ww, c),
        dx.reshape(b, hh, ww, c),
        dw1.astype(w1.dtype),
        db1.reshape(h4).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(p).astype(b2.dtype),
        dws.astype(ws.dtype),
        s1.reshape(b, c),
        s2.reshape(b, c),
    )


def _vjp_bwd(interpret, res, g):
    h, x, mean, rsig, w1, b1, w2, b2, ws = res
    b, hh, ww, c = h.shape
    dn4, dx, dw1, db1, dw2, db2, dws, s1, s2 = _bwd_impl(
        h, x, mean, rsig, w1, b1, w2, b2, ws, g, interpret
    )
    # h cotangent holding the statistics fixed; the mean/rsig cotangents
    # below let the caller's autodiff of instance_stats supply the rest.
    dh = dn4 * rsig[:, None, None, :].astype(h.dtype)
    dmean = -rsig * s1
    drsig = s2
    return (dh, dx, dmean.astype(mean.dtype), drsig.astype(rsig.dtype),
            dw1, db1, dw2, db2, dws)


block_core.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def block_core_in(h, x, w1, b1, w2, b2, ws, interpret=False):
    """Fused InstanceNorm+MLP+shortcut with the FULL IN backward folded in.

    Same kernels as `block_core`, but the statistics are computed (and
    differentiated) inside this op: the backward combines the kernel's
    S1/S2 reductions into the closed-form InstanceNorm cotangent

        dh = rsig*(dn - S1/HW) - rsig^3*S2/HW * (h - mean)

    as ONE bf16 elementwise pass — no f32 broadcast sweeps from XLA's
    autodiff of the statistics. This is the entry the model uses; the
    stats-as-inputs `block_core` remains for compositional parity tests.
    """
    from dsgan_tpu.ops.norm import instance_stats

    mean, rsig = instance_stats(h)
    return _fwd_impl(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret)


def _in_vjp_fwd(h, x, w1, b1, w2, b2, ws, interpret):
    from dsgan_tpu.ops.norm import instance_stats

    mean, rsig = instance_stats(h)
    out = _fwd_impl(h, x, mean, rsig, w1, b1, w2, b2, ws, interpret)
    return out, (h, x, mean, rsig, w1, b1, w2, b2, ws)


def _in_vjp_bwd(interpret, res, g):
    h, x, mean, rsig, w1, b1, w2, b2, ws = res
    b, hh, ww, c = h.shape
    hw = hh * ww
    dn4, dx, dw1, db1, dw2, db2, dws, s1, s2 = _bwd_impl(
        h, x, mean, rsig, w1, b1, w2, b2, ws, g, interpret
    )
    dh = _in_fold(dn4, h, mean, rsig, s1, s2, hw)
    return (dh, dx, dw1, db1, dw2, db2, dws)


block_core_in.defvjp(_in_vjp_fwd, _in_vjp_bwd)


def block_core_reference(h, x, mean, rsig, w1, b1, w2, b2, ws):
    """XLA reference (same math/gelu flavor) for parity tests."""
    a = ((h.astype(jnp.float32) - mean[:, None, None, :])
         * rsig[:, None, None, :]).astype(h.dtype)
    h1 = (jnp.dot(a, w1.astype(jnp.float32)).astype(jnp.float32)
          + b1.astype(jnp.float32)).astype(h.dtype)
    g = jax.nn.gelu(h1, approximate=True)
    out = (jnp.dot(g, w2.astype(jnp.float32)) + b2.astype(jnp.float32)
           + jnp.dot(x, ws.astype(jnp.float32)))
    return out.astype(h.dtype)


# ---------------------------------------------------------------------------
# Two-input variant: decoder skip-concat elimination.
#
# The decoder's UpBlock ends in channel-concat(h_up, skip) and the following
# ConvNeXtBlock consumes the 2C-wide tensor. Concat/split of 256^2-class
# activations are pure HBM round trips (~5 ms/step at uc4 alone). Because
# every consumer of the concat is channel-separable —
#   * depthwise conv:   dw(concat(a,b)) = concat(dw_a(a), dw_b(b))
#   * InstanceNorm:     per-channel stats = stats of each part
#   * MLP / shortcut:   concat(a,b) @ W  = a @ W[:C1] + b @ W[C1:]
# — the fused block kernel can take the TWO parts unconcatenated (K-split
# GEMMs; weight slices prepared at trace time) and the backward emits
# dx1/dx2 (and the two norm cotangents) directly, so neither direction ever
# materializes the 2C-wide tensor in HBM. Same math as block_core_in on
# concat(h_a,h_b)/concat(x_a,x_b); parameters keep the concatenated layout
# (checkpoint-identical to the single-input block).
# ---------------------------------------------------------------------------


def block_core2_fits(hw, c1, c2, h4, p):
    """Static gate for the two-input kernels (same budgets; c = c1 + c2)."""
    return block_core_fits(hw, c1 + c2, h4, p)


def _fwd_kernel2(ma_ref, ra_ref, mb_ref, rb_ref, ha_ref, hb_ref,
                 xa_ref, xb_ref, w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
                 wsa_ref, wsb_ref, o_ref, *, hc):
    a1 = ((ha_ref[0].astype(jnp.float32) - ma_ref[0, 0, :])
          * ra_ref[0, 0, :]).astype(ha_ref.dtype)
    a2 = ((hb_ref[0].astype(jnp.float32) - mb_ref[0, 0, :])
          * rb_ref[0, 0, :]).astype(hb_ref.dtype)
    acc = jnp.dot(xa_ref[0], wsa_ref[...], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xb_ref[0], wsb_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b2_ref[0, :].astype(jnp.float32)
    h4 = w1a_ref.shape[1]
    for i in range(h4 // hc):
        sl = slice(i * hc, (i + 1) * hc)
        h1 = jnp.dot(a1, w1a_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + jnp.dot(a2, w1b_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[0, sl].astype(jnp.float32)
        g = jax.nn.gelu(h1.astype(ha_ref.dtype), approximate=True)
        acc = acc + jnp.dot(g, w2_ref[sl, :], preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel2(ma_ref, ra_ref, mb_ref, rb_ref, ha_ref, hb_ref,
                 xa_ref, xb_ref, g_ref, w1a_ref, w1b_ref, b1_ref, w2_ref,
                 wsa_ref, wsb_ref,
                 dna_ref, dnb_ref, dxa_ref, dxb_ref, dw1a_ref, dw1b_ref,
                 db1_ref, dw2_ref, db2_ref, dwsa_ref, dwsb_ref,
                 s1a_ref, s2a_ref, s1b_ref, s2b_ref, *, hc):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    first = jnp.logical_and(bi == 0, ti == 0)

    @pl.when(first)
    def _():
        dw1a_ref[...] = jnp.zeros_like(dw1a_ref)
        dw1b_ref[...] = jnp.zeros_like(dw1b_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dwsa_ref[...] = jnp.zeros_like(dwsa_ref)
        dwsb_ref[...] = jnp.zeros_like(dwsb_ref)

    @pl.when(ti == 0)
    def _():
        s1a_ref[...] = jnp.zeros_like(s1a_ref)
        s2a_ref[...] = jnp.zeros_like(s2a_ref)
        s1b_ref[...] = jnp.zeros_like(s1b_ref)
        s2b_ref[...] = jnp.zeros_like(s2b_ref)

    hma = ha_ref[0].astype(jnp.float32) - ma_ref[0, 0, :]
    hmb = hb_ref[0].astype(jnp.float32) - mb_ref[0, 0, :]
    a1 = (hma * ra_ref[0, 0, :]).astype(ha_ref.dtype)
    a2 = (hmb * rb_ref[0, 0, :]).astype(hb_ref.dtype)
    g = g_ref[0]

    # shortcut branch, per part
    dxa_ref[0] = jax.lax.dot_general(
        g, wsa_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dxa_ref.dtype)
    dxb_ref[0] = jax.lax.dot_general(
        g, wsb_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dxb_ref.dtype)
    dwsa_ref[...] += jax.lax.dot_general(
        xa_ref[0], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwsb_ref[...] += jax.lax.dot_general(
        xb_ref[0], g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    h4 = w1a_ref.shape[1]
    dna = jnp.zeros(hma.shape, jnp.float32)
    dnb = jnp.zeros(hmb.shape, jnp.float32)
    for i in range(h4 // hc):
        sl = slice(i * hc, (i + 1) * hc)
        h1 = jnp.dot(a1, w1a_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + jnp.dot(a2, w1b_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[0, sl].astype(jnp.float32)
        # one tanh for both value and grad (see _bwd_kernel)
        u = _SQRT_2_OVER_PI * (h1 + _GELU_C * h1 * h1 * h1)
        th = jnp.tanh(u)
        ag = (0.5 * h1 * (1.0 + th)).astype(ha_ref.dtype)
        dgelu = 0.5 * (1.0 + th) + 0.5 * h1 * (1.0 - th * th) * (
            _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * h1 * h1)
        )
        da = jax.lax.dot_general(
            g, w2_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dg1 = da * dgelu
        dg1_b = dg1.astype(ha_ref.dtype)
        dw2_ref[sl, :] += jax.lax.dot_general(
            ag, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[0, sl] += jnp.sum(dg1, axis=0)
        dw1a_ref[:, sl] += jax.lax.dot_general(
            a1, dg1_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw1b_ref[:, sl] += jax.lax.dot_general(
            a2, dg1_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dna = dna + jax.lax.dot_general(
            dg1_b, w1a_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dnb = dnb + jax.lax.dot_general(
            dg1_b, w1b_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dna_ref[0] = dna.astype(dna_ref.dtype)
    dnb_ref[0] = dnb.astype(dnb_ref.dtype)
    s1a_ref[0] += jnp.sum(dna, axis=0, keepdims=True)
    s2a_ref[0] += jnp.sum(dna * hma, axis=0, keepdims=True)
    s1b_ref[0] += jnp.sum(dnb, axis=0, keepdims=True)
    s2b_ref[0] += jnp.sum(dnb * hmb, axis=0, keepdims=True)


def _fwd2_impl(ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, b2, ws, interpret):
    b, hh, ww, c1 = ha.shape
    c2 = hb.shape[-1]
    c = c1 + c2
    p = w2.shape[1]
    h4 = w1.shape[1]
    hc = min(h4, 1024)
    assert h4 % hc == 0, "hidden width must divide into VMEM chunks (gate with fits())"
    hw = hh * ww
    tm = _pick_tm(hw, lambda tm: _fwd_vmem(tm, c, h4, p, hc))
    assert tm is not None, "shape too large for fused block kernel (gate with fits())"
    # weight K-splits at trace time (tiny slices of resident params)
    w1a, w1b = w1[:c1], w1[c1:]
    wsa, wsb = ws[:c1], ws[c1:]
    kern = functools.partial(_fwd_kernel2, hc=hc)
    row_a = pl.BlockSpec((1, tm, c1), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM)
    row_b = pl.BlockSpec((1, tm, c2), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM)
    stat_a = pl.BlockSpec((1, 1, c1), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM)
    stat_b = pl.BlockSpec((1, 1, c2), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, hw // tm),
        in_specs=[
            stat_a, stat_a, stat_b, stat_b,
            row_a, row_b, row_a, row_b,
            whole, whole,  # w1a, w1b
            pl.BlockSpec((1, h4), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            whole,  # w2
            pl.BlockSpec((1, p), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            whole, whole,  # wsa, wsb
        ],
        out_specs=pl.BlockSpec(
            (1, tm, p), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, p), ha.dtype),
        interpret=interpret,
    )(ma.reshape(b, 1, c1), ra.reshape(b, 1, c1),
      mb.reshape(b, 1, c2), rb.reshape(b, 1, c2),
      ha.reshape(b, hw, c1), hb.reshape(b, hw, c2),
      xa.reshape(b, hw, c1), xb.reshape(b, hw, c2),
      w1a, w1b, b1.reshape(1, h4), w2, b2.reshape(1, p), wsa, wsb)
    return out.reshape(b, hh, ww, p)


def _bwd2_impl(ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, ws, g, interpret):
    b, hh, ww, c1 = ha.shape
    c2 = hb.shape[-1]
    c = c1 + c2
    p = w2.shape[1]
    h4 = w1.shape[1]
    hc = min(h4, 1024)
    assert h4 % hc == 0, "hidden width must divide into VMEM chunks (gate with fits())"
    hw = hh * ww
    tm = _pick_tm(hw, lambda tm: _bwd_vmem(tm, c, h4, p, hc))
    assert tm is not None, "shape too large for fused block kernel (gate with fits())"
    w1a, w1b = w1[:c1], w1[c1:]
    wsa, wsb = ws[:c1], ws[c1:]
    kern = functools.partial(_bwd_kernel2, hc=hc)
    row_a = pl.BlockSpec((1, tm, c1), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM)
    row_b = pl.BlockSpec((1, tm, c2), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM)
    row_g = pl.BlockSpec((1, tm, p), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM)
    stat_a = pl.BlockSpec((1, 1, c1), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM)
    stat_b = pl.BlockSpec((1, 1, c2), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM)
    whole2 = lambda shape: pl.BlockSpec(shape, lambda bi, ti: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(b, hw // tm),
        in_specs=[
            stat_a, stat_a, stat_b, stat_b,
            row_a, row_b, row_a, row_b, row_g,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1a
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1b
            pl.BlockSpec((1, h4), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wsa
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wsb
        ],
        out_specs=[
            row_a, row_b, row_a, row_b,             # dna, dnb, dxa, dxb
            whole2((c1, h4)), whole2((c2, h4)),     # dW1a, dW1b
            whole2((1, h4)),                        # db1
            whole2((h4, p)), whole2((1, p)),        # dW2, db2
            whole2((c1, p)), whole2((c2, p)),       # dWsa, dWsb
            stat_a, stat_a, stat_b, stat_b,         # S1a, S2a, S1b, S2b
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c1), ha.dtype),
            jax.ShapeDtypeStruct((b, hw, c2), hb.dtype),
            jax.ShapeDtypeStruct((b, hw, c1), xa.dtype),
            jax.ShapeDtypeStruct((b, hw, c2), xb.dtype),
            jax.ShapeDtypeStruct((c1, h4), jnp.float32),
            jax.ShapeDtypeStruct((c2, h4), jnp.float32),
            jax.ShapeDtypeStruct((1, h4), jnp.float32),
            jax.ShapeDtypeStruct((h4, p), jnp.float32),
            jax.ShapeDtypeStruct((1, p), jnp.float32),
            jax.ShapeDtypeStruct((c1, p), jnp.float32),
            jax.ShapeDtypeStruct((c2, p), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c2), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c2), jnp.float32),
        ],
        interpret=interpret,
    )(ma.reshape(b, 1, c1), ra.reshape(b, 1, c1),
      mb.reshape(b, 1, c2), rb.reshape(b, 1, c2),
      ha.reshape(b, hw, c1), hb.reshape(b, hw, c2),
      xa.reshape(b, hw, c1), xb.reshape(b, hw, c2),
      g.reshape(b, hw, p), w1a, w1b, b1.reshape(1, h4), w2, wsa, wsb)
    (dna, dnb, dxa, dxb, dw1a, dw1b, db1, dw2, db2, dwsa, dwsb,
     s1a, s2a, s1b, s2b) = outs
    sp = (b, hh, ww)
    return (
        dna.reshape(*sp, c1), dnb.reshape(*sp, c2),
        dxa.reshape(*sp, c1), dxb.reshape(*sp, c2),
        jnp.concatenate([dw1a, dw1b], axis=0).astype(w1.dtype),
        db1.reshape(h4).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(p),
        jnp.concatenate([dwsa, dwsb], axis=0).astype(ws.dtype),
        s1a.reshape(b, c1), s2a.reshape(b, c1),
        s1b.reshape(b, c2), s2b.reshape(b, c2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def block_core2_in(ha, hb, xa, xb, w1, b1, w2, b2, ws, interpret=False):
    """Two-input fused InstanceNorm+MLP+shortcut (skip-concat elimination).

    Numerically identical to
    ``block_core_in(concat(ha,hb), concat(xa,xb), ...)`` with parameters in
    the concatenated layout, but the 2C-wide concat never exists in HBM in
    either direction: the forward K-splits every GEMM over the two parts
    and the backward emits dxa/dxb and the two InstanceNorm cotangents
    directly (the full closed-form IN backward folded in, as in
    block_core_in).
    """
    from dsgan_tpu.ops.norm import instance_stats

    ma, ra = instance_stats(ha)
    mb, rb = instance_stats(hb)
    return _fwd2_impl(ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, b2, ws,
                      interpret)


def _in2_vjp_fwd(ha, hb, xa, xb, w1, b1, w2, b2, ws, interpret):
    from dsgan_tpu.ops.norm import instance_stats

    ma, ra = instance_stats(ha)
    mb, rb = instance_stats(hb)
    out = _fwd2_impl(ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, b2, ws,
                     interpret)
    return out, (ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, b2, ws)


def _in_fold(dn, h, mean, rsig, s1, s2, hw):
    """Closed-form IN cotangent from the kernel's S1/S2 (both VJPs):
      dh = rsig*dn - rsig*S1/HW - rsig^3*S2/HW*(h - mean)
         = dn*c1 - h*c3 + (mean*c3 - rsig*S1/HW)
    per-(b,c) f32 scalars; the big elementwise pass stays in h.dtype."""
    dt = h.dtype
    c1 = rsig
    c3 = (rsig ** 3) * s2 / hw
    c0 = mean * c3 - rsig * s1 / hw
    return (
        dn * c1[:, None, None, :].astype(dt)
        - h * c3[:, None, None, :].astype(dt)
        + c0[:, None, None, :].astype(dt)
    )


def _in2_vjp_bwd(interpret, res, g):
    ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, b2, ws = res
    b, hh, ww, _ = ha.shape
    hw = hh * ww
    (dna, dnb, dxa, dxb, dw1, db1, dw2, db2, dws,
     s1a, s2a, s1b, s2b) = _bwd2_impl(
        ha, hb, xa, xb, ma, ra, mb, rb, w1, b1, w2, ws, g, interpret
    )
    dha = _in_fold(dna, ha, ma, ra, s1a, s2a, hw)
    dhb = _in_fold(dnb, hb, mb, rb, s1b, s2b, hw)
    return (dha, dhb, dxa, dxb, dw1, db1, dw2, db2.astype(b2.dtype), dws)


block_core2_in.defvjp(_in2_vjp_fwd, _in2_vjp_bwd)
