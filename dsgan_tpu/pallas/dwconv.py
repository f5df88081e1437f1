"""Fused depthwise 2-D convolution (NHWC, stride 1, SAME padding) as a
Pallas TPU kernel, with custom VJP.

This is the hot op of both MixConvNeXtML streams (Block's 7x7 dwconv,
MidMLKA's 3/5/7/9 multi-kernel bank — reference MixConvNeXtML.py:220,94-97).
XLA's lowering of feature-grouped convs runs at ~1 TF/s on v5e
(tools/microbench.py); this kernel is a straight VPU stencil:

  grid (B, H/TH); each step DMAs a (TH+2p, W+2p, C) halo window of the
  pre-padded input from HBM into VMEM, accumulates the k*k shifted
  products in an f32 VMEM accumulator, adds bias, writes the (TH, W, C)
  output tile.

Backward: dx is the same stencil with spatially-flipped weights (the
conv transpose of a stride-1 SAME cross-correlation); dw/db are thin
XLA reductions (one conv + one sum), negligible next to the stencil.

Status (validated on the real v5e chip): bit-exact vs the XLA lowering
(maxdiff 0.0 at k=7,C=64,256^2 bf16). v2 (double-buffered halo DMA +
SSA-register accumulation) runs 9.0 ms vs XLA's 2.4 ms at batch 8 — the
49 sublane-shifted tap reads dominate; a lane-packed multi-row layout is
the next step (ROADMAP.md). Gated off by default (see pallas/__init__.py
for the remote-compile-cost rationale).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h, w_, w_total, c_total, pad, itemsize=2, budget=12 * 1024 * 1024):
    """Largest H tile dividing h whose VMEM footprint (halo scratch +
    f32 accumulator + double-buffered output block) fits the ~16MB/core
    budget with headroom."""
    for th in (64, 32, 16, 8, 4, 2, 1):
        if h % th != 0:
            continue
        vmem = (
            2 * (th + 2 * pad) * w_total * c_total * itemsize  # halo scratch x2
            + th * w_ * c_total * 4                             # acc spill headroom
            + 2 * th * w_ * c_total * itemsize                  # out (dbl-buf)
        )
        if vmem <= budget:
            return min(th, h)
    return 1


def _dwconv_kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *, k, th, w_, c, w_total, n_h):
    """Grid (B, H/th). Double-buffered halo DMA; the 49-tap accumulation
    stays in SSA values so Mosaic register-allocates it instead of
    round-tripping a VMEM accumulator per tap."""
    pad = k // 2
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(0)
    step = b * n_h + i

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2 * pad)],
            scratch.at[slot],
            sem.at[slot],
        )

    cur = step % 2
    nxt = (step + 1) % 2

    @pl.when(step == 0)
    def _():
        dma(cur, b, i).start()

    # prefetch the next tile while we compute this one
    nxt_step = step + 1
    nxt_b = nxt_step // n_h
    nxt_i = nxt_step % n_h

    @pl.when(nxt_step < nb * n_h)
    def _():
        dma(nxt, nxt_b, nxt_i).start()

    dma(cur, b, i).wait()

    acc = jnp.zeros((th, w_, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = w_ref[dy, dx, :].astype(jnp.float32)
            acc += scratch[cur, dy:dy + th, dx:dx + w_, :].astype(jnp.float32) * tap
    out = acc + b_ref[:].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)[None]


def _dwconv_fwd_impl(x, w, b, k, interpret=False):
    """x: (B,H,W,C); w: (k,k,C); b: (C,). stride 1, SAME."""
    bs, h, w_, c = x.shape
    pad = k // 2
    # Mosaic requires DMA'd slices to be tile-aligned: multiple of 8 in
    # the sublane (W) dim and 128 in the lane (C) dim. Pad both; the tap
    # slices only read the real region and the output is sliced back.
    w_total = -(-(w_ + 2 * pad) // 8) * 8
    c_total = -(-c // 128) * 128
    xp = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, w_total - w_ - pad), (0, c_total - c))
    )
    w = jnp.pad(w, ((0, 0), (0, 0), (0, c_total - c)))
    b = jnp.pad(b, (0, c_total - c))
    th = _pick_th(h, w_, w_total, c_total, pad, x.dtype.itemsize)

    kern = functools.partial(
        _dwconv_kernel, k=k, th=th, w_=w_, c=c_total, w_total=w_total, n_h=h // th
    )
    out = pl.pallas_call(
        kern,
        grid=(bs, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # padded input (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),         # bias
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_, c_total), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bs, h, w_, c_total), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2 * pad, w_total, c_total), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w, b)
    return out[..., :c] if c_total != c else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dwconv2d(x, w, b, k, interpret=False):
    """Depthwise conv NHWC, stride 1, SAME padding; w (k,k,C), b (C,)."""
    return _dwconv_fwd_impl(x, w, b, k, interpret)


def _fwd(x, w, b, k, interpret):
    return _dwconv_fwd_impl(x, w, b, k, interpret), (x, w)


def _bwd(k, interpret, res, g):
    x, w = res
    # dx: stencil with flipped taps
    w_flip = jnp.flip(w, (0, 1))
    dx = _dwconv_fwd_impl(g, w_flip, jnp.zeros((w.shape[-1],), w.dtype), k, interpret)
    # dw[dy,dx,c] = sum_{b,i,j} x_pad[b,i+dy,j+dx,c] * g[b,i,j,c]
    # computed as k*k shifted elementwise reductions (XLA fuses these).
    bs, h, w_, c = x.shape
    pad = k // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    gf = g.astype(jnp.float32)
    taps = []
    for dy in range(k):
        row = []
        for dxx in range(k):
            row.append(jnp.sum(xp[:, dy:dy + h, dxx:dxx + w_, :] * gf, axis=(0, 1, 2)))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)  # (k, k, C)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


dwconv2d.defvjp(_fwd, _bwd)
