"""Fused ConvNeXt-Block pixel-MLP as a Pallas TPU kernel.

Computes, for every pixel of an NHWC feature map (flattened to rows):

    out = gelu(norm(h) @ W1 + b1) @ W2 + b2  +  x @ Ws

where ``norm(h) = (h - mean) * rsig`` applies precomputed per-(sample,
channel) InstanceNorm statistics. This is the entire post-dwconv body of
the reference Block (MixConvNeXtML.py:230-243) plus its 1x1-conv shortcut
— five HBM-roundtripping XLA ops collapsed into one VMEM-resident kernel.
The decoder's uc1-uc4 instances of this MLP are ~half the generator FLOPs
(profiled), making this the #1 Pallas target (ROADMAP).

Grid: one dimension over row tiles (TM pixels each). Per step the kernel
keeps the (TM, 4C) hidden activation entirely in VMEM, streaming W1/W2/Ws
from VMEM-resident weights (dims here cap at C=1024 -> 16 MB budget is
tight for uc1; K-chunking keeps it within limits).

Status: parity-tested in interpreter mode (tests/test_pallas.py);
flag-gated off by default like all Pallas paths in this repo — the axon
remote-compile environment spends ~5 min per Mosaic kernel (measured,
see pallas/__init__.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h_ref, x_ref, mean_ref, rsig_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ws_ref, o_ref, *, hidden_chunk):
    # block shapes: h/x (TM, C*), mean/rsig (TM, C*), weights full
    a = (h_ref[...].astype(jnp.float32) - mean_ref[...].astype(jnp.float32)) * \
        rsig_ref[...].astype(jnp.float32)
    a = a.astype(h_ref.dtype)

    hidden_total = w1_ref.shape[1]
    n_chunks = hidden_total // hidden_chunk
    acc = jnp.zeros((a.shape[0], w2_ref.shape[1]), jnp.float32)
    for i in range(n_chunks):
        sl = slice(i * hidden_chunk, (i + 1) * hidden_chunk)
        h1 = jnp.dot(a, w1_ref[:, sl], preferred_element_type=jnp.float32)
        h1 = h1 + b1_ref[sl].astype(jnp.float32)
        h1 = jax.nn.gelu(h1, approximate=True)
        acc += jnp.dot(h1.astype(a.dtype), w2_ref[sl, :],
                       preferred_element_type=jnp.float32)
    sc = jnp.dot(x_ref[...], ws_ref[...], preferred_element_type=jnp.float32)
    out = acc + b2_ref[:].astype(jnp.float32) + sc
    o_ref[...] = out.astype(o_ref.dtype)


def block_mlp(h, x, mean, rsig, w1, b1, w2, b2, ws, *, tm=512,
              hidden_chunk=None, interpret=False):
    """Fused normalized pixel-MLP + shortcut.

    h, x:        (B, H, W, C) NHWC (h = dwconv output, x = block input)
    mean, rsig:  (B, 1, 1, C) InstanceNorm statistics of h
    w1 (C,4C) b1 (4C,)  w2 (4C,P) b2 (P,)  ws (C,P)
    returns (B, H, W, P)

    NOTE: GELU here is the tanh approximation (the framework's perf
    configuration); parity tests compare against the same flavor.
    """
    bsz, hh, ww, c = h.shape
    p = w2.shape[1]
    hidden = w1.shape[1]
    if hidden_chunk is None:
        hidden_chunk = min(hidden, 1024)
    m = bsz * hh * ww
    hm = h.reshape(m, c)
    xm = x.reshape(m, c)
    mean_m = jnp.broadcast_to(mean, (bsz, hh, ww, c)).reshape(m, c)
    rsig_m = jnp.broadcast_to(rsig, (bsz, hh, ww, c)).reshape(m, c)

    tm = min(tm, m)
    while m % tm != 0:
        tm //= 2
    grid = (m // tm,)

    kern = functools.partial(_kernel, hidden_chunk=hidden_chunk)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ws
        ],
        out_specs=pl.BlockSpec((tm, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, p), h.dtype),
        interpret=interpret,
    )(hm, xm, mean_m, rsig_m, w1, b1, w2, b2, ws)
    return out.reshape(bsz, hh, ww, p)


def block_mlp_reference(h, x, mean, rsig, w1, b1, w2, b2, ws):
    """XLA reference for parity tests (same math, same gelu flavor)."""
    a = ((h.astype(jnp.float32) - mean) * rsig).astype(h.dtype)
    h1 = jax.nn.gelu(a @ w1 + b1, approximate=True)
    return (h1 @ w2 + b2 + x @ ws).astype(h.dtype)
