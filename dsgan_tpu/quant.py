"""Weights-only int8 post-training quantization for serving export.

A deployment capability the reference lacks entirely (it has no inference
artifact story at all — serving re-runs the torch training code,
reference DSGAN/models/test_model.py:10-43).

Scope is deliberately weights-only ("w8"): per-output-channel symmetric
int8 weights, dequantized to the compute dtype at use inside the exported
graph. Activations stay bf16/f32. The measured basis (tools/quant_probe.py,
v5e, chained-dispatch timings — docs/PERF.md methodology):

  * int8 MXU GEMMs win only 1.35-1.46x at the compute-heavy stages
    (C=256/1024), *lose* 3.6x at the dominant bandwidth-bound stage
    (C=64 @256^2: 33.0 -> 119.8 ms/iter — the per-layer requantize
    clip+scale+cast is VPU-bound over 1M rows and swamps the MXU gain),
    and lose on the 3x3 conv (12.3 -> 15.2 ms). Full activation
    quantization is a net LOSS for this model's serving forward; that
    experiment is closed (ROADMAP.md).
  * Weight bytes are negligible vs activation traffic at serving shapes
    (~10-40 MB vs GBs), so w8 costs ~nothing at run time — its value is
    the ARTIFACT: int8 constants halve the StableHLO blob, which is what
    ships to serving hosts and edge canaries.

Quantization scheme: for each float weight tensor with ndim >= 2 and
size >= min_size, scale s_c = max|w[..., c]| / 127 per output channel
(last axis: HWIO convs and (in, out) dense kernels alike), q = round(w/s)
in [-127, 127]. Max per-weight error is s_c/2 (~0.4% of the channel's
dynamic range). Biases, norm affines, and other small leaves stay float.

The export CLI gates quality: `--quantize w8` compares the quantized
artifact's outputs against the float graph on a probe batch and reports
SSIM/PSNR (`--quant_tol` makes the gate fatal).
"""

import jax
import jax.numpy as jnp

#: leaves smaller than this stay float (biases, norm affines — quantizing
#: them saves ~nothing and they are the most error-sensitive parameters)
MIN_QUANT_SIZE = 4096

_Q, _S, _W = "__q8__", "__scale__", "__w__"


def _is_qleaf(x):
    return isinstance(x, dict) and (_Q in x or _W in x)


def quantize_params(params, min_size=MIN_QUANT_SIZE):
    """float param tree -> qtree.

    Each eligible weight leaf becomes ``{"__q8__": int8, "__scale__": f32}``
    (per-output-channel symmetric); every other leaf is kept verbatim as
    ``{"__w__": leaf}``. The qtree is a plain pytree of arrays — it jits,
    serializes, and round-trips through ``dequantize_params``.
    """

    def q(w):
        eligible = (
            hasattr(w, "ndim") and w.ndim >= 2 and w.size >= min_size
            and jnp.issubdtype(jnp.asarray(w).dtype, jnp.floating)
        )
        if not eligible:
            return {_W: w}
        wf = jnp.asarray(w, jnp.float32)
        axes = tuple(range(wf.ndim - 1))
        s = jnp.max(jnp.abs(wf), axis=axes, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        qi = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
        return {_Q: qi, _S: s.astype(jnp.float32)}

    return jax.tree_util.tree_map(q, params)


def dequantize_params(qparams, dtype=None):
    """qtree -> float param tree (inverse of :func:`quantize_params` up to
    the s_c/2 rounding error). ``dtype`` casts dequantized weights (float
    passthrough leaves keep their stored dtype)."""

    def d(leaf):
        if _Q in leaf:
            w = leaf[_Q].astype(jnp.float32) * leaf[_S]
            return w.astype(dtype) if dtype is not None else w
        return leaf[_W]

    return jax.tree_util.tree_map(d, qparams, is_leaf=_is_qleaf)


def quant_report(qparams):
    """Bytes accounting: {quantized_leaves, float_leaves, bytes_q8, bytes_f32}
    where bytes_* are the weight payloads of the quantized leaves in each
    representation (scales included in bytes_q8)."""
    n_q = n_f = b_q = b_f = 0
    for leaf in jax.tree_util.tree_leaves(
            qparams, is_leaf=_is_qleaf):
        if _is_qleaf(leaf) and _Q in leaf:
            n_q += 1
            b_q += leaf[_Q].size + leaf[_S].size * 4
            b_f += leaf[_Q].size * 4
        else:
            n_f += 1
    return {"quantized_leaves": n_q, "float_leaves": n_f,
            "bytes_q8": int(b_q), "bytes_f32": int(b_f)}
