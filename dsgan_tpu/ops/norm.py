"""Normalization ops (NHWC, functional).

``instance_norm`` matches torch nn.InstanceNorm2d(affine=False,
track_running_stats=False) — the norm used throughout the reference
generators/discriminators (reference DSGAN/models/networks.py:25):
per-sample, per-channel statistics over the spatial dims with *biased*
variance and eps=1e-5, no learned scale/shift.
"""

import jax.numpy as jnp


def instance_norm(x, eps=1e-5, weight=None, bias=None):
    """InstanceNorm over NHWC spatial dims.

    Stats are computed in float32 regardless of input dtype (bfloat16-safe),
    result is cast back to the input dtype.
    """
    xf = x.astype(jnp.float32)
    # single-pass stats: E[x^2] - E[x]^2 lets XLA fuse both reductions into
    # ONE read of x (the two-pass (x-mean)^2 form forces a second sweep).
    # f32 accumulation over <=65k roughly-centered activations keeps the
    # cancellation error far below the bf16 activations' own resolution
    # (torch-parity pinned by tests/test_ops_conv.py::test_instance_norm*).
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    rsig = jnp.reciprocal(jnp.sqrt(var + eps))
    if x.dtype == jnp.float32:
        y = (xf - mean) * rsig
    else:
        # bf16 inputs: apply as x*scale - shift in the INPUT dtype. The f32
        # normalize materialized full f32 copies around every norm site
        # (~12 ms/step of convert_element_type sweeps in the 256^2 train
        # step); per-(b,c) f32 scalars keep the stats exact while the
        # big elementwise pass stays bf16 (error ~1 ulp of bf16).
        y = x * rsig.astype(x.dtype) - (mean * rsig).astype(x.dtype)
    if weight is not None:
        y = y * weight.astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def instance_stats(x, eps=1e-5):
    """InstanceNorm statistics of NHWC ``x``: f32 (B, C) mean and rsigma.

    ``(x - mean) * rsig`` with these reproduces ``instance_norm`` (modulo
    reciprocal(sqrt) vs rsqrt rounding). Split out so fused kernels
    (pallas.block_core) can consume precomputed stats while XLA autodiffs
    this cheap reduction."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2))
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, jnp.reciprocal(jnp.sqrt(var + eps))


def batch_norm_inference(x, mean, var, weight, bias, eps=1e-5):
    """Inference-mode BatchNorm with provided running statistics (NHWC).

    Training-mode batch norm is provided through flax.linen.BatchNorm in the
    model layer; this functional form exists for imported-checkpoint
    evaluation paths (the reference's `--norm batch` option,
    networks.py:22-23).
    """
    xf = x.astype(jnp.float32)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps)) * weight + bias
    return y.astype(x.dtype)
