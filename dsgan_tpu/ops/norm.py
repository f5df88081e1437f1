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
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


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
