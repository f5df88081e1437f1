"""Normalization ops (NHWC, functional).

``instance_norm`` matches torch nn.InstanceNorm2d(affine=False,
track_running_stats=False) — the norm used throughout the reference
generators/discriminators (reference DSGAN/models/networks.py:25):
per-sample, per-channel statistics over the spatial dims with *biased*
variance and eps=1e-5, no learned scale/shift.
"""

import functools

import jax
import jax.numpy as jnp


def _in_stats(x, eps):
    """f32 per-(b,c) mean and rsigma over spatial dims of NHWC x.

    Single-pass stats: E[x^2] - E[x]^2 lets XLA fuse both reductions into
    ONE read of x. f32 accumulation over <=65k roughly-centered activations
    keeps the cancellation error far below the bf16 activations' own
    resolution (torch-parity pinned by tests/test_ops_conv.py)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean, jnp.reciprocal(jnp.sqrt(var + eps))


def _in_apply(x, mean, rsig):
    # Subtract the mean in f32, then round the unit-scale result once to
    # the input dtype. An earlier bf16-only variant (x*rsig - (mean*rsig)
    # in bf16) carried an absolute error ~ulp(|mean*rsig|), which dominates
    # the normalized output whenever |mean| >> sigma; this form's only
    # bf16 rounding is of the O(1) output, and it matches the Pallas
    # fused-block kernel's normalize exactly. The upcast fuses into the
    # surrounding elementwise chain (the result is still cast back to
    # x.dtype before any consumer) — no full f32 materialization.
    return ((x.astype(jnp.float32) - mean) * rsig).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _instance_norm_core(x, eps):
    mean, rsig = _in_stats(x, eps)
    return _in_apply(x, mean, rsig).astype(x.dtype)


def _in_core_fwd(x, eps):
    mean, rsig = _in_stats(x, eps)
    return _in_apply(x, mean, rsig).astype(x.dtype), (x, mean, rsig)


def _in_core_bwd(eps, res, dy):
    # Closed-form InstanceNorm backward in ONE elementwise pass:
    #   dx = rsig*(dy - mean(dy) - n*mean(dy*n)),  n = (x-mean)*rsig
    # XLA's autodiff of the stats instead emits ~4 full-tensor sweeps
    # (several in f32) per norm site — measured 2.6 ms fwd+bwd at
    # 256^2x64xb16 vs ~1 ms for this form.
    x, mean, rsig = res
    n = _in_apply(x, mean, rsig)                     # recompute, input dtype
    dyf = dy.astype(jnp.float32)
    nf = n.astype(jnp.float32)
    m1 = jnp.mean(dyf, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(dyf * nf, axis=(1, 2), keepdims=True)
    if x.dtype == jnp.float32:
        dx = rsig * (dyf - m1 - nf * m2)
    else:
        dx = (dy - m1.astype(dy.dtype)) * rsig.astype(dy.dtype) - n * (
            (rsig * m2).astype(dy.dtype)
        )
    return (dx.astype(x.dtype),)


_instance_norm_core.defvjp(_in_core_fwd, _in_core_bwd)


def instance_norm(x, eps=1e-5, weight=None, bias=None):
    """InstanceNorm over NHWC spatial dims (torch InstanceNorm2d semantics:
    biased variance, eps inside the sqrt, affine only if weight/bias given).

    Stats are computed in float32 regardless of input dtype (bfloat16-safe);
    the normalize and its custom closed-form backward run in the input dtype.
    """
    y = _instance_norm_core(x, eps)
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
