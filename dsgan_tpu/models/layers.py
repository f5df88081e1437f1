"""Shared flax building blocks (NHWC, torch-geometry).

Defaults mirror the reference's post-construction init pass
(networks.py:49-79 init_net: Conv/Linear weights ~ N(0, 0.02), biases 0);
other init schemes are applied by ``registry.reinit_params``.
"""

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from dsgan_tpu import ops

normal02 = jax.nn.initializers.normal(stddev=0.02)
zeros = jax.nn.initializers.zeros


_GELU_MODE = "auto"


def set_gelu_mode(mode):
    """Global GELU flavor. Modes:

    * ``"auto"`` (default): tanh approximation for bf16 tensors, exact erf
      otherwise. In bf16 the two are numerically indistinguishable — over
      ALL 65,280 finite bf16 inputs the roundings agree for 99.5% of
      values, are <=1 ulp apart wherever |gelu(x)| > 0.1, and the global
      absolute error bound is 4.8e-4 (tests/test_ops_misc.py pins this).
      XLA's erf lowering upcasts bf16 to f32 with u32 bit-twiddling
      fusions (+~22% step time on v5e), so erf buys nothing in bf16.
    * ``"exact"`` / False: erf everywhere (strict torch nn.GELU parity —
      use for f32 golden tests against torch checkpoints).
    * ``"tanh"`` / True: tanh approximation everywhere.

    Affects newly traced programs only.
    """
    global _GELU_MODE
    if isinstance(mode, bool):  # backwards-compatible bool form
        mode = "tanh" if mode else "exact"
    if mode not in ("auto", "exact", "tanh"):
        raise ValueError(f"unknown gelu mode [{mode}]")
    _GELU_MODE = mode


def gelu(x):
    """GELU matching torch nn.GELU to within the tensor dtype's resolution
    (see set_gelu_mode)."""
    if _GELU_MODE == "auto":
        approx = x.dtype == jnp.bfloat16
    else:
        approx = _GELU_MODE == "tanh"
    return jax.nn.gelu(x, approximate=approx)


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope)


def Conv(
    features: int,
    kernel: int,
    stride: int = 1,
    padding: Union[int, str, Sequence] = 0,
    groups: int = 1,
    dilation: int = 1,
    bias: bool = True,
    dtype: Any = None,
    name: Optional[str] = None,
) -> nn.Conv:
    """torch-style Conv2d as a configured flax Conv (NHWC, HWIO kernel)."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        feature_group_count=groups,
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        kernel_init=normal02,
        bias_init=zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class LaneFixConv(nn.Module):
    """'same' stride-1 Conv2d whose dx is computed in space-to-depth
    packed form (ops.conv2d_lanefix) — for layers with a lane-starved
    channel side. Parameter tree ({kernel, bias}) is identical to the
    nn.Conv it replaces — checkpoint-compatible.

    NOT used by any shipped model: the packed dx wins ~1.8 ms isolated
    at the flagship's 64->3 res conv and VGG conv0, but LOSES ~1.9 ms in
    the full fused step (device-time A/B 141.35 vs 139.46 ms) — the
    pack/unpack reshapes block producer/consumer fusion. Kept, with its
    op-level parity tests (tests/test_dw_s2d.py), as a measured closed
    experiment (docs/PERF.md) and for genuinely isolated deployments."""

    features: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from dsgan_tpu import ops

        k = self.param(
            "kernel", normal02,
            (self.kernel, self.kernel, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("bias", zeros, (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        return ops.conv2d_lanefix(x.astype(dt), k.astype(dt), b.astype(dt))


def Dense(features: int, dtype: Any = None, name: Optional[str] = None) -> nn.Dense:
    """torch-style Linear over the channel (last) dim."""
    return nn.Dense(
        features=features,
        kernel_init=normal02,
        bias_init=zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ConvTranspose(nn.Module):
    """torch-style ConvTranspose2d (exact gradient-of-conv geometry).

    Kernel is stored HWIO `[kh, kw, in, out]`; ``ops.conv_transpose2d``
    performs the spatial flip, so imported torch weights map over with a
    pure transpose.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", normal02, (k, k, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", zeros, (self.features,), jnp.float32) if self.use_bias else None
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        w = w.astype(dtype)
        b = None if b is None else b.astype(dtype)
        return ops.conv_transpose2d(
            x, w, b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


def PReLU(init: float = 0.25, name: Optional[str] = None) -> nn.PReLU:
    """torch nn.PReLU(): one shared learnable slope, init 0.25."""
    return nn.PReLU(negative_slope_init=init, name=name)


class Norm(nn.Module):
    """Dispatch on the reference's --norm flag: instance | batch | none.

    'instance' is parameter-free (affine=False, the reference default for
    every shipped recipe). 'batch' is torch BatchNorm2d semantics: batch
    statistics + learnable affine in train mode, with running averages
    (momentum 0.1, unbiased running var) tracked in the flax
    ``batch_stats`` collection and used for eval — matching
    ``get_norm_layer`` (reference networks.py:21-30). Train steps thread
    the stats through the state (see pix2pix.make_train_step); a
    non-mutable apply (e.g. inside value_and_grad closures that re-run
    the same forward) simply skips the running update.
    """

    kind: str = "instance"
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "instance":
            return ops.instance_norm(x)
        if self.kind == "batch":
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
            )
            xf = x.astype(jnp.float32)
            if train:
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
                if not self.is_initializing() and self.is_mutable_collection(
                    "batch_stats"
                ):
                    n = x.shape[0] * x.shape[1] * x.shape[2]
                    unbiased = var * (n / max(n - 1, 1))
                    m = self.momentum
                    ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                    ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
            else:
                mean = ra_mean.value
                var = ra_var.value
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            return y.astype(x.dtype)
        if self.kind == "none":
            return x
        raise NotImplementedError(f"normalization layer [{self.kind}] is not found")


def norm_uses_bias(kind: str) -> bool:
    """Conv bias policy: bias iff the following norm is InstanceNorm or none
    (matches use_bias in reference networks.py:85-88)."""
    return kind != "batch"
