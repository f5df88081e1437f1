"""Pins for small numerics decisions.

The headline one: GELU "auto" mode uses the tanh approximation for bf16
tensors. This test pins the claim that makes that sound: across ALL finite
bf16 inputs, tanh-GELU and erf-GELU round to bf16 values that agree for
>99% of inputs, sit <=1 ulp apart wherever |gelu(x)| > 0.1, and differ by
at most 5e-4 absolutely. (XLA's erf lowering upcasts bf16 to f32 and costs
~22% of step time on v5e; the approximation is below bf16 resolution.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from dsgan_tpu.models import layers


def _all_finite_bf16():
    u = np.arange(65536, dtype=np.uint16)
    x = u.view(jnp.bfloat16.dtype).astype(np.float64)
    return x[np.isfinite(x)]


def _mono_int(b):
    """bf16 bit patterns -> monotonic ints (for ulp distance)."""
    i = np.asarray(b).view(np.uint16).astype(np.int64)
    return np.where(i >= 0x8000, -(i - 0x8000), i)


def test_tanh_gelu_is_sub_ulp_in_bf16():
    x = _all_finite_bf16()
    from scipy.special import erf  # available in this env

    exact = 0.5 * x * (1 + erf(x / np.sqrt(2)))
    tanh = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))

    # absolute error bound
    assert np.abs(exact - tanh).max() < 5e-4

    eb = exact.astype(jnp.bfloat16.dtype)
    tb = tanh.astype(jnp.bfloat16.dtype)
    agree = np.mean(eb == tb)
    assert agree > 0.99, f"bf16 agreement only {agree:.4f}"

    m = np.abs(exact) > 0.1
    ulp = np.abs(_mono_int(eb[m]) - _mono_int(tb[m]))
    assert ulp.max() <= 1, f"max ulp {ulp.max()} where |gelu|>0.1"


def test_gelu_mode_dispatch():
    x32 = jnp.linspace(-3, 3, 64, dtype=jnp.float32)
    xb = x32.astype(jnp.bfloat16)
    try:
        layers.set_gelu_mode("auto")
        # f32 under auto == strict erf
        np.testing.assert_array_equal(
            np.asarray(layers.gelu(x32)),
            np.asarray(jax.nn.gelu(x32, approximate=False)),
        )
        # bf16 under auto == tanh approximation
        np.testing.assert_array_equal(
            np.asarray(layers.gelu(xb)).astype(np.float32),
            np.asarray(jax.nn.gelu(xb, approximate=True)).astype(np.float32),
        )
        # explicit exact wins for bf16 too
        layers.set_gelu_mode("exact")
        np.testing.assert_array_equal(
            np.asarray(layers.gelu(xb)).astype(np.float32),
            np.asarray(jax.nn.gelu(xb, approximate=False)).astype(np.float32),
        )
        # bool backwards compatibility
        layers.set_gelu_mode(True)
        np.testing.assert_array_equal(
            np.asarray(layers.gelu(x32)),
            np.asarray(jax.nn.gelu(x32, approximate=True)),
        )
    finally:
        layers.set_gelu_mode("auto")
