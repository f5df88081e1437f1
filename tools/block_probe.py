"""On-chip A/B probe for ConvNeXt Block formulations (fwd+bwd).

Times the uc4-shape block (the most expensive 256^2 instance) under
different implementations to pick the XLA-friendliest form.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tools.opbench import time_device

B, R, CIN, COUT = 16, 256, 128, 64
HID = 4 * CIN


def mk(shape, key, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


x = mk((B, R, R, CIN), 0)
w_dw = mk((7, 7, 1, CIN), 1)
w_sc = mk((1, 1, CIN, COUT), 2)
w1 = mk((CIN, HID), 3)
b1 = mk((HID,), 4)
w2 = mk((HID, COUT), 5)
b2 = mk((COUT,), 6)
params = (w_dw, w_sc, w1, b1, w2, b2)


def dw(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=CIN,
    )


def in_f32(h):
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=(1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(hf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return ((hf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)


def in_bf16_apply(h):
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=(1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(hf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + 1e-5).astype(h.dtype)
    shift = (mean * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
    return h * scale - shift


def block_base(p, x):
    w_dw, w_sc, w1, b1, w2, b2 = p
    sc = lax.conv_general_dilated(x, w_sc, (1, 1), "VALID",
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = dw(x, w_dw)
    h = in_f32(h)
    h = h @ w1 + b1
    h = jax.nn.gelu(h, approximate=True)
    h = h @ w2 + b2
    return sc + h


def block_bf16in(p, x):
    w_dw, w_sc, w1, b1, w2, b2 = p
    sc = lax.conv_general_dilated(x, w_sc, (1, 1), "VALID",
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = dw(x, w_dw)
    h = in_bf16_apply(h)
    h = h @ w1 + b1
    h = jax.nn.gelu(h, approximate=True)
    h = h @ w2 + b2
    return sc + h


def block_2d(p, x):
    w_dw, w_sc, w1, b1, w2, b2 = p
    sc = lax.conv_general_dilated(x, w_sc, (1, 1), "VALID",
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = dw(x, w_dw)
    h = in_bf16_apply(h)
    h2 = h.reshape(-1, CIN)
    h2 = h2 @ w1 + b1
    h2 = jax.nn.gelu(h2, approximate=True)
    h2 = h2 @ w2 + b2
    return sc + h2.reshape(B, R, R, COUT)


def fb(f):
    def g(p, x):
        def loss(p):
            return jnp.sum(f(p, x).astype(jnp.float32))
        l, grads = jax.value_and_grad(loss)(p)
        return l, grads
    return g


def main():
    flops_fwd = B * R * R * (CIN * HID + HID * COUT + CIN * COUT) * 2
    flops = 3 * flops_fwd  # fwd+bwd approx
    for name, f in [("base f32-IN", block_base),
                    ("bf16-IN apply", block_bf16in),
                    ("2D mlp + bf16-IN", block_2d)]:
        time_device(f"{name} fwd", f, params, x, flops=flops_fwd)
        time_device(f"{name} fwd+bwd", fb(f), params, x, flops=flops)


if __name__ == "__main__":
    main()
