"""On-chip probe: conv-transpose backward formulations.

Round-2 traces attribute ~2 ms/step of `reverse` ops on full activations
to XLA's canonicalization of the conv-transpose gradient. dx of
convT(stride s, padding p) is exactly a clean strided conv of the
cotangent with the I/O-swapped kernel (verified elementwise on CPU);
this probe times the autodiff path vs that formulation (dW left to
autodiff in both) at the production UpBlock shapes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tools.opbench import time_device
from dsgan_tpu.ops.conv import _DIMNUMS, conv_transpose2d

B = 16


def mk(shape, key, dt=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dt)


def custom_convT(x, w, b, s, p, op):
    @jax.custom_vjp
    def f(x, w, b):
        return conv_transpose2d(x, w, b, stride=s, padding=p, output_padding=op)

    def fwd(x, w, b):
        return f(x, w, b), (x, w)

    def bwd(res, g):
        x, w = res
        w_sw = jnp.transpose(w, (0, 1, 3, 2))
        dx = lax.conv_general_dilated(
            g, w_sw, window_strides=(s, s), padding=((p, p), (p, p)),
            dimension_numbers=_DIMNUMS,
        )
        _, wvjp = jax.vjp(
            lambda w: conv_transpose2d(x, w, None, stride=s, padding=p,
                                       output_padding=op), w
        )
        (dw,) = wvjp(g)
        db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(b.dtype)
        return dx, dw, db

    f.defvjp(fwd, bwd)
    return f(x, w, b)


def run(name, r, ci, co):
    x = mk((B, r, r, ci), 0)
    w = mk((3, 3, ci, co), 1) * 0.05
    b = mk((co,), 2)

    def f_auto(x, w, b):
        return conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1)

    def f_cust(x, w, b):
        return custom_convT(x, w, b, 2, 1, 1)

    for tag, f in (("auto", f_auto), ("custom", f_cust)):
        def fb(*a):
            y, vjp = jax.vjp(f, *a)
            return vjp(jnp.ones_like(y))

        time_device(f"{name} {tag} fwd", f, x, w, b)
        time_device(f"{name} {tag} fwd+bwd", fb, x, w, b)


if __name__ == "__main__":
    run("u4 deconv 128^2 128->64 ", 128, 128, 64)
    run("u3 deconv  64^2 256->128", 64, 256, 128)
    run("loc up 64^2 64->64      ", 64, 64, 64)
