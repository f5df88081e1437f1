"""Depthwise-conv backward decomposition probe, with HONEST cotangents.

Methodology note (the trap this file exists to avoid): timing f+b with a
``sum(y)`` loss makes the cotangent all-ones and XLA algebraically
collapses the real backward (d/dx sum(conv) is a constant map; dW becomes
box sums) — the earlier standalone "dwbank f+b" numbers measured that
collapsed program (upc2 'f+b' 0.13 ms vs fwd 0.31 ms). Here the loss is
sum(y^2)/2 so dy = y and every backward op does real work.

Questions answered per production shape:
  1. true dw-conv f+b cost (fwd / dx / dW / db split via jax.vjp timing)
  2. does an EXPLICIT flipped-kernel depthwise conv for dx beat autodiff's
     transposed-conv lowering?
  3. what does dW actually cost (the reshape+batch-group-conv lowering)?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dsgan_tpu import ops
from tools.opbench import time_device

B = int(os.environ.get("DW_BATCH", "16"))
DT = jnp.bfloat16

SHAPES = [
    # (name, C, HW, k) — the production dw convs
    ("uc4", 128, 256, 7),
    ("uc3", 256, 128, 7),
    ("c2", 128, 128, 7),
    ("mid32", 32, 128, 9),
    ("upc3", 128, 128, 9),
]


def main():
    sel = os.environ.get("DW_SHAPES")
    shapes = [s for s in SHAPES if sel is None or s[0] in sel.split(",")]
    for name, c, hw, k in shapes:
        x = jnp.asarray(np.random.randn(B, hw, hw, c), DT)
        w = jnp.asarray(np.random.randn(k, k, 1, c) * 0.05, DT)
        bias = jnp.zeros((c,), DT)
        dy = jnp.asarray(np.random.randn(B, hw, hw, c), DT)
        pad = k // 2

        def fwd(xx, ww=w, bb=bias, cc=c, p=pad):
            return ops.conv2d(xx, ww, bb, stride=1, padding=p, groups=cc)

        time_device(f"{name} {c}ch@{hw}^2 k{k} fwd", fwd, x)

        # honest full backward: loss sum(y^2)/2 -> dy = y (real cotangent)
        def fb(xx, ww=w, bb=bias, cc=c, p=pad):
            def loss(xi, wi, bi):
                y = ops.conv2d(xi, wi, bi, stride=1, padding=p, groups=cc)
                return 0.5 * jnp.sum(jnp.square(y.astype(jnp.float32)))

            gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(xx, ww, bb)
            return (jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32))
                    + jnp.sum(gb.astype(jnp.float32)))

        time_device(f"{name} f+b honest", fb, x)

        # dx alone via autodiff vjp with a REAL dy operand
        def dx_auto(dyy, xx=x, ww=w, cc=c, p=pad):
            _, vjp = jax.vjp(
                lambda xi: ops.conv2d(xi, ww, None, stride=1, padding=p, groups=cc), xx
            )
            return vjp(dyy)[0]

        time_device(f"{name} dx autodiff", dx_auto, dy)

        # dx as an explicit flipped-kernel depthwise FORWARD conv
        def dx_flip(dyy, ww=w, cc=c, p=pad, kk=k):
            wf = jnp.flip(ww, (0, 1))
            return ops.conv2d(dyy, wf, None, stride=1, padding=kk - 1 - p, groups=cc)

        time_device(f"{name} dx flipped-fwd", dx_flip, dy)

        # dW alone via autodiff. NOTE: x must be an ARGUMENT — closing over
        # it bakes a multi-hundred-MB literal into the HLO and the remote
        # compile request blows up (HTTP 413).
        def dw_auto(xx, dyy, ww=w, cc=c, p=pad):
            _, vjp = jax.vjp(
                lambda wi: ops.conv2d(xx, wi, None, stride=1, padding=p, groups=cc),
                ww,
            )
            return vjp(dyy)[0]

        time_device(f"{name} dW autodiff", dw_auto, x, dy)

        # db alone
        def db(dyy):
            return jnp.sum(dyy.astype(jnp.float32), axis=(0, 1, 2))

        time_device(f"{name} db reduce", db, dy)


if __name__ == "__main__":
    main()
