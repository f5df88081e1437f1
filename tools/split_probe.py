"""On-chip A/B probe: decoder skip-concat elimination vs the concat path.

For each decoder Block shape (uc1..uc4 at 256^2 batch-16 defaults), times
fwd+bwd of
  A) concat(xa,xb) -> dw(2C) -> block_core_in           (round-2 shipped)
  B) dw_a(xa), dw_b(xb)     -> block_core2_in           (split kernels)
so the win/loss of the two-input kernel is attributed per shape.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tools.opbench import time_device
from dsgan_tpu.pallas.block_core import (
    block_core2_in, block_core_fits, block_core_in,
)

B = int(os.environ.get("PROBE_BATCH", "16"))


def mk(shape, key, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def dw(x, w, b, c):
    y = lax.conv_general_dilated(
        x, w, (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return y + b


def run(name, r, c1, c2, p):
    c = c1 + c2
    h4 = 4 * c
    if not block_core_fits(r * r, c, h4, p):
        print(f"{name}: does not fit the fused kernel (model uses XLA "
              "fallback either way) — skipped")
        return
    xa = mk((B, r, r, c1), 0)
    xb = mk((B, r, r, c2), 1)
    wdw = mk((7, 7, 1, c), 2)
    bdw = mk((c,), 3)
    w1 = mk((c, h4), 4) * 0.05
    b1 = mk((h4,), 5)
    w2 = mk((h4, p), 6) * 0.05
    b2 = mk((p,), 7)
    ws = mk((c, p), 8) * 0.05

    def fwd_concat(xa, xb, wdw, bdw, w1, b1, w2, b2, ws):
        x = jnp.concatenate([xa, xb], axis=-1)
        h = dw(x, wdw, bdw, c)
        return block_core_in(h, x, w1, b1, w2, b2, ws)

    def fwd_split(xa, xb, wdw, bdw, w1, b1, w2, b2, ws):
        ha = dw(xa, wdw[..., :c1], bdw[:c1], c1)
        hb = dw(xb, wdw[..., c1:], bdw[c1:], c2)
        return block_core2_in(ha, hb, xa, xb, w1, b1, w2, b2, ws)

    args = (xa, xb, wdw, bdw, w1, b1, w2, b2, ws)

    for tag, f in (("concat", fwd_concat), ("split", fwd_split)):
        def fb(*a):
            y, vjp = jax.vjp(f, *a)
            return vjp(jnp.ones_like(y))

        time_device(f"{name} {tag} fwd", f, *args)
        time_device(f"{name} {tag} fwd+bwd", fb, *args)


if __name__ == "__main__":
    run("uc1  32^2 512+512", 32, 512, 512, 512)
    run("uc2  64^2 256+256", 64, 256, 256, 256)
    run("uc3 128^2 128+128", 128, 128, 128, 128)
    run("uc4 256^2  64+64 ", 256, 64, 64, 64)
