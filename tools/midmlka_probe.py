"""Isolated MidMLKA / local-stream probes: separate real device cost from
trace misattribution at the local/upc* scopes (the round-3 trace charges
~14.5 ms to upc3 alone; isolated truth below decides the next kernel).

Probes (v5e, b16, bf16, fwd+bwd unless noted):
  * MidMLKA at each production shape (32@128^2 ... 256@16^2, upc1-3)
  * the dw bank conv alone at those shapes (fwd, fwd+bwd)
  * full OriginMLKA local stream
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dsgan_tpu.models.layers import set_gelu_mode

set_gelu_mode(True)

from dsgan_tpu.models.mixconvnext import MidMLKA, OriginMLKA
from tools.opbench import time_device

B = int(os.environ.get("MP_BATCH", "16"))
DT = jnp.bfloat16


def fwd_bwd(mod, x):
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        return jnp.sum(mod.apply(p, xx).astype(jnp.float32))

    g = jax.grad(loss, argnums=(0, 1))

    def run(p, xx):
        gs = g(p, xx)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), gs, 0.0
        )

    return run, params


def main():
    group = os.environ.get("MP_GROUP", "all")
    shapes = [
        ("mid32", 32, 128),
        ("mid64", 64, 64),
        ("mid128", 128, 32),
        ("mid256", 256, 16),
        ("upc1", 128, 32),
        ("upc2", 128, 64),
        ("upc3", 128, 128),
    ]
    if group == "a":
        shapes = shapes[:4]
    elif group == "b":
        shapes = shapes[4:]
    elif group in ("c", "d"):
        shapes = []
    for name, c, hw in shapes:
        x = jnp.asarray(np.random.randn(B, hw, hw, c), DT)
        mod = MidMLKA(dtype=DT)
        run, params = fwd_bwd(mod, x)
        time_device(f"MidMLKA {name} {c}ch@{hw}^2 f+b", run, params, x)

    # dw bank conv alone (the fused 9x9 grouped conv), fwd and fwd+bwd
    dw_shapes = [("mid32", 32, 128), ("upc2", 128, 64), ("upc3", 128, 128)]
    if group in ("a", "d"):
        dw_shapes = []
    elif group == "b":
        dw_shapes = dw_shapes[:1]
    elif group == "c":
        dw_shapes = dw_shapes[1:]
    for name, c, hw in dw_shapes:
        x = jnp.asarray(np.random.randn(B, hw, hw, c), DT)
        w = jnp.asarray(np.random.randn(9, 9, 1, c) * 0.02, DT)
        b = jnp.zeros((c,), DT)

        from dsgan_tpu import ops

        def fwd(xx, ww=w, bb=b, cc=c):
            return ops.conv2d(xx, ww, bb, stride=1, padding=4, groups=cc)

        time_device(f"dwbank9 {name} {c}ch@{hw}^2 fwd", fwd, x)

        def fb(xx, ww=w, cc=c):
            def loss(xi, wi):
                return jnp.sum(
                    ops.conv2d(xi, wi, None, stride=1, padding=4, groups=cc).astype(
                        jnp.float32
                    )
                )

            gx, gw = jax.grad(loss, argnums=(0, 1))(xx, ww)
            return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(gw.astype(jnp.float32))

        time_device(f"dwbank9 {name} {c}ch@{hw}^2 f+b", fb, x)

    # ablations: where does MidMLKA's non-conv time go?
    if group == "d":
        from dsgan_tpu import ops
        from dsgan_tpu.models.mixconvnext import ChannelAttention
        from dsgan_tpu.models.layers import Conv, gelu
        from typing import Any

        import flax.linen as nn

        class MidAblate(nn.Module):
            dtype: Any = DT
            use_bank: bool = True
            use_conv1: bool = True
            use_gate: bool = True
            use_in: bool = True

            @nn.compact
            def __call__(self, x):
                dim = x.shape[-1]
                out = x
                if self.use_bank:
                    w = self.param("wk", nn.initializers.normal(0.02),
                                   (9, 9, 1, dim), jnp.float32)
                    b = self.param("bk", nn.initializers.zeros, (dim,), jnp.float32)
                    wk, bk = jax.lax.optimization_barrier(
                        (w.astype(x.dtype), b.astype(x.dtype)))
                    out = ops.conv2d(out, wk, bk, stride=1, padding=4, groups=dim)
                if self.use_conv1:
                    out = Conv(dim, 1, dtype=self.dtype, name="conv")(out)
                if self.use_gate:
                    gate = ChannelAttention(dtype=self.dtype, name="attn")(out)
                    gf = gate[:, 0, 0, :].astype(jnp.float32)
                else:
                    gf = jnp.ones((x.shape[0], dim), jnp.float32)
                if self.use_in:
                    xf = out.astype(jnp.float32)
                    mean = jnp.mean(xf, axis=(1, 2))
                    var = jnp.maximum(
                        jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(mean), 0.0)
                    s = gf * jax.lax.rsqrt(jnp.square(gf) * var + 1e-5)
                    scale = s[:, None, None, :].astype(out.dtype)
                    shift = (mean * s)[:, None, None, :].astype(out.dtype)
                    out = out * scale - shift
                return gelu(out + x)

        abl_shapes = {"mid32": [("mid32", 32, 128)], "upc3": [("upc3", 128, 128)]}
        which = os.environ.get("MP_ABL", "mid32")
        for name, c, hw in abl_shapes[which]:
            x = jnp.asarray(np.random.randn(B, hw, hw, c), DT)
            for tag, kw in [
                ("full", {}),
                ("nogate", dict(use_gate=False)),
                ("nogate-noin", dict(use_gate=False, use_in=False)),
                ("bank-only", dict(use_conv1=False, use_gate=False, use_in=False)),
            ]:
                mod = MidAblate(**kw)
                run, params = fwd_bwd(mod, x)
                time_device(f"MidAblate {name} {tag} f+b", run, params, x)
        return

    # full local stream
    if group in ("all", "c"):
        x = jnp.asarray(np.random.randn(B, 256, 256, 3), DT)
        mod = OriginMLKA(dtype=DT)
        run, params = fwd_bwd(mod, x)
        time_device("OriginMLKA 256^2 f+b", run, params, x)


if __name__ == "__main__":
    main()
