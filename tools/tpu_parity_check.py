"""On-hardware parity check for the Pallas kernels that ship default-ON.

The CPU test suite proves the kernels in interpreter mode
(tests/test_pallas.py); this script re-proves them against the XLA
reference ON THE REAL CHIP (Mosaic lowering, bf16 MXU/VPU behavior),
fwd AND every cotangent of the custom VJP, at a production decoder shape.

Run: python tools/tpu_parity_check.py   (exits non-zero on mismatch)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dsgan_tpu import ops
from dsgan_tpu.pallas.block_core import block_core_in, block_core_reference


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    dt = jnp.bfloat16
    B, R, C, P = 4, 128, 128, 64
    H4 = 4 * C
    mkf = lambda s, k: jnp.asarray(
        np.random.default_rng(k).standard_normal(s).astype(np.float32)
    )
    h = mkf((B, R, R, C), 1).astype(dt)
    x = mkf((B, R, R, C), 2).astype(dt)
    w1 = (mkf((C, H4), 3) * 0.05).astype(dt)
    b1 = mkf((H4,), 4).astype(dt)
    w2 = (mkf((H4, P), 5) * 0.05).astype(dt)
    b2 = mkf((P,), 6).astype(dt)
    ws = (mkf((C, P), 7) * 0.05).astype(dt)
    args = (h, x, w1, b1, w2, b2, ws)

    def ref(a):
        hh, xx, w1, b1, w2, b2, ws = a
        mean, rsig = ops.instance_stats(hh)
        return block_core_reference(hh, xx, mean, rsig, w1, b1, w2, b2, ws)

    def pal(a):
        return block_core_in(*a, False)

    got = jax.jit(pal)(args)
    want = jax.jit(ref)(args)
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    print(f"fwd: maxdiff {d:.4f} on outputs up to {scale:.2f} "
          f"(rel {d / scale:.2e})")
    ok = d / scale < 2e-2

    tgt = mkf((B, R, R, P), 9)
    gr = jax.jit(jax.grad(lambda a: jnp.mean(jnp.square(ref(a).astype(jnp.float32) - tgt))))(args)
    gp = jax.jit(jax.grad(lambda a: jnp.mean(jnp.square(pal(a).astype(jnp.float32) - tgt))))(args)
    for name, a, b in zip("h x w1 b1 w2 b2 ws".split(), gr, gp):
        af = np.asarray(a, np.float32)
        bf = np.asarray(b, np.float32)
        s = float(np.max(np.abs(af))) + 1e-12
        dd = float(np.max(np.abs(af - bf)))
        rel = dd / s
        print(f"grad {name:3s}: maxdiff {dd:.3e} rel {rel:.3e}")
        ok = ok and rel < 5e-2
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
