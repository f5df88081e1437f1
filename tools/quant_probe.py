"""Probe: does int8 beat bf16 on this chip for the serving forward's ops?

v5e MXU peak is 394 int8 TOPS vs 197 bf16 TFLOPs, so a compute-bound op
has 2x headroom; a VPU- or HBM-bound op has none. Decides whether the
quantized-serving lever (ROADMAP round-4 candidate) is worth building.

Measurement rules (docs/PERF.md): the axon relay adds ~30 ms of dispatch
round-trip per blocking call, so single-op timings are meaningless (the
v1 of this probe measured exactly that floor for every shape). Every
timing below chains ITERS data-dependent iterations inside ONE jitted
dispatch via lax.fori_loop and reports per-iteration time. All operands
are jit ARGUMENTS, never closures (a closed-over 128 MB x0 becomes an
HLO literal and stalls the remote compile — PERF.md rule 4).

Shapes are the MixConvNeXtML serving forward's production GEMMs (the
Block pointwise MLP (M,C)@(C,4C)@(4C,C) at batch-16 @256^2 serving, the
throughput-optimal config per BENCH_SERVE_r03) and the 3x3 fusion conv.
The int8 variant includes the per-layer requantize (scale+clip+cast)
that a real PTQ dataflow pays; w8a16 dequantizes int8 weights to bf16
at use (the weights-only PTQ dataflow).

Run: JAX_PLATFORMS=... python -u tools/quant_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("QP_ITERS", "100"))
BATCH = int(os.environ.get("QP_BATCH", "16"))


def time_chained(fn, args, steps=3):
    """Median wall time per chained iteration of jitted fn(*args)."""
    out = fn(*args)
    np.asarray(out)  # force completion (relay-safe)
    ts = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3 / ITERS)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def mk(shape, dtype):
        if dtype == jnp.int8:
            return jnp.asarray(rng.integers(-127, 127, shape, dtype=np.int8))
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)

    print(f"devices: {jax.devices()}  iters/dispatch: {ITERS}  batch: {BATCH}")

    @jax.jit
    def mlp_bf(x0, w1, w2):
        def body(_, h):
            a = lax.dot(h, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return lax.dot(a, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return lax.fori_loop(0, ITERS, body, x0)

    @jax.jit
    def mlp_i8(x0, w1, w2):
        def body(_, h):
            a = lax.dot(h, w1, preferred_element_type=jnp.int32)
            a = jnp.clip(a.astype(jnp.float32) * 0.01, -127, 127).astype(jnp.int8)
            o = lax.dot(a, w2, preferred_element_type=jnp.int32)
            return jnp.clip(o.astype(jnp.float32) * 0.01, -127, 127).astype(jnp.int8)
        return lax.fori_loop(0, ITERS, body, x0)

    @jax.jit
    def mlp_w8(x0, w1, w2):
        def body(_, h):
            a = lax.dot(h, w1.astype(jnp.bfloat16) * 0.01,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return lax.dot(a, w2.astype(jnp.bfloat16) * 0.01,
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return lax.fori_loop(0, ITERS, body, x0)

    # three representative stages: bandwidth-bound (64@256), mid (256@64),
    # compute-heavy (1024@16); remote compiles are slow, keep the set small.
    print("\n-- Block pointwise-MLP pair (M,C)@(C,4C)@(4C,C), per-iter ms --")
    for c, hw in ((64, 256), (256, 64), (1024, 16)):
        m = BATCH * hw * hw
        gf = 2 * m * c * 4 * c * 2 / 1e9
        tb = time_chained(mlp_bf, (mk((m, c), jnp.bfloat16),
                                   mk((c, 4 * c), jnp.bfloat16),
                                   mk((4 * c, c), jnp.bfloat16)))
        t8 = time_chained(mlp_i8, (mk((m, c), jnp.int8),
                                   mk((c, 4 * c), jnp.int8),
                                   mk((4 * c, c), jnp.int8)))
        tw = time_chained(mlp_w8, (mk((m, c), jnp.bfloat16),
                                   mk((c, 4 * c), jnp.int8),
                                   mk((4 * c, c), jnp.int8)))
        print(f"C={c:>4} M={m:>7}: bf16 {tb:7.3f} ({gf/tb:6.1f} GF/ms)"
              f"  int8 {t8:7.3f} ({tb/t8:4.2f}x)  w8a16 {tw:7.3f} ({tb/tw:4.2f}x)",
              flush=True)

    # --- dense 3x3 conv at the mid-stage shape (C->C so it chains) ---
    print("\n-- conv 3x3 same NHWC, per-iter ms --")
    hw, c = 128, 128
    dn = lax.conv_dimension_numbers((BATCH, hw, hw, c), (3, 3, c, c),
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf(x0, w):
        def body(_, h):
            return lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return lax.fori_loop(0, ITERS, body, x0)

    @jax.jit
    def conv_i8(x0, w):
        def body(_, h):
            o = lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.clip(o.astype(jnp.float32) * 0.01, -127, 127).astype(jnp.int8)
        return lax.fori_loop(0, ITERS, body, x0)

    gf = 2 * BATCH * hw * hw * 9 * c * c / 1e9
    tb = time_chained(conv_bf, (mk((BATCH, hw, hw, c), jnp.bfloat16),
                                mk((3, 3, c, c), jnp.bfloat16)))
    try:
        t8 = time_chained(conv_i8, (mk((BATCH, hw, hw, c), jnp.int8),
                                    mk((3, 3, c, c), jnp.int8)))
        msg = f"int8 {t8:7.3f} ({tb/t8:4.2f}x)"
    except Exception as e:  # pragma: no cover - backend support probe
        msg = f"int8 UNSUPPORTED: {type(e).__name__}"
    print(f"{hw}^2 C={c:>3}: bf16 {tb:7.3f} ({gf/tb:6.1f} GF/ms)  {msg}")


if __name__ == "__main__":
    main()
