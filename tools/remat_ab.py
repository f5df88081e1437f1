"""Remat policy device A/B for the FULL fused train step (VERDICT r3 #2 /
r4 #2a): remat=False vs remat="dots" (save matmul outputs, recompute the
IN/GELU/elementwise chains) vs remat=True (save nothing).

Rationale: the step is HBM-bandwidth-bound (62% of its own BW bound,
docs/PERF.md) — remat trades bytes (saved residuals) for flops, the one
direction that can move a BW-bound program. This tool measures it
honestly:

- ONE process, all three variants compiled up front, measurements
  INTERLEAVED (A/B/C repeated REPS times) — immune to relay/session
  drift (docs/PERF.md round-5 lesson: cross-run comparisons are
  confounded by >2x relay drift).
- Device time via xprof (sum of the XLA Modules line), not wall clock.
- Per-variant compiled memory analysis (argument + temp bytes) so the
  bytes-for-flops trade is visible, not inferred.

Env: RA_BATCH (16), RA_SIZE (256), RA_N (10 steps per traced rep),
RA_REPS (3), RA_VGG (1), RA_MODES (comma list, default "0,dots,1").
Run on the real chip.
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("RA_BATCH", "16"))
SIZE = int(os.environ.get("RA_SIZE", "256"))
N = int(os.environ.get("RA_N", "10"))
REPS = int(os.environ.get("RA_REPS", "3"))
USE_VGG = os.environ.get("RA_VGG", "1") == "1"
MODES = os.environ.get("RA_MODES", "0,dots,1").split(",")

from dsgan_tpu.models.layers import set_gelu_mode

set_gelu_mode(True)  # the CLI's bf16 resolution — same as bench.py

from dsgan_tpu.models import define_D, define_G, init_params
from dsgan_tpu.models.pix2pix import (
    Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
)
from dsgan_tpu.models.vgg import Vgg16Features
from dsgan_tpu.utils.image_pool import init_pool


def build(remat):
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16, remat=remat)
    d = define_D(6, 32, "basic", dtype=jnp.bfloat16)
    kg, kd, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params_G = init_params(g, kg, (1, SIZE, SIZE, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, SIZE, SIZE, 6), "normal")["params"]
    vgg = Vgg16Features(dtype=jnp.bfloat16, num_taps=4) if USE_VGG else None
    vgg_params = vgg.init(kv, jnp.zeros((1, 64, 64, 3))) if USE_VGG else None
    cfg = Pix2PixConfig(pool_size=50, use_vgg=USE_VGG,
                        compute_dtype=jnp.bfloat16)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(cfg.pool_size, (SIZE, SIZE, 6),
                                        jnp.bfloat16)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    # NO donation: every variant re-steps from the SAME resident state so
    # the three variants stay independently re-runnable all session.
    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg))
    return step, state


def device_ms(tag, step, state, A, B, lr):
    outdir = f"/tmp/remat_ab_{tag}_{time.monotonic_ns() % 10**9}"
    with jax.profiler.trace(outdir):
        s = state
        for _ in range(N):
            s, metrics, _ = step(s, A, B, lr)
        float(np.asarray(metrics["loss_G"]))
    total = 0.0
    paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(paths[0])
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                total += ev.duration_ns / 1e6
    os.system(f"rm -rf {outdir}")
    return total / N


def main():
    print(f"batch={BATCH} size={SIZE} vgg={USE_VGG} n={N} reps={REPS} "
          f"modes={MODES}", flush=True)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    lr = jnp.float32(2e-4)

    variants = {}
    for m in MODES:
        remat = {"0": False, "1": True}.get(m, m)
        t0 = time.perf_counter()
        step, state = build(remat)
        lowered = step.lower(state, A, B, lr)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        # warmup: one executed step, fetched
        s2, metrics, _ = step(state, A, B, lr)
        float(np.asarray(metrics["loss_G"]))
        print(f"[{m}] compiled in {time.perf_counter()-t0:.1f}s  "
              f"temp={mem.temp_size_in_bytes/2**30:.2f} GiB  "
              f"args={mem.argument_size_in_bytes/2**30:.2f} GiB  "
              f"output={mem.output_size_in_bytes/2**30:.2f} GiB", flush=True)
        variants[m] = (step, state)

    results = {m: [] for m in MODES}
    for rep in range(REPS):
        for m in MODES:
            step, state = variants[m]
            ms = device_ms(f"{m}_{rep}", step, state, A, B, lr)
            results[m].append(ms)
            print(f"rep {rep} [{m}]: {ms:.2f} ms device/step "
                  f"({BATCH/ms*1e3:.1f} img/s)", flush=True)

    print("\n=== summary (device ms/step, min over reps) ===")
    for m in MODES:
        best = min(results[m])
        print(f"remat={m:5s}: {best:7.2f} ms  {BATCH/best*1e3:6.1f} img/s   "
              f"all={['%.2f' % x for x in results[m]]}")


if __name__ == "__main__":
    main()
