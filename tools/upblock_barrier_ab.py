"""In-step device A/B of the UpBlock concat materialization barrier
(DSGAN_UPBLOCK_BARRIER), the fix for the round-5 thunk-audit LEADs: the
local-stream MidMLKA bank convs (upc2/upc3 fwd + dW) run at ~20 GB/s and
~1 TF/s in-step because XLA fuses the UpBlock concat (pad+maximum kLoop)
into the depthwise conv thunks as a producer.

One process, both variants compiled up front, measurements interleaved
(drift-proof); device time via xprof. Env: UB_BATCH (16), UB_SIZE (256),
UB_N (10), UB_REPS (3).
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("UB_BATCH", "16"))
SIZE = int(os.environ.get("UB_SIZE", "256"))
N = int(os.environ.get("UB_N", "10"))
REPS = int(os.environ.get("UB_REPS", "3"))

from dsgan_tpu.models.layers import set_gelu_mode

set_gelu_mode(True)

from dsgan_tpu.models import define_D, define_G, init_params
from dsgan_tpu.models.pix2pix import (
    Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
)
from dsgan_tpu.models.vgg import Vgg16Features
from dsgan_tpu.utils.image_pool import init_pool


def build():
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16)
    d = define_D(6, 32, "basic", dtype=jnp.bfloat16)
    kg, kd, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params_G = init_params(g, kg, (1, SIZE, SIZE, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, SIZE, SIZE, 6), "normal")["params"]
    vgg = Vgg16Features(dtype=jnp.bfloat16, num_taps=4)
    vgg_params = vgg.init(kv, jnp.zeros((1, 64, 64, 3)))
    cfg = Pix2PixConfig(pool_size=50, use_vgg=True, compute_dtype=jnp.bfloat16)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(cfg.pool_size, (SIZE, SIZE, 6),
                                        jnp.bfloat16)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg))
    return step, state


def device_ms(tag, step, state, A, B, lr):
    outdir = f"/tmp/ub_ab_{tag}_{time.monotonic_ns() % 10**9}"
    with jax.profiler.trace(outdir):
        s = state
        for _ in range(N):
            s, metrics, _ = step(s, A, B, lr)
        float(np.asarray(metrics["loss_G"]))
    total = 0.0
    from jax.profiler import ProfileData

    paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
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
    print(f"batch={BATCH} size={SIZE} n={N} reps={REPS}", flush=True)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    lr = jnp.float32(2e-4)

    variants = {}
    for m in ("off", "on"):
        os.environ["DSGAN_UPBLOCK_BARRIER"] = "1" if m == "on" else "0"
        t0 = time.perf_counter()
        step, state = build()
        s2, metrics, _ = step(state, A, B, lr)
        lg = float(np.asarray(metrics["loss_G"]))
        print(f"[{m}] compiled+warm in {time.perf_counter()-t0:.1f}s  "
              f"loss_G={lg:.6f}", flush=True)
        variants[m] = (step, state)

    results = {m: [] for m in variants}
    for rep in range(REPS):
        for m in variants:
            step, state = variants[m]
            ms = device_ms(f"{m}_{rep}", step, state, A, B, lr)
            results[m].append(ms)
            print(f"rep {rep} [{m}]: {ms:.2f} ms device/step "
                  f"({BATCH/ms*1e3:.1f} img/s)", flush=True)

    print("\n=== summary (device ms/step, min over reps) ===")
    for m in results:
        best = min(results[m])
        print(f"barrier={m:3s}: {best:7.2f} ms  {BATCH/best*1e3:6.1f} img/s  "
              f"all={['%.2f' % x for x in results[m]]}")


if __name__ == "__main__":
    main()
