"""Capture an xprof trace of the full fused train step and print a
per-op-category time breakdown (parsed with jax.profiler.ProfileData —
no TensorBoard needed).

Env: PS_BATCH (16), PS_SIZE (256), PS_GELU (exact|tanh), PS_TOP (30).
"""

import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("PS_BATCH", "16"))
SIZE = int(os.environ.get("PS_SIZE", "256"))
TOP = int(os.environ.get("PS_TOP", "30"))

if os.environ.get("PS_GELU", "exact") == "tanh":
    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)

from dsgan_tpu.models import define_D, define_G, init_params
from dsgan_tpu.models.pix2pix import (
    Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
)
from dsgan_tpu.models.vgg import Vgg16Features
from dsgan_tpu.utils.image_pool import init_pool


def build_step():
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16)
    d = define_D(6, 32, "basic", dtype=jnp.bfloat16)
    kg, kd, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params_G = init_params(g, kg, (1, SIZE, SIZE, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, SIZE, SIZE, 6), "normal")["params"]
    vgg = Vgg16Features(dtype=jnp.bfloat16, num_taps=4)
    vgg_params = vgg.init(kv, jnp.zeros((1, 64, 64, 3)))
    cfg = Pix2PixConfig(pool_size=50, use_vgg=True, compute_dtype=jnp.bfloat16)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(cfg.pool_size, (SIZE, SIZE, 6), jnp.bfloat16)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg), donate_argnums=(0,))
    return step, state


def main():
    step, state = build_step()
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    lr = jnp.float32(2e-4)
    for _ in range(3):
        state, metrics, _ = step(state, A, B, lr)
    float(np.asarray(metrics["loss_G"]))

    outdir = "/tmp/xprof_step"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, metrics, _ = step(state, A, B, lr)
        float(np.asarray(metrics["loss_G"]))

    # parse
    from jax.profiler import ProfileData

    paths = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    pd = ProfileData.from_file(paths[0])
    cat = defaultdict(float)
    byname = defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                total += dur
                byname[name] += dur
                # category = fusion kind / op stem
                stem = re.sub(r"[.\d]+$", "", name)
                cat[stem] += dur
    n_steps = 3.0
    print(f"total device time/step: {total/n_steps:.2f} ms  (batch={BATCH})")
    print("\n-- by category --")
    for kk, v in sorted(cat.items(), key=lambda x: -x[1])[:15]:
        print(f"{kk:40s} {v/n_steps:9.3f} ms")
    print("\n-- top ops --")
    for kk, v in sorted(byname.items(), key=lambda x: -x[1])[:TOP]:
        print(f"{kk:64s} {v/n_steps:9.3f} ms")


if __name__ == "__main__":
    main()
