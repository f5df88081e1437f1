"""Throughput benchmark: full G+D fused train step, default DS-GAN recipe
(MixConvNeXtML + conditional PatchGAN + L1/VGG/TV/SSIM composite loss,
bf16 compute) at 256x256 on the visible accelerator.

Prints ONE JSON line:
  {"metric": "train_images_per_sec", "value": N, "unit": "img/s",
   "vs_baseline": N / 1000}
vs_baseline is against the 1,000 img/s/chip north star in BASELINE.md
(the reference publishes no throughput numbers).

Env knobs: BENCH_BATCH (default 16 — the measured v5e sweet spot;
32 is slightly slower), BENCH_STEPS (default 20), BENCH_SIZE (default
256), BENCH_VGG=0 to drop the perceptual term, BENCH_GELU=exact for erf
GELU (default tanh == the CLI's `--gelu auto` resolution for bf16;
proven <=1 ulp from erf in bf16, tests/test_ops_misc.py). This IS the
out-of-the-box training configuration: bf16 compute path, fused Pallas
block kernels ON (as in the CLI on TPU), pool 50, all loss terms.
"""

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def _watchdog(seconds):
    """Fail CLEANLY if the accelerator relay is hung (observed: hours-long
    axon outages where even a 256x256 matmul never completes). A bench
    that hangs blocks the whole round pipeline; a timed-out bench is an
    honest 'device unreachable' signal instead of a fabricated number."""

    def boom():
        print(f"BENCH WATCHDOG: no result after {seconds}s — accelerator "
              "relay unresponsive; aborting without a metric.",
              file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main():
    timer = _watchdog(int(os.environ.get("BENCH_WATCHDOG_S", "1800")))
    if os.environ.get("BENCH_GELU", "tanh") != "exact":
        from dsgan_tpu.models.layers import set_gelu_mode

        set_gelu_mode(True)
    from dsgan_tpu.models import define_D, define_G, init_params
    from dsgan_tpu.models.pix2pix import (
        Pix2PixConfig,
        Pix2PixState,
        make_adam,
        make_train_step,
    )
    from dsgan_tpu.models.vgg import Vgg16Features
    from dsgan_tpu.utils.image_pool import init_pool

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    size = int(os.environ.get("BENCH_SIZE", "256"))
    use_vgg = os.environ.get("BENCH_VGG", "1") == "1"
    # BENCH_REMAT: 0 (default) | 1 (full block remat) | dots (save matmul
    # outputs, recompute IN/GELU chains) — the remat-for-bandwidth A/B
    remat = {"0": False, "1": True}.get(
        os.environ.get("BENCH_REMAT", "0"), os.environ.get("BENCH_REMAT"))

    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16, remat=remat)
    d = define_D(6, 32, "basic", dtype=jnp.bfloat16)
    kg, kd, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params_G = init_params(g, kg, (1, size, size, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, size, size, 6), "normal")["params"]

    vgg = Vgg16Features(dtype=jnp.bfloat16, num_taps=4) if use_vgg else None
    vgg_params = vgg.init(kv, jnp.zeros((1, 64, 64, 3))) if use_vgg else None

    cfg = Pix2PixConfig(pool_size=50, use_vgg=use_vgg, compute_dtype=jnp.bfloat16)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(cfg.pool_size, (size, size, 6), jnp.bfloat16)
    state = Pix2PixState(
        params_G=params_G,
        params_D=params_D,
        opt_G=adam.init(params_G),
        opt_D=adam.init(params_D),
        pool_images=pool_images,
        pool_count=pool_count,
        rng=ks,
        step=jnp.zeros((), jnp.int32),
    )

    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg), donate_argnums=(0,))

    # Optional XLA compiler-option overrides, e.g.
    #   BENCH_XLA_OPTS="xla_tpu_rwb_fusion=false,xla_tpu_msa_use_minimalloc=true"
    # Passed per-compile (compiler_options) because the local jaxlib's
    # XLA_FLAGS parser fatally rejects tpu-only flags; compiler_options
    # serialize into the compile request and are validated by the real
    # TPU compiler (relay-safe).
    xla_opts = os.environ.get("BENCH_XLA_OPTS", "")
    if xla_opts:
        opts = dict(kv.split("=", 1) for kv in xla_opts.split(",") if kv)
        compiled = [None]
        inner = step

        def step(*args):
            if compiled[0] is None:
                compiled[0] = inner.lower(*args).compile(compiler_options=opts)
            return compiled[0](*args)

    rng = np.random.default_rng(0)
    real_A = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32))
    real_B = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32))
    lr = jnp.float32(2e-4)

    # warmup / compile (host fetch forces real completion — plain
    # block_until_ready returns early through the axon relay)
    for _ in range(3):
        state, metrics, _ = step(state, real_A, real_B, lr)
    float(np.asarray(metrics["loss_G"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics, _ = step(state, real_A, real_B, lr)
    # steps chain through the donated state, so fetching the last loss
    # forces completion of the whole timed sequence
    float(np.asarray(metrics["loss_G"]))
    dt = time.perf_counter() - t0

    ips = batch * steps / dt
    timer.cancel()
    print(json.dumps({
        "metric": "train_images_per_sec",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
