"""Where does the fused train step's time go? Times each macro-component
of the pix2pix step (G fwd, G fwd+bwd, D fwd/bwd, VGG, SSIM, pool, Adam)
on the real chip, plus the full step, so perf work attacks the top item.

Timing method per memory notes: chain N dependent invocations through a
scalar and fetch once (axon relay: block_until_ready returns early,
~30ms RTT per fetch).

Env: BB_BATCH (16), BB_SIZE (256), BB_N (20), BB_GELU (exact|tanh),
BB_ONLY=step to skip the per-component probes and run only the full
fused step + its xprof device-time attribution (the component probes
alone take ~8 compiles / ~7 min through the remote-compile relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BB_BATCH", "16"))
SIZE = int(os.environ.get("BB_SIZE", "256"))
N = int(os.environ.get("BB_N", "20"))

if os.environ.get("BB_GELU", "exact") == "tanh":
    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)

from dsgan_tpu import ops
from dsgan_tpu.models import define_D, define_G, init_params
from dsgan_tpu.models.pix2pix import (
    Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
)
from dsgan_tpu.models.vgg import Vgg16Features
from dsgan_tpu.utils.image_pool import init_pool


def timed(name, fn, *args, flops=None):
    """fn(*args) -> scalar (jitted). Chain N sequential calls via the scalar."""
    fn = jax.jit(fn)
    s = fn(*args)
    float(np.asarray(s))  # compile + sync
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(N):
        s = fn(*args) + s * 1e-30
    float(np.asarray(s))
    dt = (time.perf_counter() - t0) / N
    line = f"{name:34s} {dt*1e3:9.2f} ms"
    if flops:
        line += f"   {flops / dt / 1e12:7.1f} TF/s"
    print(line, flush=True)
    return dt


def main():
    print(f"batch={BATCH} size={SIZE} gelu={os.environ.get('BB_GELU','exact')}")
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16)
    d = define_D(6, 32, "basic", dtype=jnp.bfloat16)
    kg, kd, kv, ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params_G = init_params(g, kg, (1, SIZE, SIZE, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, SIZE, SIZE, 6), "normal")["params"]
    vgg = Vgg16Features(dtype=jnp.bfloat16, num_taps=4)
    vgg_params = vgg.init(kv, jnp.zeros((1, 64, 64, 3)))

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    AB = jnp.concatenate([A, B], axis=-1)
    AB2 = jnp.concatenate([AB, AB], axis=0)

    only_step = os.environ.get("BB_ONLY", "") == "step"

    adam = make_adam(0.5)
    if not only_step:
        # ---- G forward
        def g_fwd(p, x):
            return jnp.sum(g.apply({"params": p}, x).astype(jnp.float32))

        tg = timed("G fwd", g_fwd, params_G, A)

        # ---- G fwd + bwd (params grad)
        def g_fb(p, x):
            l, grads = jax.value_and_grad(g_fwd)(p, x)
            return l + sum(jnp.sum(v.astype(jnp.float32)) * 0 for v in jax.tree_util.tree_leaves(grads))

        tgb = timed("G fwd+bwd", g_fb, params_G, A)

        # ---- D forward on 2*batch (the fused fake;real application)
        def d_fwd(p, x):
            return jnp.sum(d.apply({"params": p}, x).astype(jnp.float32))

        td = timed("D fwd (2B)", d_fwd, params_D, AB2)

        def d_fb(p, x):
            l, grads = jax.value_and_grad(d_fwd)(p, x)
            return l + sum(jnp.sum(v.astype(jnp.float32)) * 0 for v in jax.tree_util.tree_leaves(grads))

        tdb = timed("D fwd+bwd (2B)", d_fb, params_D, AB2)

        # ---- D fwd + grad wrt INPUT (the G-update path through D)
        def d_input_grad(p, x):
            def f(xx):
                return jnp.sum(d.apply({"params": p}, xx).astype(jnp.float32))
            l, gx = jax.value_and_grad(f)(x)
            return l + jnp.sum(gx.astype(jnp.float32)) * 0

        tdg = timed("D fwd+input-grad (B)", d_input_grad, params_D, AB)

        # ---- VGG forward 2B + input grad on half
        def vgg_fb(p, x):
            def f(xx):
                feats = vgg.apply(p, jnp.concatenate([xx, B], axis=0))
                return sum(jnp.sum(jnp.abs(f_[:BATCH].astype(jnp.float32) - f_[BATCH:].astype(jnp.float32))) for f_ in feats[:4])
            l, gx = jax.value_and_grad(f)(x)
            return l + jnp.sum(gx.astype(jnp.float32)) * 0

        tv = timed("VGG fwd(2B)+input-grad", vgg_fb, vgg_params, A)

        # ---- SSIM loss + input grad
        def ssim_fb(x):
            def f(xx):
                return ops.ssim_loss(B, xx)
            l, gx = jax.value_and_grad(f)(x)
            return l + jnp.sum(gx.astype(jnp.float32)) * 0

        ts = timed("SSIM loss+input-grad", ssim_fb, A)

        # ---- Adam update G
        opt_G = adam.init(params_G)

        def adam_g(p, o):
            upd, o2 = adam.update(p, o)  # params as fake grads — same shapes
            s = sum(jnp.sum(v.astype(jnp.float32)) * 1e-30 for v in jax.tree_util.tree_leaves(upd))
            return s + sum(jnp.sum(v.astype(jnp.float32)) * 1e-30 for v in jax.tree_util.tree_leaves(jax.tree_util.tree_leaves(o2)))

        ta = timed("Adam dir (G params)", adam_g, params_G, opt_G)

    # ---- full fused step
    cfg = Pix2PixConfig(pool_size=50, use_vgg=True, compute_dtype=jnp.bfloat16)
    pool_images, pool_count = init_pool(cfg.pool_size, (SIZE, SIZE, 6), jnp.bfloat16)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(g, d, vgg, vgg_params, cfg), donate_argnums=(0,))
    state, metrics, _ = step(state, A, B, jnp.float32(2e-4))
    float(np.asarray(metrics["loss_G"]))
    t0 = time.perf_counter()
    for _ in range(N):
        state, metrics, _ = step(state, A, B, jnp.float32(2e-4))
    float(np.asarray(metrics["loss_G"]))
    tf = (time.perf_counter() - t0) / N
    print(f"{'FULL STEP':34s} {tf*1e3:9.2f} ms   -> {BATCH/tf:7.1f} img/s", flush=True)
    if not only_step:
        known = tgb + tdb + tdg + tv + ts + 2 * ta
        print(f"{'sum of parts (approx)':34s} {known*1e3:9.2f} ms")

    # xprof DEVICE time of the same chained sequence — separates real
    # on-chip time from relay dispatch overhead in the wall number above
    # (the step-budget components in docs/PERF.md sum well below the wall
    # step; this line attributes the difference).
    import glob

    outdir = "/tmp/step_device_trace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(N):
            state, metrics, _ = step(state, A, B, jnp.float32(2e-4))
        float(np.asarray(metrics["loss_G"]))
    from jax.profiler import ProfileData

    total = 0.0
    pd = ProfileData.from_file(
        glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)[0])
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                total += ev.duration_ns / 1e6
    td = total / N / 1e3
    print(f"{'FULL STEP (xprof device)':34s} {td*1e3:9.2f} ms   "
          f"-> {BATCH/td:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
