"""Count the sharded train step's communication (VERDICT r3 weak #5).

Compiles (never executes) the production fused pix2pix step over virtual
CPU meshes and tallies every collective the GSPMD partitioner inserted:
gradient all-reduces on the data axis, conv-halo collective-permutes on
the spatial axis. Prints a per-mesh table of payload bytes, the analytic
expectation (param bytes of grad reductions once per mesh axis;
2*(k//2) halo rows per spatial cut per conv), and a predicted
img/s-vs-chips curve against a stated ICI bandwidth.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/comms_audit.py [--res 256] [--batch 8] [--json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np


def build(res, batch, ngf, netG, dtype_str):
    import jax
    import jax.numpy as jnp

    from dsgan_tpu.models import define_D, define_G, init_params
    from dsgan_tpu.models.pix2pix import (
        Pix2PixConfig, Pix2PixState, make_adam, make_train_step,
    )
    from dsgan_tpu.utils.image_pool import init_pool

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_str]
    g = define_G(3, 3, ngf, netG, dtype=dtype)
    d = define_D(6, ngf, "basic", dtype=dtype)
    kg, kd, ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params_G = init_params(g, kg, (1, res, res, 3), "normal")["params"]
    params_D = init_params(d, kd, (1, res, res, 6), "normal")["params"]
    cfg = Pix2PixConfig(pool_size=0, use_vgg=False)
    adam = make_adam(cfg.beta1)
    pool_images, pool_count = init_pool(0, (res, res, 6), jnp.float32)
    state = Pix2PixState(
        params_G=params_G, params_D=params_D,
        opt_G=adam.init(params_G), opt_D=adam.init(params_D),
        pool_images=pool_images, pool_count=pool_count,
        rng=ks, step=jnp.zeros((), jnp.int32),
    )
    step_fn = make_train_step(g, d, None, None, cfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(
        {"G": params_G, "D": params_D}))
    return step_fn, state, n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ngf", type=int, default=32)
    ap.add_argument("--netG", default="MixConvNeXtML")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--step_ms", type=float, default=0.0,
                    help="single-chip step time for the scaling projection "
                         "(0 = skip; use BENCH_r* device number)")
    ap.add_argument("--meshes", default="8x1,4x2,2x4",
                    help="comma list of dataxspatial mesh shapes")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dsgan_tpu.parallel import get_mesh
    from dsgan_tpu.parallel.comms import (
        audit_train_step, predict_step_comms_seconds,
    )

    step_fn, state, n_params = build(
        args.res, args.batch, args.ngf, args.netG, args.dtype)
    rng = np.random.default_rng(0)
    A = rng.uniform(-1, 1, (args.batch, args.res, args.res, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (args.batch, args.res, args.res, 3)).astype(np.float32)
    lr = jnp.float32(2e-4)

    grad_bytes = n_params * 4  # f32 grads, each param reduced once per axis
    results = []
    meshes = [tuple(int(x) for x in m.split("x"))
              for m in args.meshes.split(",")]
    for data, spatial in meshes:
        mesh = get_mesh(data, spatial)
        stats, cost = audit_train_step(step_fn, mesh, state, A, B, lr)
        total = sum(s["bytes"] for s in stats.values())
        t_comm = predict_step_comms_seconds(stats, (data, spatial))
        row = {
            "mesh": f"data={data} spatial={spatial}",
            "collectives": stats,
            "total_payload_bytes": total,
            "param_count": n_params,
            "grad_reduce_expected_bytes": grad_bytes,
            "predicted_comms_ms_per_step": round(t_comm * 1e3, 3),
            "xla_flops": cost.get("flops"),
        }
        if args.step_ms:
            # weak-scaling projection: each chip keeps the single-chip
            # per-chip batch, so per-chip compute time stays step_ms and
            # the mesh multiplies throughput by n; comms (not overlapped,
            # conservative) adds t_comm on top.
            n = data * spatial
            t_c = args.step_ms / 1e3
            row["projected_step_ms_no_overlap"] = round(
                (t_c + t_comm) * 1e3, 2)
            row["projected_scaling_eff"] = round(t_c / (t_c + t_comm), 4)
            row["projected_img_per_s"] = round(
                n * args.batch / (t_c + t_comm), 1)
        results.append(row)
        if not args.json:
            print(f"\n== {row['mesh']}  (batch {args.batch}, {args.res}^2, "
                  f"{args.netG} ngf={args.ngf} {args.dtype})")
            for op, s in sorted(stats.items()):
                print(f"  {op:20s} x{s['count']:<4d} {s['bytes']/1e6:10.2f} MB")
            print(f"  total payload        {total/1e6:10.2f} MB/step")
            print(f"  grad-reduce expectation ({n_params} params x 4B, "
                  f"once per mesh axis): {grad_bytes/1e6:.2f} MB")
            print(f"  predicted wire time @45GB/s/link: "
                  f"{row['predicted_comms_ms_per_step']} ms/step")

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
