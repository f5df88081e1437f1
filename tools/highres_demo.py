"""512^2-class high-resolution demo of the flagship generator — the
BASELINE.json stretch config (spatial scaling is this workload's
"long-context" axis, SURVEY.md §5).

Two modes:
  * On the real TPU chip (default): batch-1 512x512 (env HR_SIZE to raise)
    MixConvNeXtML forward with rematerialized blocks, reporting device ms
    and peak-memory fit. Run: `python tools/highres_demo.py`.
  * Spatially sharded on the virtual CPU mesh:
    `JAX_PLATFORMS=cpu HR_MESH=1 python tools/highres_demo.py` — the same
    forward H-sharded over a (1,8) mesh with XLA halo exchanges, checked
    numerically against the unsharded result.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = int(os.environ.get("HR_SIZE", "512"))
USE_MESH = os.environ.get("HR_MESH", "0") == "1"

if USE_MESH and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

if USE_MESH:
    jax.config.update("jax_platforms", "cpu")

from dsgan_tpu.models import define_G, init_params


def main():
    dtype = jnp.bfloat16
    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=dtype, remat=True,
                 inference=True)
    params = init_params(g, jax.random.PRNGKey(0), (1, SIZE, SIZE, 3), "normal")["params"]
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, SIZE, SIZE, 3)).astype(np.float32)
    )

    if USE_MESH:
        from dsgan_tpu.parallel import get_mesh, make_parallel_infer, replicate, shard_batch

        mesh = get_mesh(1, 8)
        infer = make_parallel_infer(lambda p, x: g.apply({"params": p}, x), mesh)
        y_ref = g.apply({"params": params}, x)
        y = infer(replicate(params, mesh), shard_batch(np.asarray(x), mesh))
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32))))
        print(f"spatial-sharded {SIZE}^2 forward on (1,8) CPU mesh: "
              f"shape={tuple(y.shape)} maxdiff_vs_unsharded={err:.3e}")
        assert err < 2e-2
        return

    # device time via xprof (wall-clock through the axon relay adds
    # seconds of transfer/dispatch overhead that is not the chip's cost)
    from tools.opbench import time_device

    fwd = lambda p, x: g.apply({"params": p}, x)
    dt = time_device(f"{SIZE}x{SIZE} batch-1 forward", fwd, params, x, n=5)
    y = jax.jit(fwd)(params, x)
    print(f"{SIZE}x{SIZE} batch-1 MixConvNeXtML forward on "
          f"{jax.devices()[0].device_kind}: {dt*1e3:.1f} ms device/frame "
          f"({1.0/dt:.1f} fps), output {tuple(y.shape)} {y.dtype}")


if __name__ == "__main__":
    main()
