"""Device-time probe for the serving batch-size anomaly (VERDICT r3 #5 /
r4 #2c): per-image DEVICE cost of the exported uint8->uint8 serving
program at several batch sizes, one process, xprof-timed — separates a
real compiled-program effect from relay dispatch variance.

Env: SBP_BATCHES ("1,2,4,8,16"), SBP_SIZE (256), SBP_N (20).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsgan_tpu import ops
    from dsgan_tpu.models import define_G, init_params
    from dsgan_tpu.models.pix2pix import _apply_net

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from opbench import time_device

    size = int(os.environ.get("SBP_SIZE", "256"))
    n = int(os.environ.get("SBP_N", "20"))
    batches = [int(b) for b in os.environ.get("SBP_BATCHES", "1,2,4,8,16").split(",")]

    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=jnp.bfloat16, inference=True)
    variables = init_params(g, jax.random.PRNGKey(0), (1, size, size, 3), "normal")

    def serve(x):
        y = _apply_net(g, variables["params"], ops.normalize_u8(x), False)
        return ops.metrics.quantize_uint8(y).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    rows = []
    for b in batches:
        x = jnp.asarray(rng.integers(0, 255, (b, size, size, 3)).astype(np.uint8))
        dt = time_device(f"serve b={b}", serve, x, n=n)
        rows.append((b, dt))
    print("\nbatch  device_ms/batch  device_ms/img")
    for b, dt in rows:
        print(f"{b:5d}  {dt*1e3:14.2f}  {dt*1e3/b:12.3f}")


if __name__ == "__main__":
    main()
