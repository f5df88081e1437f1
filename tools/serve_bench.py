"""Inference/serving benchmark: generator-only forward (the deployment
path exported by dsgan_tpu.export) on the visible accelerator.

Prints one JSON line per batch size with latency and throughput of the
uint8-in/uint8-out serving program (normalize + G + quantize fused, the
exact artifact contract). Env: SERVE_BATCHES="1,4,16", SERVE_SIZE=256,
SERVE_STEPS=30, SERVE_DTYPE=bfloat16.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dsgan_tpu import ops
    from dsgan_tpu.models import define_G, init_params
    from dsgan_tpu.models.pix2pix import _apply_net

    size = int(os.environ.get("SERVE_SIZE", "256"))
    steps = int(os.environ.get("SERVE_STEPS", "30"))
    batches = [int(b) for b in os.environ.get("SERVE_BATCHES", "1,4,16").split(",")]
    dtype = jnp.bfloat16 if os.environ.get("SERVE_DTYPE", "bfloat16") == "bfloat16" else jnp.float32

    g = define_G(3, 3, 32, "MixConvNeXtML", dtype=dtype, inference=True)
    variables = init_params(g, jax.random.PRNGKey(0), (1, size, size, 3), "normal")

    @jax.jit
    def serve(x):
        y = _apply_net(g, variables["params"], ops.normalize_u8(x), False)
        return ops.metrics.quantize_uint8(y).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    for b in batches:
        x = jnp.asarray(rng.integers(0, 255, (b, size, size, 3)).astype(np.uint8))
        for _ in range(3):
            y = serve(x)
        np.asarray(y)  # force completion (relay-safe)
        t0 = time.perf_counter()
        for _ in range(steps):
            y = serve(x)
        np.asarray(y)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serve_images_per_sec",
            "batch": b,
            "size": size,
            "latency_ms": round(dt / steps * 1e3, 2),
            "value": round(b * steps / dt, 1),
            "unit": "img/s",
        }))


if __name__ == "__main__":
    main()
