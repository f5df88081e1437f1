"""Host->device transfer bandwidth probe (VERDICT r4 item 1 support).

Measures blocking device_put wall time across payload sizes and APIs to
separate per-RPC latency from bandwidth on relay-attached accelerators.
Prints one JSON line: per-size p50 ms and derived MB/s.

Usage: python tools/h2d_probe.py [--reps 10]
"""

import argparse
import json
import time

import numpy as np


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    sizes = [4, 1 << 10, 64 << 10, 1 << 20, 3 << 20, 6 << 20, 12 << 20, 24 << 20]
    rows = []
    for nbytes in sizes:
        host = np.random.randint(0, 255, size=(nbytes,), dtype=np.uint8)
        # warm
        jax.block_until_ready(jnp.asarray(host))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(jnp.asarray(host))
            ts.append(time.perf_counter() - t0)
        p50 = pctl(ts, 50)
        rows.append({
            "bytes": nbytes,
            "p50_ms": round(p50 * 1e3, 2),
            "p95_ms": round(pctl(ts, 95) * 1e3, 2),
            "MBps": round(nbytes / p50 / 1e6, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # device_put vs asarray at 6 MB
    host = np.random.randint(0, 255, size=(6 << 20,), dtype=np.uint8)
    jax.block_until_ready(jax.device_put(host, dev))
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host, dev))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"api": "device_put", "bytes": 6 << 20,
                      "p50_ms": round(pctl(ts, 50) * 1e3, 2)}), flush=True)

    # pipelined (non-blocking enqueue of R puts, then one block): does the
    # relay overlap transfers, or serialize them?
    R = args.reps
    t0 = time.perf_counter()
    outs = [jnp.asarray(host) for _ in range(R)]
    jax.block_until_ready(outs)
    tot = time.perf_counter() - t0
    print(json.dumps({"api": "pipelined_x%d" % R, "bytes": 6 << 20,
                      "per_put_ms": round(tot / R * 1e3, 2),
                      "MBps": round((6 << 20) * R / tot / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
