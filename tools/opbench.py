"""Accurate on-chip op timing: N dependent iterations inside ONE jitted
program (lax.fori_loop with a data dependence), so per-call dispatch
overhead (~5ms through the axon relay) is amortized away.

Usage: define shape-preserving f(x); time_op reports ms per application.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_op(name, f, x, n=50, flops=None, bytes_=None):
    """f: shape-preserving fn. Returns seconds per application."""

    def body(i, c):
        return c + f(c) * jnp.asarray(1e-30, c.dtype)

    g = jax.jit(lambda x0: jnp.sum(lax.fori_loop(0, n, body, x0).astype(jnp.float32)))
    float(np.asarray(g(x)))  # compile
    t0 = time.perf_counter()
    float(np.asarray(g(x)))
    dt = (time.perf_counter() - t0) / n
    line = f"{name:46s} {dt*1e3:8.3f} ms"
    if flops:
        line += f" {flops/dt/1e12:7.2f} TF/s"
    if bytes_:
        line += f" {bytes_/dt/1e9:7.1f} GB/s"
    print(line, flush=True)
    return dt


def time_device(name, fn, *args, n=6, flops=None):
    """Time a jitted fn by capturing an xprof trace of n calls and summing
    device time (robust through the axon relay, works for pallas calls)."""
    import glob
    import os
    import jax

    fn = jax.jit(fn)
    r = fn(*args)
    jax.block_until_ready(r)
    outdir = f"/tmp/opbench_trace_{abs(hash(name)) % 10**9}"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
    from jax.profiler import ProfileData

    total = 0.0
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
    dt = total / n / 1e3
    line_s = f"{name:46s} {dt*1e3:8.3f} ms"
    if flops:
        line_s += f" {flops/dt/1e12:7.2f} TF/s"
    print(line_s, flush=True)
    return dt
