"""Decompose the e2e CLI hot-loop step time (VERDICT r3 weak #1).

The round-3 numbers did not reconcile: loader 54 ms/batch, device step
130 ms, measured dispatch ~3.5 ms — yet e2e = 386 ms/batch. This probe
isolates each phase of the `train.py` hot loop on the real device:

  A. per-iter wall time of the full loop (same as e2e_bench) with a
     per-iteration histogram, not just a mean;
  B. `next(loader)` wait alone (loop that only consumes the iterator);
  C. `set_input` (2 x uint8 device_put) alone — device idle;
  D. `set_input` while the device is BUSY (a step in flight) — exposes
     whether the relay serializes H2D with execution;
  E. `jnp.float32(lr)` scalar put alone, idle and busy;
  F. dispatch-only (pre-staged tensors; bench.py's loop) per-iter.

Prints one JSON line with p50s per phase and the reconciliation.

Usage: python tools/e2e_trace.py [--steps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--root", default="/tmp/dsgan_e2e_bench")
    args = ap.parse_args()

    from tools.e2e_bench import build_dataset

    if not os.path.isdir(os.path.join(args.root, "train_all")):
        build_dataset(args.root, 1024, 256)

    class Cycle:
        """Restart the loader iterator on epoch end (probe needs more
        batches than one synthetic epoch holds)."""

        def __init__(self, ds):
            self.ds = ds
            self.it = iter(ds)

        def __next__(self):
            try:
                return next(self.it)
            except StopIteration:
                self.it = iter(self.ds)
                return next(self.it)

    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)

    from dsgan_tpu.data import CreateDataLoader
    from dsgan_tpu.models import create_model
    from dsgan_tpu.options.train_options import TrainOptions

    argv = [
        "--dataroot", args.root,
        "--checkpoints_dir", os.path.join(args.root, "ckpt"),
        "--name", "e2e_trace",
        "--batchSize", str(args.batch),
        "--loadSize_w", "256", "--loadSize_h", "256",
        "--fineSize_w", "256", "--fineSize_h", "256",
        "--no_flip", "--nThreads", "4", "--native_loader", "1",
        "--niter", "1", "--niter_decay", "0", "--w_vgg", "0",
    ]
    opt = TrainOptions().parse(argv=argv)

    import jax
    import jax.numpy as jnp

    loader = CreateDataLoader(opt, "train")
    dataset = loader.load_data()
    it = Cycle(dataset)
    warm = next(it)

    model = create_model(opt)
    model.setup(opt)
    model.set_input(warm)
    model.optimize_parameters()
    float(np.asarray(model._metrics["loss_G"]))

    # ---- A: full hot loop, per-iter times
    a_times, t_set, t_opt, t_next = [], [], [], []
    it = Cycle(dataset)
    k = 0
    t_prev = time.perf_counter()
    while k < args.steps:
        t0 = time.perf_counter()
        data = next(it)
        t1 = time.perf_counter()
        model.set_input(data)
        t2 = time.perf_counter()
        model.optimize_parameters()
        t3 = time.perf_counter()
        a_times.append(t3 - t_prev)
        t_next.append(t1 - t0)
        t_set.append(t2 - t1)
        t_opt.append(t3 - t2)
        t_prev = t3
        k += 1
    float(np.asarray(model._metrics["loss_G"]))

    # ---- B: loader-only
    b_times = []
    it = Cycle(dataset)
    next(it)
    for _ in range(args.steps):
        t0 = time.perf_counter()
        next(it)
        b_times.append(time.perf_counter() - t0)

    # ---- C: device_put idle (2 uint8 batches, like set_input)
    host_a = np.asarray(warm["A"])
    host_b = np.asarray(warm["B"])
    jax.block_until_ready(model.state.params_G)
    c_times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        xa = jnp.asarray(host_a)
        xb = jnp.asarray(host_b)
        jax.block_until_ready((xa, xb))
        c_times.append(time.perf_counter() - t0)

    # ---- E: scalar put idle
    e_times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        s = jnp.float32(model.lr)
        jax.block_until_ready(s)
        e_times.append(time.perf_counter() - t0)

    # ---- D: device_put while a step is in flight
    a_dev = model.real_A
    b_dev = model.real_B
    d_times = []
    for _ in range(args.steps):
        model.state, model._metrics, model.fake_B = model._step_fn(
            model.state, a_dev, b_dev, jnp.float32(model.lr))
        t0 = time.perf_counter()
        xa = jnp.asarray(host_a)
        xb = jnp.asarray(host_b)
        jax.block_until_ready((xa, xb))
        d_times.append(time.perf_counter() - t0)
    float(np.asarray(model._metrics["loss_G"]))

    # ---- F: dispatch-only loop (device rate)
    f_times = []
    t_prev = time.perf_counter()
    for _ in range(args.steps):
        model.state, model._metrics, model.fake_B = model._step_fn(
            model.state, a_dev, b_dev, jnp.float32(model.lr))
        t1 = time.perf_counter()
        f_times.append(t1 - t_prev)
        t_prev = t1
    float(np.asarray(model._metrics["loss_G"]))
    f_total = sum(f_times) + 0.0
    # the dispatch loop runs ahead; measure the drained rate too
    t0 = time.perf_counter()
    for _ in range(args.steps):
        model.state, model._metrics, model.fake_B = model._step_fn(
            model.state, a_dev, b_dev, jnp.float32(model.lr))
    float(np.asarray(model._metrics["loss_G"]))
    f_drained = (time.perf_counter() - t0) / args.steps

    out = {
        "metric": "e2e_trace_ms",
        "full_iter_p50": round(pctl(a_times, 50) * 1e3, 2),
        "full_iter_p95": round(pctl(a_times, 95) * 1e3, 2),
        "phase_next_p50": round(pctl(t_next, 50) * 1e3, 2),
        "phase_set_input_p50": round(pctl(t_set, 50) * 1e3, 2),
        "phase_optimize_p50": round(pctl(t_opt, 50) * 1e3, 2),
        "loader_only_p50": round(pctl(b_times, 50) * 1e3, 2),
        "put_idle_p50": round(pctl(c_times, 50) * 1e3, 2),
        "put_busy_p50": round(pctl(d_times, 50) * 1e3, 2),
        "scalar_put_idle_p50": round(pctl(e_times, 50) * 1e3, 2),
        "dispatch_only_iter_p50": round(pctl(f_times, 50) * 1e3, 2),
        "device_step_drained_ms": round(f_drained * 1e3, 2),
        "n": args.steps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
