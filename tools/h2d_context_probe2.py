"""Stage-2 bisect: WHAT about the executed train step slows later puts?

Findings from h2d_context_probe.py: 6 MB put = 4 ms fresh, 312 ms after
the compiled train step has run once (device drained). Candidates:
 (a) enqueue vs block split — is the RPC slow or the wait?
 (b) scalar put after step — latency or bandwidth?
 (c) compile-only (AOT) vs executed
 (d) releasing the model state
 (e) repeated steps — does it decay further?

Usage: python tools/h2d_context_probe2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def put_split(host, reps=6):
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.asarray(host))
    enq, blk = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jnp.asarray(host)
        t1 = time.perf_counter()
        jax.block_until_ready(x)
        t2 = time.perf_counter()
        enq.append(t1 - t0)
        blk.append(t2 - t1)
    return (round(float(np.percentile(enq, 50)) * 1e3, 2),
            round(float(np.percentile(blk, 50)) * 1e3, 2))


def main():
    from tools.e2e_bench import build_dataset

    root = "/tmp/dsgan_e2e_bench"
    if not os.path.isdir(os.path.join(root, "train_all")):
        build_dataset(root, 1024, 256)

    from dsgan_tpu.models import create_model
    from dsgan_tpu.models.layers import set_gelu_mode
    from dsgan_tpu.options.train_options import TrainOptions

    set_gelu_mode(True)
    argv = [
        "--dataroot", root, "--checkpoints_dir", os.path.join(root, "ckpt"),
        "--name", "h2d_ctx2", "--batchSize", "16",
        "--loadSize_w", "256", "--loadSize_h", "256",
        "--fineSize_w", "256", "--fineSize_h", "256",
        "--no_flip", "--nThreads", "0", "--native_loader", "1",
        "--niter", "1", "--niter_decay", "0", "--w_vgg", "0",
    ]
    opt = TrainOptions().parse(argv=argv)

    import jax
    import jax.numpy as jnp

    big = np.random.randint(0, 255, size=(16, 256, 256, 3), dtype=np.uint8)
    tiny = np.float32(0.5)

    e, b = put_split(big)
    print(json.dumps({"phase": "fresh_big", "enqueue_ms": e, "block_ms": b}),
          flush=True)
    e, b = put_split(tiny)
    print(json.dumps({"phase": "fresh_scalar", "enqueue_ms": e, "block_ms": b}),
          flush=True)

    model = create_model(opt)
    model.setup(opt)
    batch = {"A": big, "B": big, "A_paths": ["x"] * 16, "B_paths": ["x"] * 16}
    model.set_input(batch)

    # compile WITHOUT running: trace+lower+compile via .lower on the step fn
    # (model API compiles lazily on first call, so approximate: run once and
    # measure before/after anyway; then check decay over steps)
    model.optimize_parameters()
    float(np.asarray(model._metrics["loss_G"]))
    e, b = put_split(big)
    print(json.dumps({"phase": "after_1_step_big", "enqueue_ms": e,
                      "block_ms": b}), flush=True)
    e, b = put_split(tiny)
    print(json.dumps({"phase": "after_1_step_scalar", "enqueue_ms": e,
                      "block_ms": b}), flush=True)

    a_dev, b_dev = model.real_A, model.real_B
    for _ in range(10):
        model.state, model._metrics, model.fake_B = model._step_fn(
            model.state, a_dev, b_dev, jnp.float32(model.lr))
    float(np.asarray(model._metrics["loss_G"]))
    e, b = put_split(big)
    print(json.dumps({"phase": "after_11_steps_big", "enqueue_ms": e,
                      "block_ms": b}), flush=True)

    # does a D2H fetch reset it?
    np.asarray(model.fake_B)
    e, b = put_split(big)
    print(json.dumps({"phase": "after_d2h_big", "enqueue_ms": e,
                      "block_ms": b}), flush=True)

    # drop all device state
    del model, a_dev, b_dev
    import gc

    gc.collect()
    time.sleep(0.5)
    e, b = put_split(big)
    print(json.dumps({"phase": "after_del_model_big", "enqueue_ms": e,
                      "block_ms": b}), flush=True)

    # D2H bandwidth after (fresh put, fetch back)
    x = jnp.asarray(big)
    jax.block_until_ready(x)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(x)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"phase": "d2h_big",
                      "p50_ms": round(float(np.percentile(ts, 50)) * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
