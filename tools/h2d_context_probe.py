"""Why is device_put 60x slower inside the e2e loop than standalone?

h2d_probe.py measures ~1.5 GB/s relay H2D; e2e_trace.py measured 245 ms
for the same 6 MB in the CLI context. This probe bisects: array layout
(contiguity/dtype of real loader batches), live prefetch threads, and
compiled-program residency.

Usage: python tools/h2d_context_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_put(host_arrs, reps=8):
    import jax
    import jax.numpy as jnp

    jax.block_until_ready([jnp.asarray(a) for a in host_arrs])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready([jnp.asarray(a) for a in host_arrs])
        ts.append(time.perf_counter() - t0)
    return round(float(np.percentile(ts, 50)) * 1e3, 2)


def main():
    from tools.e2e_bench import build_dataset

    root = "/tmp/dsgan_e2e_bench"
    if not os.path.isdir(os.path.join(root, "train_all")):
        build_dataset(root, 1024, 256)

    from dsgan_tpu.data import CreateDataLoader
    from dsgan_tpu.options.train_options import TrainOptions

    argv = [
        "--dataroot", root, "--checkpoints_dir", os.path.join(root, "ckpt"),
        "--name", "h2d_ctx", "--batchSize", "16",
        "--loadSize_w", "256", "--loadSize_h", "256",
        "--fineSize_w", "256", "--fineSize_h", "256",
        "--no_flip", "--nThreads", "4", "--native_loader", "1",
        "--niter", "1", "--niter_decay", "0", "--w_vgg", "0",
    ]
    opt = TrainOptions().parse(argv=argv)

    import jax  # noqa: F401

    # 1) baseline contiguous synthetic batch, no loader running
    synth = np.random.randint(0, 255, size=(16, 256, 256, 3), dtype=np.uint8)
    print(json.dumps({"phase": "synthetic_pre_loader",
                      "p50_ms": bench_put([synth, synth])}), flush=True)

    loader = CreateDataLoader(opt, "train")
    dataset = loader.load_data()
    it = iter(dataset)
    warm = next(it)
    a = warm["A"]
    print(json.dumps({
        "phase": "loader_batch_meta",
        "type": type(a).__name__,
        "dtype": str(np.asarray(a).dtype),
        "shape": list(np.asarray(a).shape),
        "c_contig": bool(np.asarray(a).flags["C_CONTIGUOUS"])
        if isinstance(a, np.ndarray) else None,
    }), flush=True)

    host_a = np.asarray(warm["A"])
    host_b = np.asarray(warm["B"])

    # 2) loader-produced arrays, prefetch threads alive
    print(json.dumps({"phase": "loader_arrays_threads_alive",
                      "p50_ms": bench_put([host_a, host_b])}), flush=True)

    # 3) contiguous copies, threads alive
    ca, cb = np.ascontiguousarray(host_a), np.ascontiguousarray(host_b)
    print(json.dumps({"phase": "contig_copies_threads_alive",
                      "p50_ms": bench_put([ca, cb])}), flush=True)

    # 4) synthetic again, threads alive
    print(json.dumps({"phase": "synthetic_threads_alive",
                      "p50_ms": bench_put([synth, synth])}), flush=True)

    # 5) drain the iterator (stops prefetch thread), retest
    for _ in it:
        pass
    time.sleep(0.5)
    print(json.dumps({"phase": "loader_arrays_threads_dead",
                      "p50_ms": bench_put([host_a, host_b])}), flush=True)

    # 6) after compiling+running the model step (program resident in HBM)
    from dsgan_tpu.models import create_model
    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)
    model = create_model(opt)
    model.setup(opt)
    model.set_input(warm)
    model.optimize_parameters()
    float(np.asarray(model._metrics["loss_G"]))
    print(json.dumps({"phase": "after_model_step",
                      "p50_ms": bench_put([host_a, host_b])}), flush=True)

    # 7) with steps in flight (async dispatched, not drained)
    import jax.numpy as jnp

    a_dev, b_dev = model.real_A, model.real_B
    for _ in range(4):
        model.state, model._metrics, model.fake_B = model._step_fn(
            model.state, a_dev, b_dev, jnp.float32(model.lr))
    print(json.dumps({"phase": "puts_with_4_steps_in_flight",
                      "p50_ms": bench_put([host_a, host_b])}), flush=True)
    float(np.asarray(model._metrics["loss_G"]))


if __name__ == "__main__":
    main()
