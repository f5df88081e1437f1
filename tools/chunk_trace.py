"""Per-phase timing of the --steps_per_dispatch chunked hot loop.

(Now exercises the split-put path: k per-batch H2D puts, in-jit stack —
the stacked-put numbers that motivated it are recorded in docs/PERF.md.)

The k-step chaining (docs/PERF.md "End-to-end CLI gap") should pay ONE
late relay completion event per k steps — yet tools/e2e_bench.py
measures e2e_chunked BELOW e2e_plain. This probe runs the exact chunk
loop and accounts every millisecond into:

  collect   — pulling k batches off the prefetching loader
  stack     — host np.stack of the chunk
  put       — device_put enqueue of the two stacked chunks
  dispatch  — the chained-program dispatch call
  (residual)— everything else incl. where the loop actually blocks

plus the end-of-run drain. Prints per-chunk rows and phase p50s.

Env/args mirror e2e_bench: --chunk 8 --chunks 6 --batch 16.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.e2e_bench import build_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pairs", type=int, default=192)
    args = ap.parse_args()

    import tempfile

    root = tempfile.mkdtemp(prefix="chunktrace_")
    build_dataset(root, args.pairs)

    from dsgan_tpu.data import CreateDataLoader
    from dsgan_tpu.models import create_model
    from dsgan_tpu.options.train_options import TrainOptions

    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)

    argv = [
        "--dataroot", root, "--checkpoints_dir", root, "--name", "ct",
        "--batchSize", str(args.batch), "--w_vgg", "0",
        "--no_flip", "--nThreads", "4", "--native_loader", "1",
        "--pool_size", "50", "--seed", "20",
        "--steps_per_dispatch", str(args.chunk),
    ]
    opt = TrainOptions().parse(argv=argv)
    loader = CreateDataLoader(opt, "train")
    dataset = loader.load_data()
    model = create_model(opt)
    model.setup(opt)

    import jax
    import jax.numpy as jnp

    warm = {
        "A": np.zeros((args.batch, 256, 256, 3), np.uint8),
        "B": np.zeros((args.batch, 256, 256, 3), np.uint8),
    }
    model.set_input_chunk([warm] * args.chunk)
    model.optimize_parameters_chunk()
    float(np.asarray(model._metrics["loss_G"]))
    print("[chunk_trace] compiled; starting", flush=True)

    def batches():
        while True:
            for d in dataset:
                yield d

    it = batches()
    rows = []
    lazy = []
    t_run0 = time.perf_counter()
    for ci in range(args.chunks):
        t0 = time.perf_counter()
        pending = [next(it) for _ in range(args.chunk)]
        t1 = time.perf_counter()
        AtoB = opt.which_direction == "AtoB"
        ka, kb = ("A", "B") if AtoB else ("B", "A")
        ABs = [np.concatenate((np.asarray(d[ka]), np.asarray(d[kb])), axis=-1)
               for d in pending]
        t2 = time.perf_counter()
        model.chunk_AB = [model._place_batch(ab) for ab in ABs]
        t3 = time.perf_counter()
        model.optimize_parameters_chunk()
        lazy.append(model._metrics_seq["ssim"])
        t4 = time.perf_counter()
        rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0))
        print(f"chunk {ci}: collect {1e3*(t1-t0):7.1f}  stack {1e3*(t2-t1):6.1f}  "
              f"put {1e3*(t3-t2):7.1f}  dispatch {1e3*(t4-t3):7.1f}  "
              f"total {1e3*(t4-t0):7.1f} ms", flush=True)
    t5 = time.perf_counter()
    float(np.asarray(model._metrics["loss_G"]))
    t6 = time.perf_counter()
    n_img = args.batch * args.chunk * args.chunks
    print(f"drain {1e3*(t6-t5):.1f} ms; wall {t6-t_run0:.2f} s; "
          f"e2e {n_img/(t6-t_run0):.1f} img/s", flush=True)
    r = np.array(rows)
    for i, name in enumerate(["collect", "stack", "put", "dispatch", "total"]):
        print(f"p50 {name}: {1e3*np.median(r[:, i]):.1f} ms")

    # ---- phase 2: same fresh-put + dispatch pattern, loader threads IDLE
    # (chunks pre-collected to host arrays first). Separates "decode
    # threads starve the relay client on a 1-core host" from "the relay
    # serializes big H2D with execution".
    AtoB = opt.which_direction == "AtoB"
    ka, kb = ("A", "B") if AtoB else ("B", "A")
    host_chunks = []
    for _ in range(args.chunks):
        pending = [next(it) for _ in range(args.chunk)]
        host_chunks.append(
            [np.concatenate((np.asarray(d[ka]), np.asarray(d[kb])), axis=-1)
             for d in pending])
    time.sleep(1.0)  # let prefetch threads block on the full queue
    for tag in ("precollected", "precollected2"):
        t0 = time.perf_counter()
        for ABs in host_chunks:
            model.chunk_AB = [model._place_batch(ab) for ab in ABs]
            model.optimize_parameters_chunk()
            lazy.append(model._metrics_seq["ssim"])
        float(np.asarray(model._metrics["loss_G"]))
        dt = time.perf_counter() - t0
        print(f"{tag}: wall {dt:.2f} s; {n_img/dt:.1f} img/s", flush=True)

    # ---- phase 3: per-chunk SYNC latency with idle loader (where does a
    # single fresh-put chunk's completion land?)
    for ABs in host_chunks[:4]:
        t0 = time.perf_counter()
        model.chunk_AB = [model._place_batch(ab) for ab in ABs]
        t1 = time.perf_counter()
        model.optimize_parameters_chunk()
        t2 = time.perf_counter()
        float(np.asarray(model._metrics["loss_G"]))
        t3 = time.perf_counter()
        print(f"sync-chunk: put {1e3*(t1-t0):6.1f}  dispatch {1e3*(t2-t1):6.1f}  "
              f"wait {1e3*(t3-t2):7.1f}  total {1e3*(t3-t0):7.1f} ms", flush=True)

    # ---- phase 4: staged (device-resident) chunks — the device ceiling
    cab = list(model.chunk_AB)
    t0 = time.perf_counter()
    for _ in range(args.chunks):
        import jax.numpy as jnp
        model.state, ms, model.fake_B = model._chained_fn(
            model.state, *cab, jnp.float32(model.lr))
    float(np.asarray(ms["last"]["loss_G"]))
    dt = time.perf_counter() - t0
    print(f"staged: wall {dt:.2f} s; {n_img/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
