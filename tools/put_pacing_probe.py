"""Relay put-event economics + paced chunk loop (round 5, VERDICT #1).

tools/chunk_trace.py established (v5e via relay, k=8 b16 uint8):
  * staged chunked device rate 139 img/s (beats per-step 119 — chaining
    removes per-dispatch gaps),
  * blocking right after 8 fused puts waits ~2.05 s vs 0.92 s device —
    the put completion events serialize (~140 ms per 6 MB put),
  * with the live loader the host phases blow up (stack p50 700 ms on
    the 1-core host: 4 decode threads starve the main thread).

This probe answers the three levers in ONE process (program resident,
compile-cache friendly):

  A. put-size sweep — block_until_ready latency of ONE fresh put of
     3/6/12/24/48 MB after the big program is resident: is the event
     cost per PUT (fewer-bigger wins) or per BYTE (nothing to win)?
  B. paced loop — never block on puts: dispatch chunk i, then block on
     chunk i-1's executed loss scalar (D2H of a computed result, whose
     event is measured cheap). Steady img/s over --chunks chunks,
     precollected host data.
  C. live-loader paced loop at --nthreads {4,2,1} — quantify decode-
     thread contention on the collect+fuse phases.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python tools/put_pacing_probe.py
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
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pairs", type=int, default=192)
    ap.add_argument("--nthreads", default="4,2,1")
    args = ap.parse_args()

    import tempfile

    root = tempfile.mkdtemp(prefix="putpace_")
    build_dataset(root, args.pairs)

    from dsgan_tpu.models import create_model
    from dsgan_tpu.models.layers import set_gelu_mode
    from dsgan_tpu.options.train_options import TrainOptions

    set_gelu_mode(True)

    def make_argv(nthreads):
        return [
            "--dataroot", root, "--checkpoints_dir", root, "--name", "pp",
            "--batchSize", str(args.batch), "--w_vgg", "0",
            "--no_flip", "--nThreads", str(nthreads), "--native_loader", "1",
            "--pool_size", "50", "--seed", "20",
            "--steps_per_dispatch", str(args.chunk),
        ]

    opt = TrainOptions().parse(argv=make_argv(4))
    model = create_model(opt)
    model.setup(opt)

    import jax

    warm = {
        "A": np.zeros((args.batch, 256, 256, 3), np.uint8),
        "B": np.zeros((args.batch, 256, 256, 3), np.uint8),
    }
    model.set_input_chunk([warm] * args.chunk)
    model.optimize_parameters_chunk()
    float(np.asarray(model._metrics["loss_G"]))
    print("[putpace] compiled; program resident", flush=True)

    # ---- A: put-size sweep (fresh put, block, discard) -------------------
    rng = np.random.default_rng(0)
    print("\n== A: blocking latency of ONE fresh put vs size "
          "(program resident, device idle)")
    for mb in (3, 6, 12, 24, 48):
        n = mb * 1024 * 1024
        lats = []
        for _ in range(5):
            host = rng.integers(0, 255, (n,), dtype=np.uint8)
            t0 = time.perf_counter()
            d = jax.device_put(host)
            t1 = time.perf_counter()
            jax.block_until_ready(d)
            t2 = time.perf_counter()
            lats.append((1e3 * (t1 - t0), 1e3 * (t2 - t1)))
            del d
        enq = np.median([a for a, _ in lats])
        blk = np.median([b for _, b in lats])
        print(f"  {mb:3d} MB: enqueue p50 {enq:7.1f} ms   "
              f"block p50 {blk:7.1f} ms   "
              f"({[f'{b:.0f}' for _, b in lats]})", flush=True)

    # ---- B: paced loop on precollected chunks ----------------------------
    from dsgan_tpu.data import CreateDataLoader

    loader = CreateDataLoader(opt, "train")
    dataset = loader.load_data()

    def batches():
        while True:
            for d in dataset:
                yield d

    it = batches()
    ka, kb = "A", "B"
    host_chunks = []
    for _ in range(args.chunks):
        pending = [next(it) for _ in range(args.chunk)]
        host_chunks.append(
            [np.concatenate((np.asarray(d[ka]), np.asarray(d[kb])), axis=-1)
             for d in pending])
    time.sleep(1.0)  # let prefetch threads park on the full queue
    n_img = args.batch * args.chunk * args.chunks

    def run_paced(chunks_src, tag):
        prev_metric = None
        t0 = time.perf_counter()
        for ABs in chunks_src:
            model.chunk_AB = [model._place_batch(ab) for ab in ABs]
            model.optimize_parameters_chunk()
            if prev_metric is not None:
                float(np.asarray(prev_metric))  # block on EXECUTED result
            prev_metric = model._metrics["loss_G"]
        float(np.asarray(prev_metric))
        dt = time.perf_counter() - t0
        print(f"  {tag}: wall {dt:.2f} s; {n_img/dt:.1f} img/s", flush=True)
        return n_img / dt

    def run_free(chunks_src, tag):
        # the current train.py behavior: never block until the drain
        t0 = time.perf_counter()
        for ABs in chunks_src:
            model.chunk_AB = [model._place_batch(ab) for ab in ABs]
            model.optimize_parameters_chunk()
        float(np.asarray(model._metrics["loss_G"]))
        dt = time.perf_counter() - t0
        print(f"  {tag}: wall {dt:.2f} s; {n_img/dt:.1f} img/s", flush=True)
        return n_img / dt

    print("\n== B: precollected chunks (idle loader), paced vs free")
    for rep in range(2):
        run_free(host_chunks, f"free   rep{rep}")
        run_paced(host_chunks, f"paced  rep{rep}")

    # ---- C: live loader at each thread count ------------------------------
    print("\n== C: LIVE loader, paced loop, vs nThreads")
    for nt in [int(x) for x in args.nthreads.split(",")]:
        opt_nt = TrainOptions().parse(argv=make_argv(nt))
        loader_nt = CreateDataLoader(opt_nt, "train")
        ds = loader_nt.load_data()

        def live_chunks():
            itn = iter(ds)
            got = 0
            while got < args.chunks:
                pending = []
                for _ in range(args.chunk):
                    try:
                        pending.append(next(itn))
                    except StopIteration:
                        itn = iter(ds)
                        pending.append(next(itn))
                yield [np.concatenate(
                    (np.asarray(d[ka]), np.asarray(d[kb])), axis=-1)
                    for d in pending]
                got += 1

        # warm the prefetch queue like steady-state training
        gen = live_chunks()
        first = next(gen)

        def chained():
            yield first
            for c in gen:
                yield c

        run_paced(chained(), f"nThreads={nt} paced")


if __name__ == "__main__":
    main()
