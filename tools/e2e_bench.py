"""End-to-end training throughput: the REAL input pipeline feeding the
fused device step (VERDICT r2 weak #7 — bench.py times the device step on
pre-staged tensors only, leaving the loader's contribution unquantified).

Builds a synthetic on-disk dataset (PNG pairs, half-split layout), then
times three rates with the default flagship recipe:

  loader    — images/s of the data pipeline alone (decode+augment+batch)
  e2e       — images/s of the train.py hot loop: loader -> set_input ->
              optimize_parameters (lazy metrics, as the CLI runs it)
  device    — images/s of the step on pre-staged tensors (bench.py's
              number, recomputed here for the same process/config)

and prints one JSON line with all three plus the e2e/device gap.

Usage: python tools/e2e_bench.py [--pairs 256] [--steps 30] [--native 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(root, pairs, size=256):
    from PIL import Image

    d = os.path.join(root, "train_all")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    # a few unique textures, cycled — decode cost is per-file-read, content
    # doesn't matter
    canon = [
        rng.integers(0, 255, (size, size, 3)).astype(np.uint8) for _ in range(8)
    ]
    for i in range(pairs):
        Image.fromarray(canon[i % 8]).save(os.path.join(d, f"a_{i:05d}.png"))
        Image.fromarray(canon[(i + 3) % 8]).save(os.path.join(d, f"b_{i:05d}.png"))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30,
                    help="timed steps for the e2e/device measurements")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--native", default="1",
                    help="1: native C++ loader fast path, 0: Python loader")
    ap.add_argument("--chunk", type=int, default=1,
                    help="--steps_per_dispatch value for the e2e phase "
                         "(k fused steps per dispatch; 1 = today's loop)")
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved measurement rounds per phase; the "
                         "reported numbers are per-phase medians")
    ap.add_argument("--root", default="/tmp/dsgan_e2e_bench")
    args = ap.parse_args()

    from dsgan_tpu.models.layers import set_gelu_mode

    set_gelu_mode(True)

    if not os.path.isdir(os.path.join(args.root, "train_all")):
        build_dataset(args.root, args.pairs, args.size)

    from dsgan_tpu.data import CreateDataLoader
    from dsgan_tpu.models import create_model
    from dsgan_tpu.options.train_options import TrainOptions

    argv = [
        "--dataroot", args.root,
        "--checkpoints_dir", os.path.join(args.root, "ckpt"),
        "--name", "e2e_bench",
        "--batchSize", str(args.batch),
        "--loadSize_w", str(args.size), "--loadSize_h", str(args.size),
        "--fineSize_w", str(args.size), "--fineSize_h", str(args.size),
        "--no_flip", "--nThreads", "4",
        "--native_loader", args.native,
        "--niter", "1", "--niter_decay", "0", "--w_vgg", "0",
    ]
    opt = TrainOptions().parse(argv=argv)

    # ---- loader-only rate
    loader = CreateDataLoader(opt, "train")
    dataset = loader.load_data()
    it = iter(dataset)
    warm = next(it)  # thread spin-up / first decode
    t0 = time.perf_counter()
    n = 0
    for i, data in enumerate(it):
        n += data["A"].shape[0]
        if i + 1 >= args.steps:
            break
    loader_ips = n / (time.perf_counter() - t0)

    # ---- model + e2e rate (train.py hot loop, printing elided)
    model = create_model(opt)
    model.setup(opt)
    lazy = []
    # warmup: compile the fused step
    model.set_input(warm)
    model.optimize_parameters()
    float(np.asarray(model._metrics["loss_G"]))

    if args.chunk > 1:
        # compile the chained program outside the timed regions too
        model.set_input_chunk([warm] * args.chunk)
        model.optimize_parameters_chunk()
        float(np.asarray(model._metrics["loss_G"]))

    def epochs():
        # honor --steps even when it exceeds one epoch of --pairs
        while True:
            for d in dataset:
                yield d

    def e2e_plain():
        t0 = time.perf_counter()
        n = k = 0
        for data in epochs():
            model.set_input(data)
            model.optimize_parameters()
            lazy.append(model._metrics["ssim"])  # lazy device scalar, no sync
            n += data["A"].shape[0]
            k += 1
            if k >= args.steps:
                break
        float(np.asarray(model._metrics["loss_G"]))  # force completion
        return n / (time.perf_counter() - t0)

    def e2e_chunked():
        # the --steps_per_dispatch hot loop: k loader batches -> ONE
        # stacked H2D -> ONE chained dispatch (train.py's chunk path)
        t0 = time.perf_counter()
        n = k = 0
        pending = []
        for data in epochs():
            pending.append(data)
            if len(pending) < args.chunk:
                continue
            model.set_input_chunk(pending)
            model.optimize_parameters_chunk()
            # ONE stacked (k,) device array, appended whole — a host-side
            # [j] slice is an eager dispatch (~20 ms each on the relay)
            lazy.append(model._metrics_seq["ssim"])
            n += sum(d["A"].shape[0] for d in pending)
            k += len(pending)
            pending = []
            if k >= args.steps:
                break
        float(np.asarray(model._metrics["loss_G"]))
        return n / (time.perf_counter() - t0)

    import jax.numpy as jnp

    def device_plain():
        a, b = model.real_A, model.real_B
        t0 = time.perf_counter()
        for _ in range(args.steps):
            model.state, model._metrics, model.fake_B = model._step_fn(
                model.state, a, b, jnp.float32(model.lr)
            )
        float(np.asarray(model._metrics["loss_G"]))
        return args.batch * args.steps / (time.perf_counter() - t0)

    def device_chunked():
        cab = list(model.chunk_AB)
        nd = max(args.steps // args.chunk, 1)
        t0 = time.perf_counter()
        for _ in range(nd):
            model.state, ms, model.fake_B = model._chained_fn(
                model.state, *cab, jnp.float32(model.lr)
            )
        float(np.asarray(ms["last"]["loss_G"]))
        return args.batch * args.chunk * nd / (time.perf_counter() - t0)

    # every phase in ONE process, interleaved A/B/A/B over --reps rounds:
    # the relay's completion-event latency drifts between time windows, so
    # cross-process comparisons are confounded; medians over interleaved
    # rounds are not.
    phases = {"e2e_plain": e2e_plain, "device_plain": device_plain}
    if args.chunk > 1:
        phases["e2e_chunked"] = e2e_chunked
        phases["device_chunked"] = device_chunked
    samples = {k: [] for k in phases}
    for _ in range(args.reps):
        for name, fn in phases.items():
            samples[name].append(fn())

    med = {k: float(np.median(v)) for k, v in samples.items()}
    e2e_ips = med.get("e2e_chunked", med["e2e_plain"])
    dev_ips = med["device_plain"]
    out = {
        "metric": "e2e_train_images_per_sec",
        "value": round(e2e_ips, 2),
        "unit": "img/s",
        "loader_images_per_sec": round(loader_ips, 2),
        "device_images_per_sec": round(dev_ips, 2),
        "e2e_over_device": round(e2e_ips / dev_ips, 4),
        "native_loader": args.native == "1",
        "steps_per_dispatch": args.chunk,
        "reps": args.reps,
    }
    for k, v in samples.items():
        out[k + "_all"] = [round(x, 2) for x in v]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
