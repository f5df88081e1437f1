"""Training driver (reference DSGAN/train.py re-designed for TPU).

Same observable behavior: combined train loop with per-iteration SSIM/PSNR
tracking, triptych PNG dumps and CSV logs every --print_freq iters,
per-epoch checkpoint + each_epoch.csv, linear LR decay — but all quality
metrics are computed ON DEVICE inside the fused train step and only
fetched at print frequency, so the accelerator never stalls per image
(the reference forces a device->host sync every iteration,
train.py:110-120).

Usage:  python -m dsgan_tpu.train --dataroot /path/to/data [flags]
"""

import csv
import math
import os
import sys
import time

import numpy as np

from dsgan_tpu.data import CreateDataLoader
from dsgan_tpu.models import create_model
from dsgan_tpu.options.train_options import TrainOptions
from dsgan_tpu.utils.visualizer import Visualizer


def _drain(hist, start):
    """Fetch pending lazy device scalars to host floats, in place.

    Each un-fetched scalar costs one D2H round trip (expensive through a
    relay-attached TPU), so the epoch histories are drained incrementally:
    every print fetches only the entries added since the last print —
    O(print_freq) per print instead of re-fetching the whole history,
    which would grow O(epoch) per print over a long epoch.

    Deliberately fetched per item: batching the pending slice through an
    eager ``jnp.stack`` wedged the axon relay client indefinitely on real
    hardware (the D2H of the stacked array never completed; live-run
    traceback, 2026-08-19) — the known eager-dispatch hazard on
    relay-attached devices. Scalar fetches are small, bounded, and work.

    Chunked (--steps_per_dispatch) runs append the (k,)-stacked per-chunk
    metric array as ONE entry; it is fetched in one D2H here and
    flattened in place so the history stays per-iteration."""
    j = start
    while j < len(hist):
        v = np.asarray(hist[j])
        if v.ndim == 0:
            hist[j] = float(v)
            j += 1
        else:
            hist[j : j + 1] = [float(x) for x in v]
            j += len(v)
    return len(hist)


def _chunked(iterable, k):
    """Yield lists of up to k consecutive loader batches (the tail of an
    epoch may be shorter)."""
    chunk = []
    for item in iterable:
        chunk.append(item)
        if len(chunk) == k:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def _install_preempt_handler():
    """Graceful-preemption flag: TPU pods are routinely preempted with
    SIGTERM. The handler only records the request; the epoch loop
    checkpoints the FULL training state at the next iteration boundary
    (label 'preempt') and exits 0. Resume with
    ``--continue_train --which_epoch preempt`` — exact trajectory, like
    any epoch checkpoint. Returns the flag list (non-empty = requested);
    no-op outside the main thread (programmatic/test drivers)."""
    import signal
    import threading

    flag = []
    if threading.current_thread() is not threading.main_thread():
        return flag

    def _on_term(sig, frame):
        flag.append(sig)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):
        pass
    return flag


def main(argv=None, dataset_path=None, out_path=None):
    opt = TrainOptions().parse(dataset_path, out_path, argv)
    preempt = _install_preempt_handler()
    if getattr(opt, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    output_freq = opt.print_freq

    result_path = out_path or os.path.join(opt.checkpoints_dir, opt.name)
    train_img_path = os.path.join(result_path, "train_img")
    os.makedirs(train_img_path, exist_ok=True)

    data_loader = CreateDataLoader(opt, "train")
    dataset = data_loader.load_data()
    dataset_size = len(data_loader)
    print("#training images = %d" % dataset_size)

    model = create_model(opt)
    model.setup(opt)
    visualizer = Visualizer(opt)

    try:
        from tqdm import tqdm
    except ImportError:  # tqdm optional
        tqdm = None

    profile_dir = getattr(opt, "profile_dir", "")
    if profile_dir:
        prof_start, prof_stop = (
            int(v) for v in getattr(opt, "profile_steps", "10:13").split(":")
        )
    else:
        prof_start = prof_stop = -1
    global_step = 0

    total_epochs = opt.niter + opt.niter_decay
    for epoch in range(opt.epoch_count, total_epochs + 1):
        epoch_start_time = time.time()
        iter_data_time = time.time()
        ssim_hist, psnr_hist = [], []
        n_fetched_s = n_fetched_p = 0
        epoch_iter = 0
        t_data = 0.0

        n_batches = math.ceil(dataset_size / opt.batchSize)
        bar = tqdm(total=n_batches, ascii=True) if tqdm else None
        if bar:
            bar.set_description(f"epoch: {epoch}/{total_epochs}")

        # --steps_per_dispatch k > 1: run k fused steps per device dispatch
        # (lax.scan over a k-stacked batch chunk; one H2D per chunk) to
        # amortize per-sync dispatch/completion latency — bit-identical
        # training math (docs/PERF.md "End-to-end CLI gap"). Tail chunks
        # shorter than k (epoch end) fall back to the single-step program.
        spd = max(int(getattr(opt, "steps_per_dispatch", 1) or 1), 1)
        can_chain = hasattr(model, "optimize_parameters_chunk")

        i = -1
        for chunk in _chunked(dataset, spd):
            if preempt:
                print(f"SIGTERM received: checkpointing 'preempt' state "
                      f"(epoch {epoch}, iter {i + 1}) and exiting")
                model.save_networks("preempt")
                from dsgan_tpu.utils import checkpoint as _ckpt

                _ckpt.wait_for_saves()
                print("resume with: --continue_train --which_epoch preempt")
                return
            chunk_start_time = time.time()
            if (i + 1) % output_freq == 0:
                t_data = chunk_start_time - iter_data_time

            # profiler brackets round to chunk boundaries when chaining
            if prof_start >= 0 and global_step <= prof_start < global_step + len(chunk):
                import jax

                jax.profiler.start_trace(profile_dir)

            chained = spd > 1 and can_chain and len(chunk) > 1
            if chained:
                model.set_input_chunk(chunk)
                model.optimize_parameters_chunk()
                # ONE (k,)-stacked lazy device array per metric, appended
                # whole — host-side per-substep slices are eager dispatches
                # (~20 ms each through a relay); _drain flattens them.
                seq = getattr(model, "_metrics_seq", {})
                if "ssim" in seq:
                    ssim_hist.append(seq["ssim"])
                if "psnr" in seq:
                    psnr_hist.append(seq["psnr"])

            for j, data in enumerate(chunk):
                if not chained:
                    model.set_input(data)
                    model.optimize_parameters()
                    # device scalars; kept lazy — no host sync here (models
                    # whose step has no cheap per-iter quality metric, e.g.
                    # diffusion, simply omit them)
                    m = model._metrics
                    if "ssim" in m:
                        ssim_hist.append(m["ssim"])
                    if "psnr" in m:
                        psnr_hist.append(m["psnr"])
                i += 1
                epoch_iter += opt.batchSize
                global_step += 1
                if bar:
                    bar.update(1)

                if (i + 1) % output_freq == 0:
                    n_fetched_s = _drain(ssim_hist, n_fetched_s)
                    n_fetched_p = _drain(psnr_hist, n_fetched_p)
                    ssim_avg = float(np.mean(ssim_hist)) if ssim_hist else 0.0
                    psnr_avg = float(np.mean(psnr_hist)) if psnr_hist else 0.0
                    losses = model.get_current_losses()
                    if getattr(opt, "detect_anomaly", 0):
                        model.check_anomaly(f"epoch {epoch} iter {i + 1}")
                    t = (time.time() - chunk_start_time) / (
                        opt.batchSize * len(chunk)
                    )
                    visualizer.print_current_losses(
                        epoch, epoch_iter, losses, t, t_data, ssim_avg, psnr_avg
                    )

                    # triptych TIR | fake | GT (chunk runs show the
                    # chunk's last sub-batch)
                    vis = model.get_current_visuals()
                    trip = np.hstack([vis["real_A"], vis["fake_B"], vis["real_B"]])
                    from PIL import Image

                    Image.fromarray(trip).save(
                        os.path.join(train_img_path, f"train_Re{epoch}_{i + 1}.png")
                    )

                    with open(os.path.join(result_path, "result.csv"), "a", newline="") as f:
                        message = "".join(f"{k}: {v:.3f} " for k, v in losses.items()) + "  "
                        csv.writer(f).writerow([epoch, message, ssim_avg, psnr_avg])

            if prof_stop >= 0 and global_step - len(chunk) < prof_stop + 1 <= global_step:
                import jax

                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")
            iter_data_time = time.time()

        if bar:
            bar.close()

        _drain(ssim_hist, n_fetched_s)
        _drain(psnr_hist, n_fetched_p)
        ssim_avg = float(np.mean(ssim_hist)) if ssim_hist else 0.0
        psnr_avg = float(np.mean(psnr_hist)) if psnr_hist else 0.0
        with open(os.path.join(result_path, "each_epoch.csv"), "a", newline="") as f:
            csv.writer(f).writerow([epoch, "train", ssim_avg, psnr_avg])

        print("saving the model at the end of epoch %d" % epoch)
        if getattr(opt, "detect_anomaly", 0):
            # don't persist a poisoned state as a regular epoch checkpoint
            model.check_anomaly(f"epoch {epoch} end")
        model.save_networks(epoch)
        print(
            "End of epoch %d / %d \t Time Taken: %d sec"
            % (epoch, total_epochs, time.time() - epoch_start_time)
        )
        model.update_learning_rate()

    # checkpoint saves are async (overlapping training); honor the CLI
    # contract that all checkpoints exist on disk when train returns
    from dsgan_tpu.utils import checkpoint as _ckpt

    _ckpt.wait_for_saves()
    # the in-run prune keeps k+1 (never deleting below k while a save is
    # in flight); with everything landed, settle to exactly --keep_ckpts
    if int(getattr(opt, "keep_ckpts", 0) or 0) > 0:
        _ckpt.keep_latest(model.save_dir, int(opt.keep_ckpts))


if __name__ == "__main__":
    from dsgan_tpu.models.base_model import AnomalyDetected

    try:
        main(sys.argv[1:])
    except AnomalyDetected as e:
        print(f"FATAL: {e}", file=sys.stderr)
        sys.exit(3)
