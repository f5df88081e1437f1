"""Video colorization evaluation: frame-parallel batched inference over an
ordered frame directory + temporal-consistency metrics.

The reference's IRVI benchmark is video-derived but its repo has no video
tooling at all (SURVEY §6); this harness adds the capability the TPU-first
way: frames are batched (the "video axis" is just the batch axis for a
per-frame colorizer, SURVEY §5), the generator runs its forward-only
build, and metrics are computed on device.

Temporal consistency is reported two ways:
  * flow-free ratio  TC = mean_t |y_t - y_{t-1}|_1 / mean_t |x_t - x_{t-1}|_1
    (how much inter-frame change the colorizer ADDS relative to the change
    already present in the thermal input; 1.0 = input-driven, larger =
    flicker) — catches gross flicker only;
  * motion-compensated (I2VGAN-style): pyramidal Lucas-Kanade flow is
    estimated on the INPUT pair, the previous OUTPUT is warped along it,
    and the photometrically-weighted |warp(y_{t-1}) - y_t| is reported
    next to the same functional on the inputs (the floor set by flow
    quality). See dsgan_tpu/ops/flow.py. Disable with --no_flow_metric.

Per-frame SSIM/PSNR vs ground truth are included when a paired GT
directory is given.

Usage:
    python -m dsgan_tpu.video --dataroot <frames_dir> --name exp \
        --which_epoch 20 [--gt_dir <rgb_frames>] [--batchSize 8]

Frame order is the sorted filename order.
"""

import csv
import os
import sys

import numpy as np

from dsgan_tpu.options.test_options import TestOptions


class VideoOptions(TestOptions):
    def initialize(self, parser):
        parser = TestOptions.initialize(self, parser)
        parser.add_argument("--gt_dir", type=str, default="",
                            help="optional directory of paired ground-truth "
                                 "RGB frames (same sorted order) for SSIM/PSNR")
        parser.add_argument("--no_flow_metric", action="store_true",
                            help="skip the motion-compensated (optical-flow "
                                 "warped) temporal-consistency metric")
        return parser


def _load_frames(paths, h, w, nc=3):
    """Decode frames to (N, h, w, nc) in [-1, 1]; nc==1 applies the same
    luma projection as the training datasets (data/transforms.rgb_to_gray)
    so inference preprocessing matches the recipe's input_nc."""
    from PIL import Image

    from dsgan_tpu.data.transforms import rgb_to_gray

    if nc not in (1, 3):
        raise SystemExit(f"video harness supports input_nc 1 or 3, got {nc}")
    out = np.empty((len(paths), h, w, nc), np.float32)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize((w, h), Image.BICUBIC)
        arr = np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
        out[i] = rgb_to_gray(arr) if nc == 1 else arr
    return out


def main(argv=None):
    import jax
    import jax.numpy as jnp

    opt = VideoOptions().parse(argv=argv)
    opt.isTrain = False

    from dsgan_tpu.data.image_folder import IMG_EXTENSIONS
    from dsgan_tpu.models import registry
    from dsgan_tpu import ops

    frame_dir = opt.dataroot
    paths = sorted(
        os.path.join(frame_dir, f) for f in os.listdir(frame_dir)
        if any(f.lower().endswith(e) for e in IMG_EXTENSIONS)
    )
    if len(paths) < 2:
        raise SystemExit(f"need >=2 frames in {frame_dir}, found {len(paths)}")
    h, w = opt.fineSize_h, opt.fineSize_w

    dtype = jnp.bfloat16 if getattr(opt, "dtype", "bfloat16") == "bfloat16" else None
    g = registry.define_G(
        opt.input_nc, opt.output_nc, opt.ngf, opt.which_model_netG,
        opt.norm, dtype=dtype, inference=True,
    )
    params = registry.init_params(
        g, jax.random.PRNGKey(0), (1, h, w, int(opt.input_nc)), "normal"
    )["params"]

    # pull the generator out of a training checkpoint
    from dsgan_tpu.utils import checkpoint as ckpt

    save_dir = os.path.join(opt.checkpoints_dir, opt.name)
    which = opt.which_epoch
    if which == "latest":
        which = ckpt.latest_epoch(save_dir)
    tree = ckpt.restore_untyped(save_dir, which)
    st = tree["state"]
    # pix2pix/test checkpoints carry params_G; cycle_gan carries the
    # A->B generator as params_G_A
    raw = st.get("params_G") if st.get("params_G") else st.get("params_G_A")
    if not raw:
        raise SystemExit(
            f"checkpoint epoch {which} has no generator params "
            f"(keys: {sorted(st)})")
    params = jax.tree_util.tree_map(jnp.asarray, raw)
    stats = st.get("stats_G") if st.get("stats_G") else st.get("stats_G_A")
    if stats:  # --norm batch recipes: eval needs the running averages
        stats = jax.tree_util.tree_map(jnp.asarray, stats)
    print(f"loaded generator from epoch {which}")

    # --data_axis/--spatial_axis shard the frame batch (N) and image rows
    # (H, XLA halo exchanges) across the mesh — the 512^2-class / long-
    # sequence path. The batch is always padded to bs, so the data axis
    # sees full batches.
    from dsgan_tpu.parallel import (
        make_parallel_infer, replicate, resolve_mesh, shard_batch,
    )

    bs = max(int(opt.batchSize), 1)
    mesh = resolve_mesh(
        getattr(opt, "data_axis", 0), getattr(opt, "spatial_axis", 1),
        batch_size=bs, height=h,
    )
    from dsgan_tpu.models.pix2pix import _apply_net

    def apply_fn(p, x):
        # eval-mode apply: train=False (dropout off, BatchNorm running
        # stats) with the checkpoint's batch_stats when present
        return _apply_net(g, p["params"], x, False,
                          stats=p.get("batch_stats") or None)

    params = {"params": params, "batch_stats": stats or {}}
    if mesh is not None:
        d, s = mesh.devices.shape
        print(f"video mesh: data={d} x spatial={s}")
        infer = make_parallel_infer(apply_fn, mesh)
        params = replicate(params, mesh)
        put = lambda x: shard_batch(x, mesh)
    else:
        infer = jax.jit(apply_fn)
        put = jnp.asarray

    nc = int(opt.input_nc)
    ys = []
    for i in range(0, len(paths), bs):
        chunk = paths[i:i + bs]
        x = _load_frames(chunk, h, w, nc)
        if len(chunk) < bs:  # pad to the compiled batch, drop after
            x = np.concatenate([x, np.zeros((bs - len(chunk), h, w, nc), np.float32)])
        y = np.asarray(infer(params, put(x)), np.float32)[: len(chunk)]
        ys.append(y)
    y = np.concatenate(ys)
    x_all = _load_frames(paths, h, w, nc)

    dy = np.mean(np.abs(y[1:] - y[:-1]))
    dx = np.mean(np.abs(x_all[1:] - x_all[:-1]))
    tc = float(dy / max(dx, 1e-8))

    # motion-compensated consistency: LK flow on the input pair, previous
    # output warped along it, photometrically-weighted error (ops/flow.py)
    warp_out = warp_in = None
    if not getattr(opt, "no_flow_metric", False):
        from dsgan_tpu.ops import flow as flow_ops

        @jax.jit
        def _pair(xp, xc, yp, yc):
            fl = flow_ops.estimate_flow(xp, xc)
            return flow_ops.flow_warped_error(yp, yc, xp, xc, fl)

        warp_out, warp_in = [], []
        for t in range(1, len(paths)):
            eo, ei = _pair(x_all[t - 1], x_all[t], y[t - 1], y[t])
            warp_out.append(float(np.asarray(eo)))
            warp_in.append(float(np.asarray(ei)))

    results_dir = os.path.join(opt.results_dir, opt.name, "video")
    os.makedirs(results_dir, exist_ok=True)
    hdr = ["frame", "d_prev_out", "d_prev_in"]
    if warp_out is not None:
        hdr += ["warp_err_out", "warp_err_in"]
    rows = [hdr]
    for t in range(1, len(paths)):
        row = [
            os.path.basename(paths[t]),
            float(np.mean(np.abs(y[t] - y[t - 1]))),
            float(np.mean(np.abs(x_all[t] - x_all[t - 1]))),
        ]
        if warp_out is not None:
            row += [warp_out[t - 1], warp_in[t - 1]]
        rows.append(row)

    ssim_mean = psnr_mean = fid_val = kid_val = None
    if opt.gt_dir:
        import jax.numpy as jnp

        gt_paths = sorted(
            os.path.join(opt.gt_dir, f) for f in os.listdir(opt.gt_dir)
            if any(f.lower().endswith(e) for e in IMG_EXTENSIONS)
        )
        assert len(gt_paths) == len(paths), "gt/input frame counts differ"
        gt = _load_frames(gt_paths, h, w, int(opt.output_nc))
        yq = ops.metrics.quantize_uint8(jnp.asarray(y))
        gq = ops.metrics.quantize_uint8(jnp.asarray(gt))
        ssim_mean = float(np.asarray(ops.ssim_uint8(gq, yq)))
        psnr_mean = float(np.asarray(ops.psnr_uint8(gq, yq)))
        if getattr(opt, "inception_weights", "") and len(paths) >= 2:
            # distribution-level frame quality (same protocol as the
            # image eval CLI; see models/inception.py)
            from dsgan_tpu.models.inception import make_feature_accumulators
            from dsgan_tpu.ops import fid as fid_ops

            new_acc = make_feature_accumulators(opt.inception_weights)
            acc_y, acc_g = new_acc(), new_acc()
            for t in range(len(paths)):
                acc_y.add(y[t])
                acc_g.add(gt[t])
            ff, fr = acc_y.result(), acc_g.result()
            fid_val = fid_ops.fid_from_features(ff, fr)
            kid_val, _ = fid_ops.kid_from_features(
                ff, fr, subset_size=min(len(ff), 100))

    with open(os.path.join(results_dir, "temporal.csv"), "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerows(rows)
        wtr.writerow([])
        wtr.writerow(["temporal_consistency_ratio", tc])
        if warp_out is not None:
            wtr.writerow(["flow_warped_err_out", float(np.mean(warp_out))])
            wtr.writerow(["flow_warped_err_in", float(np.mean(warp_in))])
        if ssim_mean is not None:
            wtr.writerow(["mean_ssim", ssim_mean])
            wtr.writerow(["mean_psnr", psnr_mean])
        if fid_val is not None:
            wtr.writerow(["fid", fid_val])
            wtr.writerow(["kid", kid_val])

    msg = f"frames: {len(paths)}  temporal-consistency ratio: {tc:.4f}"
    if warp_out is not None:
        msg += (f"  flow-warped err out/in: "
                f"{float(np.mean(warp_out)):.4f}/{float(np.mean(warp_in)):.4f}")
    if ssim_mean is not None:
        msg += f"  mean SSIM: {ssim_mean:.4f}  mean PSNR: {psnr_mean:.3f}"
    if fid_val is not None:
        msg += f"  FID: {fid_val:.3f}"
    print(msg)
    print(f"wrote {os.path.join(results_dir, 'temporal.csv')}")
    return tc


if __name__ == "__main__":
    main(sys.argv[1:])
