"""Evaluation harness — the test driver the reference lost (its train.py
builds a test loader but the eval call is commented out, reference
train.py:80-81; no test.py exists). Generator-only inference over the
test set, per-image + mean SSIM/PSNR/MS-SSIM under the reference protocol,
result gallery HTML, and a summary CSV.

Usage:  python -m dsgan_tpu.test --dataroot /path --which_epoch N [flags]
"""

import csv
import os
import sys

import numpy as np

from dsgan_tpu.data import CreateDataLoader
from dsgan_tpu.models import create_model
from dsgan_tpu.options.test_options import TestOptions
from dsgan_tpu.utils import html
from dsgan_tpu.utils.util import tensor2im
from dsgan_tpu.utils.visualizer import save_images
from dsgan_tpu import ops


def main(argv=None, dataset_path=None, out_path=None):
    opt = TestOptions().parse(dataset_path, out_path, argv)
    opt.nThreads = 1
    opt.serial_batches = True
    opt.no_flip = True

    data_loader = CreateDataLoader(opt, "test")
    dataset = data_loader.load_data()
    model = create_model(opt)
    if getattr(opt, "load_npz", ""):
        # reference-checkpoint parity evaluation: generator params come
        # from a converted torch .pth (utils/pth_convert g), bypassing
        # framework checkpoints entirely
        import jax
        import jax.numpy as jnp

        from dsgan_tpu.utils.pth_convert import load_params_npz

        params_G = jax.tree_util.tree_map(jnp.asarray, load_params_npz(opt.load_npz))
        model.state = model.state.replace(params_G=params_G)
        print(f"loaded converted generator weights from {opt.load_npz}")
    else:
        model.setup(opt)

    web_dir = os.path.join(opt.results_dir, opt.name, f"{opt.phase}_{opt.which_epoch}")
    webpage = html.HTML(
        web_dir, f"Experiment = {opt.name}, Phase = {opt.phase}, Epoch = {opt.which_epoch}"
    )

    rows = []
    acc_fake = acc_real = None
    if getattr(opt, "inception_weights", ""):
        from dsgan_tpu.models.inception import make_feature_accumulators

        new_acc = make_feature_accumulators(opt.inception_weights)
        acc_fake, acc_real = new_acc(), new_acc()
    for i, data in enumerate(dataset):
        if i >= opt.how_many:
            break
        model.set_input(data)
        model.test()
        visuals = {
            "real_A": tensor2im(model.real_A),
            "fake_B": tensor2im(model.fake_B),
        }
        row = {"path": data["A_paths"][0], "index": i}
        if "B" in data:
            visuals["real_B"] = tensor2im(model.real_B)
            row["ssim"] = ops.ssim_ref(visuals["real_B"], visuals["fake_B"])
            row["psnr"] = ops.psnr_ref(visuals["real_B"], visuals["fake_B"])
            h, w = visuals["real_B"].shape[:2]
            if min(h, w) > 160:  # ms-ssim needs > (win-1)*16 pixels
                import jax.numpy as jnp

                row["ms_ssim"] = float(ops.ms_ssim(
                    jnp.asarray(visuals["real_B"][None].astype("float32")),
                    jnp.asarray(visuals["fake_B"][None].astype("float32")),
                    data_range=255,
                ))
        if acc_fake is not None and "real_B" in visuals:
            acc_fake.add(visuals["fake_B"])
            acc_real.add(visuals["real_B"])
        save_images(webpage, visuals, data["A_paths"], aspect_ratio=opt.aspect_ratio)
        rows.append(row)

    webpage.save()

    fid_val = kid_val = kid_std = None
    if acc_fake is not None:
        ff, fr = acc_fake.result(), acc_real.result()
        if min(len(ff), len(fr)) >= 2:
            from dsgan_tpu.ops import fid as fid_ops

            fid_val = fid_ops.fid_from_features(ff, fr)
            kid_val, kid_std = fid_ops.kid_from_features(
                ff, fr, subset_size=min(len(ff), len(fr), 100))
        else:
            print("skipping FID/KID: need >= 2 evaluated pairs")

    summary_path = os.path.join(web_dir, "metrics.csv")
    with open(summary_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["index", "path", "ssim", "psnr", "ms_ssim"])
        for r in rows:
            writer.writerow([r["index"], r["path"], r.get("ssim", ""),
                             r.get("psnr", ""), r.get("ms_ssim", "")])
        if rows and "ssim" in rows[0]:
            ms_vals = [r["ms_ssim"] for r in rows if "ms_ssim" in r]
            writer.writerow(
                ["mean", "",
                 np.mean([r["ssim"] for r in rows if "ssim" in r]),
                 np.mean([r["psnr"] for r in rows if "psnr" in r]),
                 np.mean(ms_vals) if ms_vals else ""]
            )
        if fid_val is not None:
            writer.writerow(["fid", "", fid_val, "", ""])
            if kid_val is not None:
                writer.writerow(["kid", "", kid_val, kid_std, ""])
    print(f"wrote {len(rows)} results to {web_dir}")
    if rows and "ssim" in rows[0]:
        line = "mean SSIM: %.4f  mean PSNR: %.3f" % (
            float(np.mean([r["ssim"] for r in rows if "ssim" in r])),
            float(np.mean([r["psnr"] for r in rows if "psnr" in r])),
        )
        ms_vals = [r["ms_ssim"] for r in rows if "ms_ssim" in r]
        if ms_vals:
            line += "  mean MS-SSIM: %.4f" % float(np.mean(ms_vals))
        if fid_val is not None:
            line += "  FID: %.3f" % fid_val
            if kid_val is not None:
                line += "  KID: %.5f" % kid_val
        print(line)


if __name__ == "__main__":
    main(sys.argv[1:])
