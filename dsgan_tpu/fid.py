"""FID/KID between two image folders.

Distribution-level GAN evaluation the reference never had (its protocol
is per-image SSIM/PSNR only, reference DSGAN/train.py:33-44) — but which
every method in its comparison table reports. Typical use: generated
results folder vs the ground-truth folder:

  python -m dsgan_tpu.fid --dir_a results/kaist/test_all_20/images \
      --dir_b /data/kaist/testB --inception_weights inception.npz

Weights are a one-time offline conversion (zero-egress environments
cannot download them):

  python -m dsgan_tpu.utils.pth_convert inception pt_inception.pth inception.npz

Both torchvision's inception_v3 state_dict and the TF-ported FID weight
file share the same key schema and convert identically; published-number
comparability requires the latter (see models/inception.py docstring).
"""

import argparse
import json
import sys

import numpy as np


def _load_folder(path, suffix, limit):
    # No host-side resize: images go to the extractor at native size and
    # are resized to 299 on device by jax.image.resize bilinear, which
    # matches pytorch-fid's F.interpolate(align_corners=False) exactly
    # (PIL's filter does not). Mixed-size folders are normalized to the
    # first image's size by the accumulator (a documented deviation).
    from PIL import Image

    from dsgan_tpu.data.image_folder import list_images

    files = list_images(path)
    if suffix:
        files = [f for f in files if suffix in f.rsplit("/", 1)[-1]]
    files = files[:limit]
    if not files:
        raise SystemExit(f"no images found under {path!r} (suffix={suffix!r})")
    for f in files:
        yield np.asarray(Image.open(f).convert("RGB"), np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir_a", required=True, help="first image folder (e.g. generated)")
    ap.add_argument("--dir_b", required=True, help="second image folder (e.g. real)")
    ap.add_argument("--suffix_a", default="", help="keep only filenames containing this "
                    "(e.g. fake_B to pick generated images out of a results gallery)")
    ap.add_argument("--suffix_b", default="")
    ap.add_argument("--inception_weights", default="random",
                    help="converted inception .npz; 'random' = pipeline test only")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--how_many", type=int, default=50000)
    ap.add_argument("--no_kid", action="store_true")
    ap.add_argument("--torchvision_graph", action="store_true",
                    help="use the literal torchvision graph instead of the FID variant")
    ap.add_argument("--platform", default="",
                    help="force the JAX platform (cpu|tpu|...)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from dsgan_tpu.models.inception import make_feature_fn
    from dsgan_tpu.ops import fid as fid_ops

    extract = make_feature_fn(args.inception_weights,
                              fid_variant=not args.torchvision_graph,
                              batch=args.batch)
    fa = extract(_load_folder(args.dir_a, args.suffix_a, args.how_many))
    fb = extract(_load_folder(args.dir_b, args.suffix_b, args.how_many))
    if min(len(fa), len(fb)) < 2:
        raise SystemExit(
            "FID needs >= 2 images per folder (covariance is undefined "
            f"below that): got {len(fa)} / {len(fb)}")
    out = {"fid": fid_ops.fid_from_features(fa, fb),
           "n_a": int(len(fa)), "n_b": int(len(fb))}
    if not args.no_kid:
        kid_mean, kid_std = fid_ops.kid_from_features(
            fa, fb, subset_size=min(len(fa), len(fb), 100))
        out["kid"] = kid_mean
        out["kid_std"] = kid_std
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
