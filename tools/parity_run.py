"""Multi-step training-trajectory parity: our fused step vs the reference
torch trainer (imported from /root/reference, never copied).

Runs the SAME experiment in both frameworks — identical converted initial
weights, identical deterministic synthetic paired data in an identical
batch order, default-recipe composite loss (pool off, w_vgg=0: no
pretrained VGG in this env; extractor parity is covered by
tests/test_vgg_convert.py) — for N steps on CPU/f32/exact-GELU, and logs
per-step loss components plus a SHARED host-side SSIM protocol
(ops.ssim_ref, the reference train.py:33-44 skimage protocol) of each
side's fake_B against the target.

Outputs docs/parity/curves.csv (step, per-side losses + ssim) and prints
summary deviations. This is the evidence artifact behind docs/PARITY.md:
"same algorithm => same trajectory", backed by a multi-step run rather
than the one-step test alone (tests/test_torch_step_parity.py).

Usage:  python tools/parity_run.py [--steps 40] [--res 64] [--batch 2]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_pair(rng, n, res):
    """Structured synthetic pairs: A = 'thermal' luminance rendering of a
    few soft blobs; B = a fixed colorization of the same scene. Smooth
    content (not iid noise) so SSIM is a meaningful trajectory signal."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    A = np.zeros((n, res, res, 3), np.float32)
    B = np.zeros((n, res, res, 3), np.float32)
    for i in range(n):
        field = np.zeros((res, res), np.float32)
        for _ in range(6):
            cx, cy = rng.uniform(0.1, 0.9, 2)
            s = rng.uniform(0.05, 0.25)
            w = rng.uniform(0.3, 1.0)
            field += w * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
        field = field / field.max() * 2.0 - 1.0
        A[i] = field[..., None]
        # fixed pseudo-colorization: channel-wise nonlinear maps of the scene
        B[i, ..., 0] = np.tanh(1.5 * field)
        B[i, ..., 1] = field * 0.5
        B[i, ..., 2] = np.cos(field * np.pi / 2) * 2.0 - 1.0
    return A, B


def _make_ref_vgg_cls(sd):
    """Reference-Vgg16-shaped torch module running the SAME synthetic
    torchvision-layout state_dict our converter consumes: the five relu
    taps of vgg16.features (reference DSGAN/models/vgg.py:5-42), weights
    frozen. Parity does not need *pretrained* weights — only *identical*
    ones on both sides."""
    import torch
    import torch.nn.functional as F

    from dsgan_tpu.models.vgg import VGG16_CONVS

    conv_idx = {idx for _, idx in VGG16_CONVS}
    pool_at = {4, 9, 16, 23}
    tap_after = {3, 8, 15, 22, 29}

    class _SynthVgg(torch.nn.Module):
        def type(self, *a, **k):  # absorbs .type(torch.cuda.FloatTensor)
            return self

        def forward(self, x):
            h = x
            taps = []
            for i in range(30):
                if i in conv_idx:
                    h = F.conv2d(h, sd[f"features.{i}.weight"],
                                 sd[f"features.{i}.bias"], padding=1)
                elif i in pool_at:
                    h = F.max_pool2d(h, 2)
                else:
                    h = F.relu(h)
                if i in tap_after:
                    taps.append(h)
            return taps

    return _SynthVgg


def _synth_vgg_sd(seed=2024):
    """Seeded random torchvision-layout vgg16 state_dict (He-scaled so
    activations stay O(1) through 13 layers — see tests/test_vgg_convert)."""
    import torch

    from dsgan_tpu.models.vgg import VGG16_CONVS

    rng = np.random.default_rng(seed)
    sd = {}
    in_ch = 3
    for out_ch, idx in VGG16_CONVS:
        std = (2.0 / (9 * in_ch)) ** 0.5
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, std, (out_ch, in_ch, 3, 3)).astype(np.float32)
        )
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (out_ch,)).astype(np.float32)
        )
        in_ch = out_ch
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--nimg", type=int, default=8)
    ap.add_argument("--w_vgg", type=float, default=0.0,
                    help="perceptual-loss weight; >0 runs BOTH sides with an "
                         "identical seeded random VGG16 (trajectory coverage "
                         "of the heaviest loss term without pretrained "
                         "weights; ref pix2pix_model.py:180-186)")
    ap.add_argument("--out", default="docs/parity")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from tests.test_torch_step_parity import (
        _ZeroVgg, _build_ours, _import_reference, _ref_options,
    )
    from dsgan_tpu import ops

    os.makedirs("/tmp/dsgan_parity", exist_ok=True)
    vgg_npz = None
    if args.w_vgg != 0.0:
        from dsgan_tpu.utils.pth_convert import convert_vgg16

        sd = _synth_vgg_sd()
        vgg_pth = "/tmp/dsgan_parity/vgg_synth.pth"
        vgg_npz = "/tmp/dsgan_parity/vgg_synth.npz"
        torch.save(sd, vgg_pth)
        convert_vgg16(vgg_pth, vgg_npz)
        ref_vgg_cls = _make_ref_vgg_cls(sd)
    else:
        ref_vgg_cls = _ZeroVgg

    ref_pix2pix = _import_reference()
    torch.manual_seed(1234)
    opt = _ref_options()
    opt.w_vgg = args.w_vgg
    ref = ref_pix2pix.Pix2PixModel()
    orig_vgg = ref_pix2pix.Vgg16
    ref_pix2pix.Vgg16 = ref_vgg_cls
    try:
        ref.initialize(opt)
    finally:
        ref_pix2pix.Vgg16 = orig_vgg

    g_pth = "/tmp/dsgan_parity/g.pth"
    d_pth = "/tmp/dsgan_parity/d.pth"
    torch.save(ref.netG.state_dict(), g_pth)
    torch.save(ref.netD.state_dict(), d_pth)

    lr = 2e-4
    state, step = _build_ours(g_pth, d_pth, lr, vgg_npz=vgg_npz,
                              w_vgg=args.w_vgg)

    rng = np.random.default_rng(7)
    A, B = synth_pair(rng, args.nimg, args.res)

    os.makedirs(args.out, exist_ok=True)
    rows = []
    order = np.arange(args.nimg)
    bi = 0
    for it in range(args.steps):
        if bi + args.batch > args.nimg:
            bi = 0
        idx = order[bi:bi + args.batch]
        bi += args.batch
        a, b = A[idx], B[idx]

        ref.set_input({
            "A": torch.tensor(a.transpose(0, 3, 1, 2)),
            "B": torch.tensor(b.transpose(0, 3, 1, 2)),
            "A_paths": ["x"], "B_paths": ["x"],
        })
        ref.optimize_parameters()
        fake_ref = ref.fake_B.detach().numpy().transpose(0, 2, 3, 1)

        state, metrics, fake_ours = step(
            state, jnp.asarray(a), jnp.asarray(b), jnp.float32(lr)
        )
        fake_ours = np.asarray(fake_ours, np.float32)

        def u8(x):
            return np.clip((x + 1) / 2 * 255.0, 0, 255).astype(np.uint8)

        ssim_ref_side = np.mean([
            ops.ssim_ref(u8(b[j]), u8(fake_ref[j])) for j in range(args.batch)
        ])
        ssim_ours = np.mean([
            ops.ssim_ref(u8(b[j]), u8(fake_ours[j])) for j in range(args.batch)
        ])
        row = {
            "step": it + 1,
            "ref_loss_G": float(ref.loss_G),
            "ours_loss_G": float(np.asarray(metrics["loss_G"])),
            "ref_loss_D": float(ref.loss_D_fake + ref.loss_D_real) * 0.5,
            "ours_loss_D": float(np.asarray(metrics["loss_D"])),
            "ref_loss_G_L1": float(ref.loss_G_L1),
            "ours_loss_G_L1": float(np.asarray(metrics["loss_G_L1"])),
            "ref_loss_vgg": float(ref.loss_vgg),
            "ours_loss_vgg": float(np.asarray(metrics["loss_vgg"])),
            "ref_ssim": float(ssim_ref_side),
            "ours_ssim": float(ssim_ours),
        }
        rows.append(row)
        print(
            f"step {it+1:3d}  G {row['ref_loss_G']:8.4f}/{row['ours_loss_G']:8.4f}"
            f"  D {row['ref_loss_D']:7.4f}/{row['ours_loss_D']:7.4f}"
            f"  ssim {row['ref_ssim']:6.4f}/{row['ours_ssim']:6.4f}  (ref/ours)",
            flush=True,
        )

    path = os.path.join(
        args.out, "curves_vgg.csv" if args.w_vgg != 0.0 else "curves.csv"
    )
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    gdev = np.max([abs(r["ref_loss_G"] - r["ours_loss_G"]) /
                   max(abs(r["ref_loss_G"]), 1e-6) for r in rows])
    sdev = np.max([abs(r["ref_ssim"] - r["ours_ssim"]) for r in rows])
    last = rows[-1]
    print(f"\nwrote {path}")
    print(f"max rel |loss_G| deviation over {args.steps} steps: {gdev:.3%}")
    print(f"max |ssim| deviation: {sdev:.4f}")
    print(f"final: loss_G {last['ref_loss_G']:.4f}/{last['ours_loss_G']:.4f}  "
          f"ssim {last['ref_ssim']:.4f}/{last['ours_ssim']:.4f} (ref/ours)")


if __name__ == "__main__":
    main()
