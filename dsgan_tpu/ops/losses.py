"""Loss functions for the GAN training algorithms.

Semantics match the reference training recipe exactly:
  * GAN loss: BCE-with-logits by default; LSGAN (MSE) when selected.
    NOTE the reference wires ``GANLoss(use_lsgan=opt.no_lsgan)`` with
    default ``no_lsgan=False`` (DSGAN/models/pix2pix_model.py:112-114),
    so the *effective default is vanilla BCE*, inverted vs upstream
    pix2pix. We keep that wiring at the options layer (bug-compatible);
    here the mode is explicit.
  * TV loss divided by 320*256 regardless of image size
    (pix2pix_model.py:189-191) — recipes depend on this constant.
  * Perceptual loss: sum of L1 distances over VGG16 feature taps
    relu1_2..relu4_3 (pix2pix_model.py:180-186).
  * SSIM loss: 1 - ssim((real+1)/2, (fake+1)/2, data_range=1)
    (pix2pix_model.py:193-195).
"""

import jax.numpy as jnp

from dsgan_tpu.ops.ssim import ssim as _ssim


def gan_loss(pred, target_is_real, mode="vanilla"):
    """GAN criterion on raw discriminator logits.

    mode='vanilla' -> BCEWithLogits, mode='lsgan' -> MSE vs 0/1 targets,
    mode='bce' -> plain BCE on probabilities (used with sigmoid-output D).
    Accepts a single logits array or a (possibly nested) list from a
    multiscale discriminator, in which case per-scale losses are summed
    over the *last* tensor of each scale (matching GANLoss_multi,
    reference networks.py:198-208).
    """
    if isinstance(pred, (list, tuple)):
        if isinstance(pred[0], (list, tuple)):
            return sum(gan_loss(p[-1], target_is_real, mode) for p in pred)
        return gan_loss(pred[-1], target_is_real, mode)
    target = jnp.full(pred.shape, 1.0 if target_is_real else 0.0, jnp.float32)
    pred = pred.astype(jnp.float32)
    if mode == "lsgan":
        return jnp.mean(jnp.square(pred - target))
    if mode == "vanilla":
        # BCE-with-logits, numerically stable form.
        return jnp.mean(
            jnp.maximum(pred, 0.0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if mode == "bce":
        eps = 1e-12
        p = jnp.clip(pred, eps, 1.0 - eps)
        return jnp.mean(-(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)))
    raise ValueError(f"unknown gan loss mode: {mode}")


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def tv_loss(x, divisor=320 * 256):
    """Total-variation loss with the reference's fixed divisor. x: NHWC."""
    xf = x.astype(jnp.float32)
    diff_i = jnp.sum(jnp.abs(xf[:, :, 1:, :] - xf[:, :, :-1, :]))
    diff_j = jnp.sum(jnp.abs(xf[:, 1:, :, :] - xf[:, :-1, :, :]))
    return (diff_i + diff_j) / divisor


def perceptual_loss(feats_fake, feats_real, num_taps=4):
    """Sum of L1 over the first ``num_taps`` VGG feature levels.

    The elementwise |a-b| stays in the feature dtype (bf16 on TPU) so the
    backward cotangent chain through the VGG convs is not forced to f32;
    only the mean-reduction accumulates in f32."""
    total = 0.0
    for i in range(num_taps):
        diff = jnp.abs(feats_fake[i] - feats_real[i].astype(feats_fake[i].dtype))
        total = total + jnp.mean(diff.astype(jnp.float32))
    return total


def ssim_loss(real, fake):
    """1 - SSIM on [-1,1]-ranged images mapped to [0,1], data_range=1."""
    x = (real.astype(jnp.float32) + 1.0) / 2.0
    y = (fake.astype(jnp.float32) + 1.0) / 2.0
    return 1.0 - _ssim(x, y, data_range=1, size_average=True)
