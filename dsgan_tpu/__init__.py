"""DS-GAN TPU: a TPU-native JAX/XLA/Pallas framework for thermal-infrared
image colorization GANs, with the full capability surface of the reference
DS-GAN codebase (pix2pix / CycleGAN training, the MixConvNeXtML dual-stream
generator, PatchGAN discriminators, perceptual + SSIM + TV composite losses,
aligned/unaligned/single data pipelines, checkpointing, and mesh-parallel
scaling).

Design notes (TPU-first, not a port):
  * All image tensors are NHWC (channels-last) — the native TPU layout.
  * Models are pure-functional flax.linen modules; the whole G+D train step
    (forward, both losses, both optimizer updates, metrics, and the
    discriminator replay pool) is ONE jitted XLA program.
  * Scaling is jax.sharding Mesh + NamedSharding / shard_map over ICI —
    the TPU-native equivalent of the reference's torch DataParallel
    (reference: DSGAN/models/networks.py:73-79).
  * Hot ops (7x7 depthwise conv stacks, SSIM Gaussian windows) have Pallas
    TPU kernels with XLA fallbacks in dsgan_tpu.pallas.
"""

__version__ = "0.1.0"
