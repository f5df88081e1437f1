"""VGG16 perceptual feature extractor (reference DSGAN/models/vgg.py:5-42).

Returns the five relu taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3);
the pix2pix composite loss uses the first four (pix2pix_model.py:182-186).
As in the reference, inputs are fed in the generator's [-1,1] range with
no ImageNet re-normalization.

Pretrained weights: torchvision is not importable in this environment, so
``load_torchvision_npz`` consumes a converted ``.npz`` produced by
``dsgan_tpu.utils.pth_convert.convert_vgg16`` from a torchvision
``vgg16-*.pth`` state_dict (download it on any machine with egress). When
no weights are given, the extractor runs with its random init — still a
valid multi-scale feature distance, clearly weaker than the pretrained
perceptual loss; pass --vgg_weights for reference-parity training.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dsgan_tpu import ops
from dsgan_tpu.models.layers import Conv

# torchvision vgg16.features conv layout: (out_channels, feature-index)
VGG16_CONVS = [
    (64, 0), (64, 2),            # relu1_2 tap after idx 3
    (128, 5), (128, 7),          # relu2_2 tap after idx 8
    (256, 10), (256, 12), (256, 14),   # relu3_3 tap after idx 15
    (512, 17), (512, 19), (512, 21),   # relu4_3 tap after idx 22
    (512, 24), (512, 26), (512, 28),   # relu5_3 tap after idx 29
]
class Vgg16Features(nn.Module):
    """Five-tap VGG16 feature pyramid. NHWC in, list of NHWC features out.

    ``num_taps`` truncates the tower: the pix2pix perceptual loss consumes
    only relu1_2..relu4_3 (reference pix2pix_model.py:182-186), so the
    training path builds with num_taps=4 and never computes the three
    block-5 convs whose tap would be discarded.
    """

    dtype: Any = jnp.bfloat16
    num_taps: int = 5

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        h = x.astype(self.dtype or x.dtype)
        taps = []
        block_end = {1, 3, 6, 9, 12}
        for i, (ch, _) in enumerate(VGG16_CONVS):
            # conv0's dx (3-channel cotangent, ~2% MXU lanes) looked like a
            # LaneFixConv candidate; the s2d-packed dx wins isolated but
            # loses in the full step (closed experiment, docs/PERF.md) —
            # plain convs throughout.
            h = Conv(ch, 3, 1, 1, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.relu(h)
            if i in block_end:
                taps.append(h.astype(in_dtype))
                if len(taps) == self.num_taps:
                    break
                if i != 12:
                    h = ops.max_pool2d(h, 2)
        return taps


def load_torchvision_npz(path):
    """Load params converted from torchvision vgg16 state_dict.

    The npz holds features.{idx}.weight (OIHW) / .bias per conv; returns a
    flax params dict for Vgg16Features.
    """
    data = np.load(path)
    params = {}
    for i, (_, tvidx) in enumerate(VGG16_CONVS):
        w = data[f"features.{tvidx}.weight"]  # (O, I, kh, kw)
        b = data[f"features.{tvidx}.bias"]
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return {"params": params}
