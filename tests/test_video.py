"""Video eval harness: frame-parallel inference + temporal-consistency CSV."""
import os

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_video_eval_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp
    from dsgan_tpu.models import registry
    from dsgan_tpu.models.pix2pix import Pix2PixState, make_adam
    from dsgan_tpu.utils import checkpoint as ckpt

    # a checkpoint with a tiny generator
    h = w = 32
    g = registry.define_G(3, 3, 8, "resnet_6blocks", dtype=None)
    params = registry.init_params(g, jax.random.PRNGKey(0), (1, h, w, 3), "normal")["params"]
    save_dir = str(tmp_path / "ckpt" / "vexp")
    ckpt.save_state(save_dir, 1, {"state": {"params_G": params}}, async_save=False)

    frames = tmp_path / "frames"
    gt = tmp_path / "gt"
    os.makedirs(frames); os.makedirs(gt)
    rng = np.random.default_rng(0)
    base = rng.integers(60, 190, (h, w, 3)).astype(np.int32)
    for t in range(5):
        drift = (base + t * 3).clip(0, 255).astype(np.uint8)
        Image.fromarray(drift).save(frames / f"f{t:03d}.png")
        Image.fromarray((255 - drift)).save(gt / f"f{t:03d}.png")

    from dsgan_tpu import video

    tc = video.main([
        "--dataroot", str(frames), "--name", "vexp",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--which_epoch", "1", "--which_model_netG", "resnet_6blocks",
        "--ngf", "8", "--dtype", "float32", "--batchSize", "2",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--gt_dir", str(gt),
    ])
    assert np.isfinite(tc) and tc >= 0
    out_csv = tmp_path / "results" / "vexp" / "video" / "temporal.csv"
    assert out_csv.exists()
    text = out_csv.read_text()
    assert "temporal_consistency_ratio" in text and "mean_ssim" in text
