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
    assert "flow_warped_err_out" in text


@pytest.mark.slow
def test_video_sharded_matches_single_device(tmp_path):
    """64-frame sequence through the (data x spatial) sharded inference
    path vs the forced single-device path: same temporal.csv metrics
    (VERDICT r2 #10). H-sharding runs XLA halo exchanges through every
    conv; the data axis batches frames."""
    import jax
    from dsgan_tpu.models import registry
    from dsgan_tpu.utils import checkpoint as ckpt

    h = w = 64
    g = registry.define_G(3, 3, 8, "resnet_6blocks", dtype=None)
    params = registry.init_params(
        g, jax.random.PRNGKey(0), (1, h, w, 3), "normal"
    )["params"]
    save_dir = str(tmp_path / "ckpt" / "vshard")
    ckpt.save_state(save_dir, 1, {"state": {"params_G": params}}, async_save=False)

    frames = tmp_path / "frames"
    os.makedirs(frames)
    rng = np.random.default_rng(3)
    base = rng.integers(40, 200, (h, w, 3)).astype(np.int32)
    for t in range(64):
        drift = (base + ((t * 5) % 40)).clip(0, 255).astype(np.uint8)
        Image.fromarray(drift).save(frames / f"f{t:03d}.png")

    from dsgan_tpu import video

    common = [
        "--dataroot", str(frames), "--name", "vshard",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--which_epoch", "1", "--which_model_netG", "resnet_6blocks",
        "--ngf", "8", "--dtype", "float32", "--batchSize", "8",
        "--fineSize_w", str(w), "--fineSize_h", str(h),
        "--loadSize_w", str(w), "--loadSize_h", str(h),
        "--no_flow_metric",
    ]
    tc_single = video.main(common + [
        "--results_dir", str(tmp_path / "r1"),
        "--data_axis", "1", "--spatial_axis", "1",
    ])
    tc_mesh = video.main(common + [
        "--results_dir", str(tmp_path / "r2"),
        "--data_axis", "4", "--spatial_axis", "2",
    ])
    assert (tmp_path / "r2" / "vshard" / "video" / "temporal.csv").exists()
    np.testing.assert_allclose(tc_mesh, tc_single, rtol=1e-4, atol=1e-5)

    # per-frame rows agree too (full output parity, not just the ratio)
    rows1 = (tmp_path / "r1" / "vshard" / "video" / "temporal.csv").read_text()
    rows2 = (tmp_path / "r2" / "vshard" / "video" / "temporal.csv").read_text()
    for l1, l2 in zip(rows1.splitlines(), rows2.splitlines()):
        p1, p2 = l1.split(","), l2.split(",")
        if len(p1) >= 3 and p1[0] != "frame":
            np.testing.assert_allclose(float(p1[1]), float(p2[1]), rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_video_fid_metrics(tmp_path):
    import jax
    from dsgan_tpu.models import registry
    from dsgan_tpu.utils import checkpoint as ckpt

    h = w = 32
    g = registry.define_G(3, 3, 8, "resnet_6blocks", dtype=None)
    params = registry.init_params(
        g, jax.random.PRNGKey(0), (1, h, w, 3), "normal")["params"]
    save_dir = str(tmp_path / "ckpt" / "vfid")
    ckpt.save_state(save_dir, 1, {"state": {"params_G": params}},
                    async_save=False)

    frames = tmp_path / "frames"
    gt = tmp_path / "gt"
    os.makedirs(frames); os.makedirs(gt)
    rng = np.random.default_rng(1)
    for t in range(3):
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                        ).save(frames / f"f{t:03d}.png")
        Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                        ).save(gt / f"f{t:03d}.png")

    from dsgan_tpu import video

    video.main([
        "--dataroot", str(frames), "--name", "vfid",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--which_epoch", "1", "--which_model_netG", "resnet_6blocks",
        "--ngf", "8", "--dtype", "float32", "--batchSize", "2",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--loadSize_w", "32", "--loadSize_h", "32",
        "--gt_dir", str(gt), "--no_flow_metric",
        "--inception_weights", "random",
    ])
    text = (tmp_path / "results" / "vfid" / "video" / "temporal.csv").read_text()
    assert "fid," in text and "kid," in text


@pytest.mark.slow
def test_video_cyclegan_batchnorm_checkpoint(tmp_path):
    """The harness pulls the generator out of cycle_gan checkpoints too
    (params_G_A) and restores BatchNorm running stats for --norm batch
    recipes (eval-mode apply)."""
    import jax
    from dsgan_tpu.models import registry
    from dsgan_tpu.utils import checkpoint as ckpt

    h = w = 32
    g = registry.define_G(3, 3, 8, "resnet_6blocks", norm="batch", dtype=None)
    variables = registry.init_params(g, jax.random.PRNGKey(0), (1, h, w, 3), "normal")
    assert variables.get("batch_stats"), "batch norm build should carry stats"
    save_dir = str(tmp_path / "ckpt" / "cyc")
    ckpt.save_state(save_dir, 3, {"state": {
        "params_G_A": variables["params"],
        "stats_G_A": variables["batch_stats"],
    }}, async_save=False)

    frames = tmp_path / "frames"
    os.makedirs(frames)
    rng = np.random.default_rng(1)
    for t in range(3):
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(frames / f"f{t:03d}.png")

    from dsgan_tpu import video

    tc = video.main([
        "--dataroot", str(frames), "--name", "cyc",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--results_dir", str(tmp_path / "results"),
        "--which_epoch", "3", "--which_model_netG", "resnet_6blocks",
        "--ngf", "8", "--dtype", "float32", "--batchSize", "2",
        "--norm", "batch", "--no_flow_metric",
        "--fineSize_w", "32", "--fineSize_h", "32",
        "--loadSize_w", "32", "--loadSize_h", "32",
    ])
    assert np.isfinite(tc)
