"""CycleGAN fused-step tests (tiny nets, CPU)."""
import argparse

import jax
import numpy as np
import pytest


def cyc_opt(tmp_path, **kw):
    d = dict(
        isTrain=True, model="cycle_gan", which_model_netG="resnet_6blocks",
        which_model_netD="basic", dataset_mode="unaligned", norm="instance",
        input_nc=3, output_nc=3, ngf=8, ndf=8, n_layers_D=3,
        fineSize_w=32, fineSize_h=32, loadSize_w=32, loadSize_h=32,
        batchSize=2, no_lsgan=False, no_dropout=True, init_type="normal",
        lr=2e-4, beta1=0.5, niter=10, niter_decay=10, epoch_count=1,
        lr_policy="lambda", lr_decay_iters=50, which_direction="AtoB",
        checkpoints_dir=str(tmp_path), name="cyc", seed=20, dtype="float32",
        pool_size=4, lambda_A=10.0, lambda_B=10.0, lambda_identity=0.5,
        continue_train=False, which_epoch="1",
    )
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.mark.slow
def test_cyclegan_step_and_losses(tmp_path):
    from dsgan_tpu.models.cycle_gan import CycleGANModel

    m = CycleGANModel()
    m.initialize(cyc_opt(tmp_path))
    rng = np.random.default_rng(0)
    b = {
        "A": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32),
        "B": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32),
    }
    m.set_input(b)
    m.optimize_parameters()
    m.optimize_parameters()
    losses = m.get_current_losses()
    assert set(losses) == {"D_A", "G_A", "cycle_A", "idt_A", "D_B", "G_B", "cycle_B", "idt_B"}
    assert all(np.isfinite(v) for v in losses.values())
    vis = m.get_current_visuals()
    assert set(vis) == {"real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"}
    assert int(m.state.step) == 2


def test_cyclegan_registry_dispatch(tmp_path):
    from dsgan_tpu.models import create_model

    m = create_model(cyc_opt(tmp_path))
    assert m.name() == "CycleGANModel"


@pytest.mark.slow
def test_cyclegan_cycle_improves_when_only_cycle_loss(tmp_path):
    """With identity+cycle only (no GAN influence via lr on D is still fine),
    overfitting one batch should reduce the cycle losses."""
    from dsgan_tpu.models.cycle_gan import CycleGANModel

    m = CycleGANModel()
    # batchSize must match the actual fed batch: the mesh data
    # axis is sized from it (the train loader guarantees this
    # via drop_last; direct API drives must too)
    m.initialize(cyc_opt(tmp_path, pool_size=0, lr=1e-3, batchSize=1))
    rng = np.random.default_rng(1)
    b = {
        "A": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
        "B": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
    }
    m.set_input(b)
    first = None
    for i in range(30):
        m.optimize_parameters()
        cyc = float(np.asarray(m._metrics["loss_cycle_A"])) + float(
            np.asarray(m._metrics["loss_cycle_B"])
        )
        if i == 0:
            first = cyc
    assert cyc < first, (first, cyc)
