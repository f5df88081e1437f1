"""LR schedule policies against torch oracle semantics.

lambda: verified against the reference formula elsewhere
(tests/test_train_step.py); here we pin step and plateau — plateau was a
round-1 gap (reference defines it at networks.py:42-44 via torch
ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01, patience=5)).
The plateau oracle below is torch.optim.lr_scheduler.ReduceLROnPlateau
itself when torch is importable.
"""

import types

import numpy as np
import pytest

from dsgan_tpu.models.base_model import BaseModel


def _model(policy, lr=0.1, lr_decay_iters=3):
    m = BaseModel()
    opt = types.SimpleNamespace(
        isTrain=True, checkpoints_dir="/tmp/dsgan_lrtest", name="x",
        lr=lr, lr_policy=policy, lr_decay_iters=lr_decay_iters,
        niter=10, niter_decay=10, epoch_count=1,
    )
    m.initialize(opt)
    m._set_lr_from_schedule()
    return m


def test_step_policy():
    m = _model("step", lr=1.0, lr_decay_iters=3)
    seen = [m.lr]
    for _ in range(7):
        m.update_learning_rate()
        seen.append(m.lr)
    np.testing.assert_allclose(
        seen, [1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.01, 0.01], rtol=1e-12
    )


def test_plateau_policy_against_torch():
    torch = pytest.importorskip("torch")

    metrics = [1.0, 0.5, 0.51, 0.52, 0.50, 0.505, 0.51, 0.52, 0.53,
               0.54, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28]

    # torch oracle
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=0.1)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.2, threshold=0.01, patience=5
    )
    torch_lrs = []
    for v in metrics:
        sched.step(v)
        torch_lrs.append(opt.param_groups[0]["lr"])

    m = _model("plateau", lr=0.1)
    ours = []
    for v in metrics:
        m.update_learning_rate(metric=v)
        ours.append(m.lr)

    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-10)


def test_plateau_uses_last_loss_when_no_metric():
    m = _model("plateau", lr=0.1)
    # stagnating loss_G -> decay after patience exceeded
    for _ in range(8):
        m._metrics = {"loss_G": np.float32(1.0)}
        m.update_learning_rate()
    assert m.lr < 0.1
