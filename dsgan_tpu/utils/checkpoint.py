"""Orbax checkpointing (the reference's save_networks/load_networks,
DSGAN/models/base_model.py:92-148, done right).

Differences by design:
  * ONE canonical path per epoch — the reference saves to
    '{epoch}_useSE_net_{name}.pth' but loads '{epoch}_net_{name}.pth'
    (base_model.py:95 vs 119), so resume required a manual rename. Fixed.
  * Optimizer state, replay-pool state, RNG and step counter are saved
    with the params, so --continue_train resumes the exact trajectory
    (the reference restarts Adam moments, SURVEY §5).
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _epoch_dir(save_dir, epoch):
    return os.path.abspath(os.path.join(save_dir, f"epoch_{epoch}"))


def save_state(save_dir, epoch, state_pytree):
    os.makedirs(save_dir, exist_ok=True)
    path = _epoch_dir(save_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state_pytree, force=True)
    return path


def restore_state(save_dir, epoch, target_pytree):
    path = _epoch_dir(save_dir, epoch)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=target_pytree)


def restore_untyped(save_dir, epoch):
    """Restore as plain nested dicts (no target) — used by inference-only
    loads that pick the generator params out of a full train checkpoint."""
    path = _epoch_dir(save_dir, epoch)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def latest_epoch(save_dir):
    """Highest epoch number present in save_dir, or None."""
    if not os.path.isdir(save_dir):
        return None
    epochs = []
    for name in os.listdir(save_dir):
        if name.startswith("epoch_"):
            try:
                epochs.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(epochs) if epochs else None
