"""Orbax checkpointing (the reference's save_networks/load_networks,
DSGAN/models/base_model.py:92-148, done right).

Differences by design:
  * ONE canonical path per epoch — the reference saves to
    '{epoch}_useSE_net_{name}.pth' but loads '{epoch}_net_{name}.pth'
    (base_model.py:95 vs 119), so resume required a manual rename. Fixed.
  * Optimizer state, replay-pool state, RNG and step counter are saved
    with the params, so --continue_train resumes the exact trajectory
    (the reference restarts Adam moments, SURVEY §5).
  * Saves are ASYNC: the device->host fetch happens synchronously but
    serialization overlaps the next epoch's training; in-flight saves are
    finalized on the next save and at interpreter exit.
  * Optional retention: keep_latest(save_dir, k) prunes all but the k
    newest epoch dirs (wired to --keep_ckpts in the train CLI).
"""

import atexit
import os
import shutil

import orbax.checkpoint as ocp

_async_ckptr = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_async_ckptr.wait_until_finished)
    return _async_ckptr


def _epoch_dir(save_dir, epoch):
    return os.path.abspath(os.path.join(save_dir, f"epoch_{epoch}"))


def save_state(save_dir, epoch, state_pytree, async_save=True):
    os.makedirs(save_dir, exist_ok=True)
    path = _epoch_dir(save_dir, epoch)
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(state_pytree), force=True)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state_pytree, force=True)
    return path


def wait_for_saves():
    """Block until any in-flight async save has been finalized."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def keep_latest(save_dir, k, keep_none_ok=False):
    """Retention policy: delete all but the k newest epoch_* checkpoints.
    In-flight saves are finalized first so the newest dir is complete.

    k <= 0 is a no-op (retention disabled) unless ``keep_none_ok`` — used
    by the pre-save prune, where k-1 == 0 legitimately means "the save
    about to be issued is the only one to keep"."""
    if not os.path.isdir(save_dir) or (k <= 0 and not keep_none_ok) or k < 0:
        return
    wait_for_saves()
    epochs = []
    for name in os.listdir(save_dir):
        if name.startswith("epoch_"):
            try:
                epochs.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    drop = sorted(epochs)[:-k] if k > 0 else sorted(epochs)
    for e in drop:
        shutil.rmtree(_epoch_dir(save_dir, e), ignore_errors=True)


def restore_state(save_dir, epoch, target_pytree):
    wait_for_saves()
    path = _epoch_dir(save_dir, epoch)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=target_pytree)


def restore_untyped(save_dir, epoch):
    """Restore as plain nested dicts of HOST numpy arrays (no target) —
    used by inference-only loads that pick the generator params out of a
    full train checkpoint.

    The leaves are restored as np.ndarray explicitly: a bare
    ``restore(path)`` asks orbax to deserialize onto the default device
    without a sharding, which works on CPU but fails on accelerator
    backends ("sharding passed to deserialization should be specified" —
    hit when evaluating a checkpoint on TPU). Host numpy is also the
    right type here: the consumer jits the params onto the device (or
    mesh) itself."""
    import jax
    import numpy as np

    wait_for_saves()
    path = _epoch_dir(save_dir, epoch)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
        )
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def latest_epoch(save_dir):
    """Highest epoch number present in save_dir, or None."""
    wait_for_saves()
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
