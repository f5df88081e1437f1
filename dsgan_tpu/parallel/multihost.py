"""Multi-host (pod-slice) initialization — the capability layer above the
in-slice mesh in dsgan_tpu.parallel.mesh.

The reference's only scaling mechanism is single-process
torch.nn.DataParallel (DSGAN/models/networks.py:77). The TPU-native
equivalent of going beyond one host is jax.distributed.initialize():
every host runs the same program, JAX stitches the processes into one
global device set, and the data/spatial mesh in mesh.py then spans the
whole slice — collectives ride ICI within the slice, DCN across slices,
all inserted by XLA from the sharding annotations. No NCCL/MPI-style
explicit communication exists anywhere in this framework.

Wired to the CLI as --num_hosts N (options/base_options.py). On Cloud TPU
pods jax.distributed.initialize() autodetects coordinator/process_id from
the TPU metadata server; elsewhere the standard env vars
JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID (or the explicit arguments) are
used. Safe to call exactly once per process, before any device access.
"""

import os

import jax

_initialized = False


def initialize(num_hosts: int, coordinator: str = None, process_id: int = None):
    """Join this process into an ``num_hosts``-process JAX cluster.

    Arguments fall back to the JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID
    environment variables, and finally to jax.distributed's own
    autodetection (Cloud TPU metadata). Idempotent within a process.
    """
    global _initialized
    if num_hosts <= 1:
        return False
    if _initialized:
        return True

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    kwargs = {"num_processes": int(num_hosts)}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    # Establish the cross-process collective context NOW, while every
    # rank is at the same point (initialize() is itself a rendezvous).
    # The context is otherwise created lazily at the first collective —
    # which may be minutes into model construction, skewed across ranks
    # by compile timing, and its key-exchange window is short (observed:
    # gloo 30 s GetKeyValue timeout killing a 2-process CPU run whose
    # ranks compiled at different speeds). Doing it here also fail-fasts
    # broken inter-host connectivity at startup instead of mid-step.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("dsgan:multihost_init")
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def process_index() -> int:
    """This host's rank in the cluster (0 on a single host)."""
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the host that should own logging / checkpoint writes."""
    return jax.process_index() == 0
