"""Device-mesh scaling (the TPU-native replacement for the reference's
torch.nn.DataParallel, networks.py:73-79 — its only parallelism).

Two mesh axes:
  * ``data``    — batch (data-parallel). Params are replicated; gradients
    are reduced by XLA-inserted psums over ICI inside the one compiled
    step. This is compiler-based SPMD: we annotate shardings with
    NamedSharding and jit does the rest.
  * ``spatial`` — image height (the conv-net analog of sequence/context
    parallelism; SURVEY §2.2/§5). Activations are sharded over H and
    XLA's SPMD partitioner inserts halo exchanges for the 7x7/9x9
    windows automatically — the idiomatic TPU answer, no hand-written
    NCCL-style halo code.

Use ``spatial`` for large resolutions (512^2+, video frames) where one
chip's HBM can't hold the activations; use ``data`` for throughput.
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(data_axis=0, spatial_axis=1, devices=None):
    """Build a (data, spatial) mesh. data_axis=0 means 'all remaining'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if spatial_axis <= 0:
        spatial_axis = 1
    if data_axis <= 0:
        data_axis = n // spatial_axis
    assert data_axis * spatial_axis <= n, (
        f"mesh {data_axis}x{spatial_axis} needs more than the {n} visible devices"
    )
    devs = np.asarray(devices[: data_axis * spatial_axis]).reshape(data_axis, spatial_axis)
    return Mesh(devs, axis_names=("data", "spatial"))


def batch_sharding(mesh):
    """NHWC batch: N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial", None, None))


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh):
    """Place an NHWC numpy/jax batch onto the mesh (N x H sharded)."""
    return jax.device_put(batch, batch_sharding(mesh))


def make_parallel_infer(apply_fn, mesh):
    """jit a generator forward over the mesh for large-resolution
    inference: params replicated, NHWC input/output sharded N x H.
    XLA inserts halo exchanges for the conv windows on the spatial axis —
    this is how 512^2+/video frames exceed single-chip HBM (SURVEY §5's
    long-context analog)."""
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return jax.jit(apply_fn, in_shardings=(repl, data), out_shardings=data)


def make_parallel_step(step_fn, mesh, donate_state=True):
    """jit the fused train step over the mesh.

    state (params, opt, pool, rng) is replicated; real_A/real_B are
    batch-sharded (N over data, H over spatial); lr is replicated.
    XLA inserts the gradient all-reduces over ICI and the halo exchanges
    for spatially-sharded convolutions.
    """
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl, data),
        donate_argnums=(0,) if donate_state else (),
    )
