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


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def resolve_mesh(data_axis=0, spatial_axis=1, batch_size=None, height=None,
                 devices=None):
    """Resolve the CLI flags --data_axis/--spatial_axis to a Mesh or None.

    This is the production entry used by every training algorithm's
    ``initialize`` (the reference puts its one parallelism mechanism,
    DataParallel, on the real path for every run — networks.py:73-79;
    this is the TPU equivalent):

      * ``data_axis == 0`` (the default) means "all visible devices /
        spatial_axis", reduced to the largest count that divides
        ``batch_size`` so the batch shards evenly (static shapes).
      * an explicit ``data_axis`` that does not divide ``batch_size``, or
        a ``spatial_axis`` that does not divide the image height, is a
        hard error — silently training on fewer devices than asked for
        is worse than failing.
      * a resolved 1x1 mesh returns None: the caller uses the plain
        single-device jit path.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    spatial = max(int(spatial_axis or 1), 1)
    if spatial > n:
        raise ValueError(f"--spatial_axis {spatial} exceeds the {n} visible devices")
    if height is not None and spatial > 1 and height % spatial != 0:
        raise ValueError(
            f"--spatial_axis {spatial} must divide the image height {height}"
        )
    data = int(data_axis or 0)
    if data <= 0:
        data = max(n // spatial, 1)
        if batch_size is not None:
            while data > 1 and batch_size % data != 0:
                data -= 1
    elif batch_size is not None and batch_size % data != 0:
        raise ValueError(
            f"--batchSize {batch_size} must be divisible by --data_axis {data}"
        )
    if data * spatial > n:
        raise ValueError(
            f"mesh {data}x{spatial} needs more than the {n} visible devices"
        )
    if data * spatial == 1:
        return None
    return get_mesh(data, spatial, devices)


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


def chunk_sharding(mesh):
    """k-stacked NHWC batches (k, N, H, W, C) for --steps_per_dispatch:
    the scan axis k is unsharded; N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P(None, "data", "spatial", None, None))


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh):
    """Place an NHWC numpy/jax batch onto the mesh (N x H sharded)."""
    data, spatial = mesh.devices.shape
    if batch.shape[0] % data != 0 or batch.shape[1] % spatial != 0:
        raise ValueError(
            f"batch {batch.shape} does not tile onto the {data}x{spatial} "
            f"(data x spatial) mesh: N must divide by {data} and H by "
            f"{spatial}. The train loader guarantees full batches "
            "(drop_last); direct model-API drives must feed batches of "
            "exactly --batchSize, or build the model with matching axes."
        )
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


def shard_chunk(chunk, mesh):
    """Place a k-stacked (k, N, H, W, C) host chunk onto the mesh."""
    data, spatial = mesh.devices.shape
    if chunk.shape[1] % data != 0 or chunk.shape[2] % spatial != 0:
        raise ValueError(
            f"chunk {chunk.shape} does not tile onto the {data}x{spatial} "
            f"(data x spatial) mesh: N (axis 1) must divide by {data} and "
            f"H (axis 2) by {spatial}."
        )
    return jax.device_put(chunk, chunk_sharding(mesh))


def make_parallel_chained_step(chained_fn, mesh, donate_state=True,
                               n_batch_args=2, n_batch_outs=1):
    """jit a k-chained step ``(state, chunk..., lr)`` over the mesh.

    Same contract as make_parallel_step but the batch arguments carry a
    leading unsharded scan axis k and the metrics output is k-stacked
    (replicated); the trailing ``n_batch_outs`` are the LAST sub-step's
    per-image outputs (data-sharded)."""
    repl = NamedSharding(mesh, P())
    chunk = chunk_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        chained_fn,
        in_shardings=(repl,) + (chunk,) * n_batch_args + (repl,),
        out_shardings=(repl, repl) + (data,) * n_batch_outs,
        donate_argnums=(0,) if donate_state else (),
    )


def make_parallel_split_chained_step(split_fn, mesh, k, donate_state=True,
                                     n_batch_args=2, n_batch_outs=1):
    """jit a split-input k-chained step ``(state, b_0..b_{k*n-1}, lr)``
    over the mesh: each batch arg is sharded like a PLAIN batch (N over
    data, H over spatial) and the in-jit stack adds the unsharded scan
    axis. Same outputs as make_parallel_chained_step. Exists because one
    k-stacked H2D put completes far slower than k pipelined per-batch
    puts on relay-attached devices (measured record:
    tools/relay_experiments.py; shipped variant: make_fused_chunk_step)."""
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return jax.jit(
        split_fn,
        in_shardings=(repl,) + (data,) * (k * n_batch_args) + (repl,),
        out_shardings=(repl, repl) + (data,) * n_batch_outs,
        donate_argnums=(0,) if donate_state else (),
    )


def make_parallel_step(step_fn, mesh, donate_state=True, n_batch_args=2,
                       n_batch_outs=1):
    """jit a fused train step ``(state, batch..., lr)`` over the mesh.

    state (params, opt, pool, rng) is replicated; the ``n_batch_args``
    NHWC batch arguments are sharded (N over data, H over spatial); lr is
    replicated. XLA inserts the gradient all-reduces over ICI and the
    halo exchanges for spatially-sharded convolutions.

    Outputs follow the framework-wide step contract
    ``(new_state, metrics, *batch_outs)`` with ``n_batch_outs`` trailing
    per-image outputs (0 for diffusion, 1 for pix2pix/cycle_gan — a
    pytree-prefix sharding covers dict-valued visuals). Output shardings
    are PINNED, not propagated: the partitioner is otherwise free to
    leave new params sharded however the grads landed, which would break
    the replicated-params contract every downstream consumer (infer fns,
    checkpointing, the next step's donation) relies on."""
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl,) + (data,) * n_batch_args + (repl,),
        out_shardings=(repl, repl) + (data,) * n_batch_outs,
        donate_argnums=(0,) if donate_state else (),
    )
