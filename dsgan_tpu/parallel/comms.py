"""Communication accounting for sharded programs.

The single-chip perf work counts FLOPs and HBM bytes (docs/PERF.md,
BASELINE.md); this module gives the multi-chip programs the same
discipline BEFORE real multi-chip hardware exists: parse the
SPMD-partitioned HLO of a compiled step and tally every collective's
payload bytes — gradient all-reduces riding the data axis, halo
collective-permutes riding the spatial axis, and anything else XLA's
partitioner inserted.

The partitioner (GSPMD) is shared between the CPU and TPU backends, so
the collective STRUCTURE measured on the virtual 8-device CPU mesh is
the structure a TPU slice would run; only fusion details differ.
Consumed by tools/comms_audit.py (BASELINE.md table) and pinned by
tests/test_comms.py. No reference counterpart: the reference's
distribution story is single-process torch DataParallel
(/root/reference/DSGAN/models/networks.py init weights + train.py loop).
"""

import re
from collections import defaultdict

_DTYPE_BYTES = {
    "pred": 1, "u8": 1, "s8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "bf16": 2, "f16": 2, "u16": 2, "s16": 2,
    "f32": 4, "u32": 4, "s32": 4,
    "f64": 8, "u64": 8, "s64": 8,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "collective-permute", "reduce-scatter",
    "all-to-all",
)

# "<shape> <op>(" where <shape> is "f32[2,3]{1,0}" or a tuple
# "(f32[..], /*index=5*/ u8[..], ...)" — note tuple shapes embed
# "/*index=N*/" comments (an '=' inside!), so the shape is captured
# lazily as "everything between '= ' and the op name". Async forms are
# "<op>-start(" (skip "-done": same payload already counted at -start).
_LINE_RE = re.compile(
    r"=\s+(.*?)\s+"
    r"(all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all)"
    r"(-start)?\("
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str):
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text):
    """Tally collectives in (post-SPMD) HLO text.

    Returns {op_kind: {"count": int, "bytes": int}} where bytes is the
    total per-step payload (sum of each op's result shape) ON ONE DEVICE.
    For collective-permute the result is exactly the bytes received per
    device; for all-reduce it is the reduced tensor size (the classic
    ring sends 2*(n-1)/n of that per device — apply the algo factor at
    the modeling layer, not here).
    """
    stats = defaultdict(lambda: {"count": 0, "bytes": 0})
    for line in hlo_text.splitlines():
        m = _LINE_RE.search(line)
        if not m:
            continue
        shape_str, op, _ = m.groups()
        if f"{op}-done" in line:
            continue
        stats[op]["count"] += 1
        stats[op]["bytes"] += _shape_bytes(shape_str)
    return dict(stats)


def audit_train_step(step_fn, mesh, state, real_A, real_B, lr,
                     n_batch_args=2, n_batch_outs=1):
    """Lower+compile a fused train step over ``mesh`` (no execution) and
    return its collective stats plus XLA's own cost analysis."""
    import jax

    from dsgan_tpu.parallel.mesh import (
        batch_sharding, make_parallel_step, replicate, shard_batch,
    )

    pstep = make_parallel_step(step_fn, mesh, donate_state=False,
                               n_batch_args=n_batch_args,
                               n_batch_outs=n_batch_outs)
    st = replicate(state, mesh)
    ra = shard_batch(real_A, mesh)
    rb = shard_batch(real_B, mesh)
    compiled = pstep.lower(st, ra, rb, lr).compile()
    stats = collective_stats(compiled.as_text())
    try:
        cost = compiled.cost_analysis() or {}
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
    except Exception:
        cost = {}
    return stats, cost


def predict_step_comms_seconds(stats, mesh_shape, ici_bytes_per_s=4.5e10):
    """Lower-bound wire time per step from the tallied payloads.

    Model: ring all-reduce/reduce-scatter/all-gather move
    2*(n-1)/n (resp. (n-1)/n) of the payload per device over the slowest
    axis; collective-permute payloads are already per-device receive
    bytes. ``ici_bytes_per_s`` defaults to one v5e ICI link's ~45 GB/s
    one-way (jax-ml.github.io/scaling-book accounting); real slices have
    a link per torus axis, so this is conservative.
    """
    data, spatial = mesh_shape
    t = 0.0
    for op, s in stats.items():
        b = s["bytes"]
        if op == "all-reduce":
            n = max(data, spatial)  # reductions ride their own axis
            t += 2 * (n - 1) / n * b / ici_bytes_per_s
        elif op in ("all-gather", "reduce-scatter"):
            n = max(data, spatial)
            t += (n - 1) / n * b / ici_bytes_per_s
        else:  # collective-permute / all-to-all: payload is per-device
            t += b / ici_bytes_per_s
    return t
