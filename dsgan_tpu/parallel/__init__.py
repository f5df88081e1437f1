from dsgan_tpu.parallel.mesh import (
    get_mesh,
    resolve_mesh,
    shard_batch,
    shard_chunk,
    replicate,
    make_parallel_step,
    make_parallel_chained_step,
    make_parallel_split_chained_step,
    make_parallel_infer,
    batch_sharding,
    chunk_sharding,
)
from dsgan_tpu.parallel import multihost

__all__ = [
    "get_mesh",
    "resolve_mesh",
    "shard_batch",
    "shard_chunk",
    "replicate",
    "make_parallel_step",
    "make_parallel_chained_step",
    "make_parallel_split_chained_step",
    "make_parallel_infer",
    "batch_sharding",
    "chunk_sharding",
    "multihost",
]
