from wav2lip_tpu.parallel.mesh import (
    make_mesh,
    maybe_data_parallel_mesh,
    replicated,
    batch_sharded,
    shard_batch,
)
from wav2lip_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    local_batch_size,
    global_batch_from_local,
)

__all__ = [
    "make_mesh",
    "maybe_data_parallel_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "maybe_initialize_distributed",
    "local_batch_size",
    "global_batch_from_local",
]
