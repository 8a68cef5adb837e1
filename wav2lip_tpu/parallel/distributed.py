"""Multi-host (multi-process) training scaffolding.

The reference is single-node (SURVEY.md §2: no torch.distributed/NCCL/MPI
anywhere); its only fan-out is per-GPU preprocessing threads. The TPU-native
equivalent for pod slices: ``jax.distributed.initialize`` connects the hosts,
each host feeds its local shard of the global batch over DCN, and
``jax.make_array_from_process_local_data`` assembles the logical global array
whose ``data``-axis sharding drives XLA's gradient psum over ICI.

Wire-up is env/flag gated so single-host runs never pay for it:

    W2L_COORDINATOR=host0:1234 W2L_NUM_PROCESSES=4 W2L_PROCESS_ID=2 \
        python -m wav2lip_tpu.cli.train_wav2lip ...

(or the --coordinator_address/--num_processes/--process_id CLI flags).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wav2lip_tpu.parallel.mesh import DATA_AXIS


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """``jax.distributed.initialize`` when multi-host parameters are present
    (flags first, W2L_* env second). Returns True when initialized.

    Must run before the first jax device lookup. Single-host runs (no
    coordinator configured) are a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "W2L_COORDINATOR"
    )
    if not coordinator_address:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("W2L_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid_env = os.environ.get("W2L_PROCESS_ID")
        process_id = int(pid_env) if pid_env is not None else None
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_size(global_batch: int) -> int:
    """Per-process slice of the global batch (DCN input sharding: each host
    loads only its own samples)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} must be divisible by the {n} processes"
        )
    return global_batch // n


def global_batch_from_local(mesh: Mesh, local_batch):
    """Assemble logical global arrays from this process's local shard.

    Each leaf of ``local_batch`` is (local_B, ...); the result is a global
    array of shape (local_B * process_count, ...) sharded over the mesh's
    ``data`` axis. Works identically in single-process runs (where it equals
    ``shard_batch``), so trainers can use one code path.
    """
    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))
        )
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_batch)
