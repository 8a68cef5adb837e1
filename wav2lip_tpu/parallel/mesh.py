"""Device mesh construction and sharding rules.

The reference's only distribution mechanisms are ``nn.DataParallel``-trained
checkpoints and per-GPU preprocessing fan-out (SURVEY.md §2); the TPU-native
equivalent is a 1-D ``data`` mesh: batches shard across chips, parameters
replicate, and XLA inserts gradient ``psum`` over ICI automatically from the
sharding annotations. The models here are 14-36M-param CNNs — fully replicated
parameters are the right layout (tensor/pipeline parallelism would add
collectives with nothing to amortize them).

Works identically on 1 chip, an 8-device virtual CPU mesh (tests), or a pod
slice: every jitted step takes mesh-sharded arrays and the same code path runs
everywhere.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def maybe_data_parallel_mesh(enabled: bool, label: str) -> Optional[Mesh]:
    """The CLIs' ``--data_parallel`` helper: an all-device mesh when the flag
    is set AND more than one device is visible, else None (single-device
    fallback). Prints what it decided so runs are self-describing."""
    if not enabled:
        return None
    n = len(jax.devices())
    if n <= 1:
        print(f"--data_parallel requested but only {n} device visible; "
              f"running single-device")
        return None
    print(f"data-parallel {label} over {n} devices")
    return make_mesh()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-axis sharding on the mesh.

    Arrays whose leading dimension does not divide the mesh size are
    replicated instead (XLA requires even shards) with a warning — silent
    replication would make every chip compute the full batch; keep global
    batch sizes a multiple of the device count for actual data parallelism.
    """
    n = mesh.devices.size

    def put(x):
        if np.ndim(x) >= 1:
            if np.shape(x)[0] % n == 0:
                return jax.device_put(x, batch_sharded(mesh, np.ndim(x)))
            if n > 1:
                warnings.warn(
                    f"shard_batch: leading dim {np.shape(x)[0]} is not "
                    f"divisible by the {n}-device mesh — replicating instead "
                    f"(no data parallelism for this array)",
                    stacklevel=3,
                )
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)
