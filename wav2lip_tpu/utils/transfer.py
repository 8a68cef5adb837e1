"""Parallel host↔device transfers.

The TPU link (PCIe locally, a tunnel under axon) is per-stream windowed: one
``device_put`` stream moves ~25 MB/s here while four concurrent streams move
>1 GB/s aggregate. Splitting an array along its batch axis and moving the
shards from a small thread pool turns the link latency-bound → bandwidth-bound
(measured 40x on uploads, 9x on fetches). jax releases the GIL during
transfers, so the pool costs one core nothing.

No reference equivalent — the reference's host↔device traffic is implicit in
``.cuda()``/``.cpu()`` calls (inference.py:259-265).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax
import numpy as np

_DEFAULT_STREAMS = 4

_pool: Optional[ThreadPoolExecutor] = None


def _get_pool() -> ThreadPoolExecutor:
    global _pool
    if _pool is None:
        _pool = ThreadPoolExecutor(
            max_workers=8, thread_name_prefix="w2l-xfer"
        )
    return _pool


def split_sizes(n: int, shards: int) -> List[int]:
    """np.array_split sizing: first ``n % shards`` parts get one extra."""
    shards = max(1, min(shards, n))
    base, extra = divmod(n, shards)
    return [base + (1 if i < extra else 0) for i in range(shards)]


def put_sharded(arr: np.ndarray, streams: int = _DEFAULT_STREAMS,
                device=None) -> List[jax.Array]:
    """Upload ``arr`` as batch-axis shards moved concurrently.

    Returns the list of device shards (callers typically pass them straight
    into a jitted function that concatenates in-graph, so the full array
    never exists twice on the host).
    """
    parts = np.array_split(arr, max(1, min(streams, len(arr))))
    pool = _get_pool()
    futs = [pool.submit(jax.device_put, p, device) for p in parts]
    return [f.result() for f in futs]


def fetch_concat(shards: Sequence[jax.Array]) -> np.ndarray:
    """Fetch device shards concurrently and reassemble on the host."""
    if len(shards) == 1:
        return np.asarray(shards[0])
    for s in shards:  # start all copies before blocking on any
        try:
            s.copy_to_host_async()
        except AttributeError:
            break
    pool = _get_pool()
    futs = [pool.submit(np.asarray, s) for s in shards]
    return np.concatenate([f.result() for f in futs], axis=0)
