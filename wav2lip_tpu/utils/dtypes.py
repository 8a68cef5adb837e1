"""Dtype helpers shared by the compute pipelines."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast the floating-point leaves of a pytree to ``dtype``.

    Used for mixed-precision parameter/activation casts (train steps, the
    bf16 generator and S3FD trunks); integer leaves (BN step counters,
    labels) pass through untouched. ``dtype=None`` is the identity.
    """
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
