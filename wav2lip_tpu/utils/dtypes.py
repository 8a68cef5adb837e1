"""Dtype helpers shared by the compute pipelines."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cast_floats(tree, dtype):
    """Cast the floating-point leaves of a pytree to ``dtype``.

    Used for mixed-precision parameter/activation casts (train steps, the
    bf16 generator and S3FD trunks); integer leaves (BN step counters,
    labels) pass through untouched. ``dtype=None`` is the identity.

    Inside a trace this is the right tool (the casts fuse into the caller's
    program). For an EAGER whole-model cast at pipeline init use
    :func:`cast_floats_fused`: eager per-leaf ``astype`` on device arrays
    dispatches one ``jit(convert_element_type)`` per distinct leaf shape —
    measured ~50 sub-threshold compiles x 0.4-1 s at detector init, none of
    them persistently cached.
    """
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def cast_floats_fused(tree, dtype):
    """Eager init-time float cast: host leaves cast via numpy (zero
    compiles; ml_dtypes covers bfloat16), device leaves in ONE jitted
    program for the whole tree instead of one dispatch per leaf.

    Not for use inside ``jit`` (every leaf is a tracer there — call
    :func:`cast_floats`)."""
    if dtype is None:
        return tree
    dtype = jnp.dtype(dtype)
    leaves, treedef = jax.tree.flatten(tree)
    out = list(leaves)
    dev_idx = []
    for i, x in enumerate(leaves):
        if not (hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating)
                and x.dtype != dtype):
            continue
        if isinstance(x, jax.Array):
            dev_idx.append(i)
        else:
            out[i] = np.asarray(x).astype(dtype)
    if dev_idx:
        casted = jax.jit(
            lambda xs: tuple(x.astype(dtype) for x in xs)
        )(tuple(leaves[i] for i in dev_idx))
        for i, arr in zip(dev_idx, casted):
            out[i] = arr
    return jax.tree.unflatten(treedef, out)
