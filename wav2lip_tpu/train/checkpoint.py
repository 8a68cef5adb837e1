"""Checkpoint subsystem: Orbax save/restore + reference ``.pth`` import.

Logical content matches the reference checkpoint dict — model state, optimizer
state, global_step, global_epoch (reference wav2lip_train.py:294-305) — stored
as an Orbax composite. Loading dispatches on file type: a directory is an
Orbax checkpoint, a ``.pth`` file goes through the torch importer (handling
``module.`` prefixes, inference.py:174-175). Resume semantics mirror the
reference's ``reset_optimizer`` / ``overwrite_global_states`` flags
(wav2lip_train.py:316-336).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    payload: Dict[str, Any],
    prefix: str = "",
) -> str:
    """Write ``{ckpt_dir}/{prefix}checkpoint_step{step:09d}`` via Orbax.

    ``payload`` is a pytree, typically ``{"params": ..., "batch_stats": ...,
    "opt_state": ..., "global_step": ..., "global_epoch": ...}``.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(ckpt_dir, f"{prefix}checkpoint_step{step:09d}")
    )
    # Fetch device-resident leaves CONCURRENTLY before handing the tree to
    # Orbax: a serial per-leaf np.asarray pays one device→host round trip
    # per tensor, which over a high-latency device tunnel turned a 145 MB
    # save into minutes (measured 469 s for the 36M-param generator; ~2 s
    # with the pooled fetch).
    from wav2lip_tpu.utils.transfer import fetch_tree

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, fetch_tree(payload), force=True)
    return path


# single-use stash of the full restore a checkpoint_has_opt_state metadata
# fallback had to perform, so the load_orbax that follows the probe does not
# read a potentially multi-GB checkpoint from disk twice
_probe_restore_cache: Dict[str, Any] = {}


def load_orbax(path: str, item=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    key = os.path.abspath(path)
    # pop unconditionally (no stale multi-GB entries); usable only for the
    # template-free restore shape the probe itself performed
    cached = _probe_restore_cache.pop(key, None)
    if item is None and cached is not None:
        return cached
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(key, item=item)


def checkpoint_has_opt_state(path: str) -> bool:
    """True when the checkpoint stores a non-empty ``opt_state`` — probed
    from Orbax metadata (cheap) with a raw-restore fallback, so model-only
    checkpoints (saved with ``opt_state=None``, e.g. eval/export snapshots)
    can be restored without an optimizer-structure template."""
    import orbax.checkpoint as ocp

    try:
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(os.path.abspath(path))
        # StepMetadata.item_metadata is a tree-metadata view whose ``.tree``
        # is the saved pytree with ArrayMetadata leaves
        tree = getattr(meta, "item_metadata", meta)
        tree = getattr(tree, "tree", tree)
        if not isinstance(tree, dict) or "opt_state" not in tree:
            # metadata shape this probe does not recognize (Orbax layouts
            # vary across versions): fall through to the raw restore rather
            # than silently answering "model-only", which would restore
            # opt_state without its structure template and crash the next
            # optimizer update
            raise LookupError("unrecognized checkpoint metadata layout")
        sub = tree["opt_state"]
        return sub is not None and jax.tree.leaves(sub) != []
    except Exception:
        raw = load_orbax(path)
        # keep the expensive full restore for the load_orbax call that
        # almost always follows this probe (trainers._restore)
        _probe_restore_cache[os.path.abspath(path)] = raw
        return raw.get("opt_state") is not None


def latest_checkpoint(ckpt_dir: str, prefix: str = "") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    names = [
        n for n in os.listdir(ckpt_dir)
        if n.startswith(f"{prefix}checkpoint_step")
        and os.path.isdir(os.path.join(ckpt_dir, n))
    ]
    if not names:
        return None
    return os.path.join(ckpt_dir, max(names))


def load_model_variables(path: str, importer: Callable) -> Dict[str, Any]:
    """Load model variables from either an Orbax checkpoint directory or a
    reference torch ``.pth`` file (converted via ``importer``, one of the
    ``wav2lip_tpu.convert.import_*`` functions).

    Returns Flax variables ``{"params": ..., "batch_stats"?: ...}``.
    """
    if os.path.isdir(path):
        restored = load_orbax(path)
        out = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            out["batch_stats"] = restored["batch_stats"]
        return out
    from wav2lip_tpu.convert.torch_import import load_torch_state_dict

    return importer(load_torch_state_dict(path))
