"""Train state pytrees."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Model + optimizer state threaded through jitted steps.

    Logical content mirrors the reference checkpoints: parameters, BN running
    stats, optimizer state, and the global step (wav2lip_train.py:299-304).
    """

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats"),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self):
        out = {"params": self.params}
        if self.batch_stats is not None:
            out["batch_stats"] = self.batch_stats
        return out
