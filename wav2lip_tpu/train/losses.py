"""Loss functions for the three training pipelines.

Parity targets: L1 reconstruction + BCE-on-cosine sync loss
(wav2lip_train.py:179-198,227-229), GAN BCE real/fake terms and the
generator-side perceptual term (hq_wav2lip_train.py:227-256,
models/wav2lip.py:163-174).
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities, with torch.nn.BCELoss's log
    clamp at -100 so exact 0/1 predictions stay finite."""
    pred = jnp.clip(pred, 0.0, 1.0)
    log_p = jnp.maximum(jnp.log(jnp.maximum(pred, 1e-44)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, 1e-44)), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def cosine_bce_loss(a: jnp.ndarray, v: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """BCE(cosine_similarity(a, v), y) — the SyncNet training loss
    (color_syncnet_train.py:134-138). ``a``/``v`` are L2-normalized (B, 512)
    embeddings (ReLU towers make the similarity non-negative); ``y`` is
    (B, 1) or (B,)."""
    d = jnp.sum(a * v, axis=1, keepdims=True)
    return bce(d, y.reshape(d.shape))


def fold_lower_half_for_syncnet(g: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) generated frames → (B, H/2, W, 3T) SyncNet face input.

    Matches the reference's get_sync_loss preprocessing
    (wav2lip_train.py:192-198): lower half of each frame, T folded into
    channels time-major ([t0 BGR, t1 BGR, ...])."""
    B, T, H, W, C = g.shape
    lower = g[:, :, H // 2 :, :, :]               # (B, T, H/2, W, 3)
    lower = jnp.transpose(lower, (0, 2, 3, 1, 4))  # (B, H/2, W, T, 3)
    return lower.reshape(B, H // 2, W, T * C)
