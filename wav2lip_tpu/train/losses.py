"""Loss functions for the three training pipelines.

Parity targets: L1 reconstruction + BCE-on-cosine sync loss
(wav2lip_train.py:179-198,227-229), GAN BCE real/fake terms and the
generator-side perceptual term (hq_wav2lip_train.py:227-256,
models/wav2lip.py:163-174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


@jax.custom_vjp
def _bce_terms(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-element BCE with torch.nn.BCELoss's clamps on BOTH passes.

    Forward: log terms clamped at -100 (ATen binary_cross_entropy), so
    exact 0/1 predictions stay finite. Backward: ``(pred - target) /
    max(pred·(1-pred), 1e-12)`` — ATen clamps the denominator at
    EPSILON=1e-12, bounding the gradient at ~1e12. The naive autodiff
    gradient is ``1/pred``, which OVERFLOWS float32 (inf) for
    pred ∈ (e^-100, ~3e-39); one dead sample (a ReLU-collapsed embedding
    gives cosine 0) then poisons Adam's moments with inf → the whole run
    goes NaN within a step. Observed in round-5 expert calibration: SyncNet
    training at lr 5e-4 went NaN near step 550 without this clamp; the
    reference's torch backward survives the same event.

    The [0, 1] input clamp (torch asserts its input is already in range;
    float fuzz can push a cosine to 1+1e-7 here) lives INSIDE this
    custom-vjp so the backward is exactly ATen's formula on the clamped
    value — a differentiable ``jnp.clip`` outside would split the gradient
    0.5/0.5 at the 0/1 ties (jnp.maximum's tie rule, and XLA:CPU flushes
    subnormal preds to an exact 0 tie), silently halving the boundary
    gradient torch produces."""
    pred = jnp.clip(pred, 0.0, 1.0)
    log_p = jnp.maximum(jnp.log(jnp.maximum(pred, 1e-44)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, 1e-44)), -100.0)
    return -(target * log_p + (1.0 - target) * log_1p)


def _bce_terms_fwd(pred, target):
    return _bce_terms(pred, target), (pred, target)


def _bce_terms_bwd(res, g):
    pred, target = res
    pred = jnp.clip(pred, 0.0, 1.0)
    denom = jnp.maximum(pred * (1.0 - pred), 1e-12)
    d_pred = g * (pred - target) / denom
    # targets are labels/constants here, but supply the analytic gradient
    # (d/dtarget of the clamped forward) for completeness
    log_p = jnp.maximum(jnp.log(jnp.maximum(pred, 1e-44)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, 1e-44)), -100.0)
    return d_pred, g * (log_1p - log_p)


_bce_terms.defvjp(_bce_terms_fwd, _bce_terms_bwd)


def bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities — torch.nn.BCELoss parity on
    the forward (log clamp at -100) AND the backward (denominator clamp at
    1e-12; see :func:`_bce_terms`)."""
    return jnp.mean(_bce_terms(pred, target))


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
