"""Jittable fixed-shape non-maximum suppression.

The reference runs greedy NMS as a dynamic host loop over a variable-length
candidate list (face_detection/detection/sfd/bbox.py:44-64, with a note that a
Cython version is 10x faster). On TPU the same greedy semantics run as a
static-shape masked scan entirely on device: sort K candidates by score, then
a box survives iff it does not overlap any *surviving* higher-scored box.

IoU arithmetic matches the reference's legacy +1 pixel convention
(bbox.py:48,58) so kept-box sets are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) xyxy → (K, K) IoU with the reference's +1 width convention."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (areas[:, None] + areas[None, :] - inter)


def _nms_single(boxes, scores, valid, iou_threshold: float, max_out: int):
    K = boxes.shape[0]
    if K < max_out:  # pad so the compacted slice below is always max_out long
        pad = max_out - K
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate([scores, jnp.zeros((pad,), scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)])
        K = max_out
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    order = jnp.argsort(jnp.where(valid, scores, neg_inf))[::-1]
    boxes_s = boxes[order]
    scores_s = scores[order]
    valid_s = valid[order]

    iou = pairwise_iou(boxes_s)
    idx = jnp.arange(K)

    def body(i, keep):
        # suppressed if it overlaps any kept, higher-scored (earlier) box
        overlap = (iou[i] > iou_threshold) & keep & (idx < i)
        return keep.at[i].set(keep[i] & ~jnp.any(overlap))

    keep = jax.lax.fori_loop(0, K, body, valid_s)

    # Stable-compact kept entries to the front (argsort of ~keep preserves the
    # score-descending order within each group), then take the top max_out.
    perm = jnp.argsort(~keep, stable=True)
    keep_c = keep[perm][:max_out]
    out_boxes = jnp.where(keep_c[:, None], boxes_s[perm][:max_out], 0.0)
    out_scores = jnp.where(keep_c, scores_s[perm][:max_out], 0.0)
    num_kept = jnp.minimum(jnp.sum(keep), max_out)
    return out_boxes, out_scores, num_kept


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out"))
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.3,
    max_out: int = 16,
):
    """Greedy NMS over a batch of fixed-size candidate sets.

    Args:
      boxes: (B, K, 4) xyxy candidates.
      scores: (B, K).
      valid: (B, K) bool — False entries are ignored.
    Returns:
      (boxes (B, max_out, 4), scores (B, max_out), num_kept (B,)) with kept
      detections packed score-descending at the front.
    """
    return jax.vmap(
        lambda b, s, v: _nms_single(b, s, v, iou_threshold, max_out)
    )(boxes, scores, valid)
