"""S3FD anchor (prior box) decoding, fully vectorized.

The reference decodes candidates one anchor at a time in a Python loop over
``np.where`` hits (face_detection/detection/sfd/detect.py:74-89) — the
detection hot loop. Here every anchor of every scale decodes in one fused XLA
computation; candidate selection happens afterwards with a static top-K.

Per scale i (stride = 2**(i+2)): anchor center = stride/2 + cell_index*stride,
anchor size = 4*stride; box decode uses SSD variances (0.1, 0.2)
(detect.py:80-87, bbox.py:91-109).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def decode_scale(
    cls: jnp.ndarray,
    loc: jnp.ndarray,
    stride: int,
    variances: Tuple[float, float] = (0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One detection head → flattened (scores, boxes).

    Args:
      cls: (B, H, W, 2) head logits (softmax applied here, as detect.py:72).
      loc: (B, H, W, 4) box regressions.
    Returns:
      scores (B, H*W) face probabilities, boxes (B, H*W, 4) xyxy.
    """
    B, H, W, _ = cls.shape
    scores = _softmax(cls)[..., 1].reshape(B, H * W)

    ys = jnp.arange(H, dtype=jnp.float32) * stride + stride / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) * stride + stride / 2.0
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    prior_cx = cx.reshape(-1)
    prior_cy = cy.reshape(-1)
    prior_wh = jnp.asarray(stride * 4.0, jnp.float32)

    loc = loc.reshape(B, H * W, 4)
    gcx = prior_cx + loc[..., 0] * variances[0] * prior_wh
    gcy = prior_cy + loc[..., 1] * variances[0] * prior_wh
    gw = prior_wh * jnp.exp(loc[..., 2] * variances[1])
    gh = prior_wh * jnp.exp(loc[..., 3] * variances[1])
    boxes = jnp.stack(
        [gcx - gw / 2.0, gcy - gh / 2.0, gcx + gw / 2.0, gcy + gh / 2.0],
        axis=-1,
    )
    return scores, boxes


def _softmax(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def decode_all_scales(
    head_outputs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    variances: Tuple[float, float] = (0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All six S3FD heads → (scores (B, A), boxes (B, A, 4)) over every anchor."""
    all_scores: List[jnp.ndarray] = []
    all_boxes: List[jnp.ndarray] = []
    for i, (cls, loc) in enumerate(head_outputs):
        stride = 2 ** (i + 2)
        s, b = decode_scale(cls, loc, stride, variances)
        all_scores.append(s)
        all_boxes.append(b)
    return jnp.concatenate(all_scores, axis=1), jnp.concatenate(all_boxes, axis=1)
