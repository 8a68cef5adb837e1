"""SyncNet lip-sync expert: two-tower audio/visual embedding net.

Parity with reference models/syncnet.py:7-66 (16,435,072 params). The face
tower consumes a 5-frame lower-half-face window with frames stacked along
channels — NHWC input (B, 48, 96, 15) — and the audio tower a mel window
(B, 80, 16, 1); both produce L2-normalized 512-d embeddings whose cosine
similarity scores lip sync.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from wav2lip_tpu.models.blocks import ConvBNRelu

FACE_ENCODER_SPEC: Sequence[Tuple] = (
    (32, 7, 1, 3, False),
    (64, 5, (1, 2), 1, False),
    (64, 3, 1, 1, True), (64, 3, 1, 1, True),
    (128, 3, 2, 1, False),
    (128, 3, 1, 1, True), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
    (256, 3, 2, 1, False),
    (256, 3, 1, 1, True), (256, 3, 1, 1, True),
    (512, 3, 2, 1, False),
    (512, 3, 1, 1, True), (512, 3, 1, 1, True),
    (512, 3, 2, 1, False),
    (512, 3, 1, 0, False), (512, 1, 1, 0, False),
)

AUDIO_ENCODER_SPEC: Sequence[Tuple] = (
    (32, 3, 1, 1, False), (32, 3, 1, 1, True), (32, 3, 1, 1, True),
    (64, 3, (3, 1), 1, False), (64, 3, 1, 1, True), (64, 3, 1, 1, True),
    (128, 3, 3, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
    (256, 3, (3, 2), 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True),
    (512, 3, 1, 0, False), (512, 1, 1, 0, False),
)


class SyncNet(nn.Module):
    @nn.compact
    def __call__(self, audio: jnp.ndarray, faces: jnp.ndarray,
                 train: bool = False):
        """audio (B, 80, 16, 1), faces (B, 48, 96, 15) →
        (audio_emb, face_emb), each (B, 512) L2-normalized."""
        a = audio
        for li, (f, k, s, p, res) in enumerate(AUDIO_ENCODER_SPEC):
            a = ConvBNRelu(f, k, s, p, residual=res,
                           name=f"audio_enc_{li}")(a, train=train)
        v = faces
        for li, (f, k, s, p, res) in enumerate(FACE_ENCODER_SPEC):
            v = ConvBNRelu(f, k, s, p, residual=res,
                           name=f"face_enc_{li}")(v, train=train)

        a = a.reshape((a.shape[0], -1))
        v = v.reshape((v.shape[0], -1))
        # F.normalize default eps (reference syncnet.py:62-63): x / max(||x||, 1e-12)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        return a, v
