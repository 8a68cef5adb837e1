"""Wav2Lip generator: audio-conditioned face U-Net.

Topology parity with reference models/wav2lip.py:8-125 (36,298,035 params):
a 7-stage face encoder over 6-channel input (masked-lower-half target frame
concatenated with a reference frame), a 13-layer audio encoder mapping a
(80, 16) mel window to a 512-d embedding, and a 7-stage decoder whose every
stage output is concatenated with the matching encoder skip.

TPU-first conventions: NHWC layouts; the 5-frame temporal window is folded
into the batch axis (one static-shape conv stack, no temporal loop); all
shapes static under jit.

I/O (NHWC): ``audio`` (B, T, 80, 16, 1) or (N, 80, 16, 1); ``faces``
(B, T, 96, 96, 6) or (N, 96, 96, 6) — channels are [masked_target(3),
reference(3)], pixel range [0, 1]. Output matches the faces rank with 3
channels, sigmoid range (0, 1).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from wav2lip_tpu.models.blocks import (
    ConvBNRelu,
    ConvTransposeBNRelu,
    fold_time,
    unfold_time,
    kaiming_uniform,
)

# (features, kernel, stride, padding, residual) per conv, grouped per stage.
# Face encoder: 96→96→48→24→12→6→3→1 spatial (reference wav2lip.py:12-36).
FACE_ENCODER_SPEC: Sequence[Sequence[Tuple]] = (
    ((16, 7, 1, 3, False),),
    ((32, 3, 2, 1, False), (32, 3, 1, 1, True), (32, 3, 1, 1, True)),
    ((64, 3, 2, 1, False), (64, 3, 1, 1, True), (64, 3, 1, 1, True),
     (64, 3, 1, 1, True)),
    ((128, 3, 2, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True)),
    ((256, 3, 2, 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True)),
    ((512, 3, 2, 1, False), (512, 3, 1, 1, True)),
    ((512, 3, 1, 0, False), (512, 1, 1, 0, False)),
)

# Audio encoder: (80,16) → (1,1)x512 (reference wav2lip.py:38-55).
AUDIO_ENCODER_SPEC: Sequence[Tuple] = (
    (32, 3, 1, 1, False), (32, 3, 1, 1, True), (32, 3, 1, 1, True),
    (64, 3, (3, 1), 1, False), (64, 3, 1, 1, True), (64, 3, 1, 1, True),
    (128, 3, 3, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
    (256, 3, (3, 2), 1, False), (256, 3, 1, 1, True),
    (512, 3, 1, 0, False), (512, 1, 1, 0, False),
)

# Decoder stages: first is a plain 1x1 conv block; the rest start with a
# transpose conv (features, kernel, stride, padding, output_padding) followed
# by residual conv blocks (reference wav2lip.py:57-81).
DECODER_SPEC: Sequence[Tuple] = (
    # (transpose_conv or None, [residual conv features ...])
    (None, (512, 1, 1, 0, False)),
    ((512, 3, 1, 0, 0), (512, 3, 1, 1, True)),
    ((512, 3, 2, 1, 1), (512, 3, 1, 1, True), (512, 3, 1, 1, True)),
    ((384, 3, 2, 1, 1), (384, 3, 1, 1, True), (384, 3, 1, 1, True)),
    ((256, 3, 2, 1, 1), (256, 3, 1, 1, True), (256, 3, 1, 1, True)),
    ((128, 3, 2, 1, 1), (128, 3, 1, 1, True), (128, 3, 1, 1, True)),
    ((64, 3, 2, 1, 1), (64, 3, 1, 1, True), (64, 3, 1, 1, True)),
)


class Wav2LipGenerator(nn.Module):
    @nn.compact
    def __call__(self, audio: jnp.ndarray, faces: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        folded = faces.ndim == 5
        if folded:
            B = faces.shape[0]
            audio = fold_time(audio)
            faces = fold_time(faces)

        # Audio tower → (N, 1, 1, 512)
        a = audio
        for li, (f, k, s, p, res) in enumerate(AUDIO_ENCODER_SPEC):
            a = ConvBNRelu(f, k, s, p, residual=res,
                           name=f"audio_enc_{li}")(a, train=train)

        # Face encoder with skip collection
        skips: List[jnp.ndarray] = []
        x = faces
        for si, stage in enumerate(FACE_ENCODER_SPEC):
            for li, (f, k, s, p, res) in enumerate(stage):
                x = ConvBNRelu(f, k, s, p, residual=res,
                               name=f"face_enc_{si}_{li}")(x, train=train)
            skips.append(x)

        # Decoder: each stage upsamples then concatenates the matching skip
        # along channels (reference wav2lip.py:104-114).
        x = a
        for si, stage in enumerate(DECODER_SPEC):
            tspec, *convs = stage
            li = 0
            if tspec is not None:
                f, k, s, p, op = tspec
                x = ConvTransposeBNRelu(
                    f, k, s, p, op, name=f"face_dec_{si}_0"
                )(x, train=train)
                li = 1
            for cs in convs:
                f, k, s, p, res = cs
                x = ConvBNRelu(f, k, s, p, residual=res,
                               name=f"face_dec_{si}_{li}")(x, train=train)
                li += 1
            skip = skips.pop()
            if x.shape[1:3] != skip.shape[1:3]:
                raise ValueError(
                    f"decoder/skip mismatch at stage {si}: {x.shape} vs {skip.shape}"
                )
            x = jnp.concatenate([x, skip], axis=-1)

        # Output block: ConvBNRelu(80→32) → 1x1 conv → sigmoid
        # (reference wav2lip.py:83-85).
        x = ConvBNRelu(32, 3, 1, 1, name="output_0")(x, train=train)
        x = nn.Conv(3, kernel_size=(1, 1), padding="VALID",
                    kernel_init=kaiming_uniform, name="output_1")(x)
        x = nn.sigmoid(x)

        if folded:
            x = unfold_time(x, B)
        return x
