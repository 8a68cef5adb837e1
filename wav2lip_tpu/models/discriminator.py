"""Visual-quality GAN discriminator.

Parity with reference models/wav2lip.py:127-184 (14,113,793 params): an
unnormalized LeakyReLU conv tower over the lower half of each frame (time
folded into batch), ending in a 1x1 sigmoid realness head.

Input (NHWC): (B, T, 96, 96, 3) full frames in [0, 1] — the module takes the
lower half itself, like the reference's ``get_lower_half`` — or pre-folded
(N, 96, 96, 3). Output: (N, 1) realness probabilities where N = B*T.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from wav2lip_tpu.models.blocks import ConvLeaky, fold_time, kaiming_uniform

ENCODER_SPEC: Sequence[Sequence[Tuple]] = (
    ((32, 7, 1, 3),),
    ((64, 5, (1, 2), 2), (64, 5, 1, 2)),
    ((128, 5, 2, 2), (128, 5, 1, 2)),
    ((256, 5, 2, 2), (256, 5, 1, 2)),
    ((512, 3, 2, 1), (512, 3, 1, 1)),
    ((512, 3, 2, 1), (512, 3, 1, 1)),
    ((512, 3, 1, 0), (512, 1, 1, 0)),
)


class QualityDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, faces: jnp.ndarray) -> jnp.ndarray:
        if faces.ndim == 5:
            faces = fold_time(faces)
        # lower half only (reference wav2lip.py:155-156)
        x = faces[:, faces.shape[1] // 2 :, :, :]
        for si, stage in enumerate(ENCODER_SPEC):
            for li, (f, k, s, p) in enumerate(stage):
                x = ConvLeaky(f, k, s, p, name=f"face_enc_{si}_{li}")(x)
        x = nn.Conv(1, kernel_size=(1, 1), padding="VALID",
                    kernel_init=kaiming_uniform, name="binary_pred")(x)
        x = nn.sigmoid(x)
        return x.reshape((x.shape[0], -1))
