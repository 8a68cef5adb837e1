"""S3FD single-shot face detector backbone.

Parity with reference face_detection/detection/sfd/net_s3fd.py:22-129
(22,459,110 params): VGG16-style trunk (fc6/fc7 as convs), L2Norm-scaled
detection branches on conv3_3/4_3/5_3, and extra branches at fc7, conv6_2,
conv7_2 — six detection heads at strides 4, 8, 16, 32, 64, 128, each emitting
a (cls, loc) pair. The stride-4 head applies max-out background scoring
(net_s3fd.py:124-127).

Input (NHWC): (B, H, W, 3) float32, RGB, mean-subtracted (the detection
pipeline handles BGR→RGB and mean subtraction). Output: list of six
(cls (B,h,w,2), loc (B,h,w,4)) tuples, coarsest last.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wav2lip_tpu.models.blocks import kaiming_uniform


def _conv(f, k, s=1, p=None, name=None):
    if p is None:
        p = k // 2
    return nn.Conv(f, kernel_size=(k, k), strides=(s, s),
                   padding=[(p, p), (p, p)], kernel_init=kaiming_uniform,
                   name=name)


def _maxpool(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with a learned per-channel scale
    (reference net_s3fd.py:6-19)."""

    scale: float

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda key, shape: jnp.full(shape, self.scale, jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True)) + 1e-10
        return x / norm * w


class S3FD(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        h = nn.relu(_conv(64, 3, name="conv1_1")(x))
        h = nn.relu(_conv(64, 3, name="conv1_2")(h))
        h = _maxpool(h)

        h = nn.relu(_conv(128, 3, name="conv2_1")(h))
        h = nn.relu(_conv(128, 3, name="conv2_2")(h))
        h = _maxpool(h)

        h = nn.relu(_conv(256, 3, name="conv3_1")(h))
        h = nn.relu(_conv(256, 3, name="conv3_2")(h))
        h = nn.relu(_conv(256, 3, name="conv3_3")(h))
        f3_3 = h
        h = _maxpool(h)

        h = nn.relu(_conv(512, 3, name="conv4_1")(h))
        h = nn.relu(_conv(512, 3, name="conv4_2")(h))
        h = nn.relu(_conv(512, 3, name="conv4_3")(h))
        f4_3 = h
        h = _maxpool(h)

        h = nn.relu(_conv(512, 3, name="conv5_1")(h))
        h = nn.relu(_conv(512, 3, name="conv5_2")(h))
        h = nn.relu(_conv(512, 3, name="conv5_3")(h))
        f5_3 = h
        h = _maxpool(h)

        # fc6 keeps kernel 3 with padding 3, growing the map by 2 per side
        # exactly like the reference (net_s3fd.py:43).
        h = nn.relu(_conv(1024, 3, p=3, name="fc6")(h))
        h = nn.relu(_conv(1024, 1, p=0, name="fc7")(h))
        ffc7 = h
        h = nn.relu(_conv(256, 1, p=0, name="conv6_1")(h))
        h = nn.relu(_conv(512, 3, s=2, p=1, name="conv6_2")(h))
        f6_2 = h
        h = nn.relu(_conv(128, 1, p=0, name="conv7_1")(h))
        h = nn.relu(_conv(256, 3, s=2, p=1, name="conv7_2")(h))
        f7_2 = h

        f3_3 = L2Norm(10.0, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(8.0, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(5.0, name="conv5_3_norm")(f5_3)

        cls1 = _conv(4, 3, name="conv3_3_norm_mbox_conf")(f3_3)
        reg1 = _conv(4, 3, name="conv3_3_norm_mbox_loc")(f3_3)
        cls2 = _conv(2, 3, name="conv4_3_norm_mbox_conf")(f4_3)
        reg2 = _conv(4, 3, name="conv4_3_norm_mbox_loc")(f4_3)
        cls3 = _conv(2, 3, name="conv5_3_norm_mbox_conf")(f5_3)
        reg3 = _conv(4, 3, name="conv5_3_norm_mbox_loc")(f5_3)
        cls4 = _conv(2, 3, name="fc7_mbox_conf")(ffc7)
        reg4 = _conv(4, 3, name="fc7_mbox_loc")(ffc7)
        cls5 = _conv(2, 3, name="conv6_2_mbox_conf")(f6_2)
        reg5 = _conv(4, 3, name="conv6_2_mbox_loc")(f6_2)
        cls6 = _conv(2, 3, name="conv7_2_mbox_conf")(f7_2)
        reg6 = _conv(4, 3, name="conv7_2_mbox_loc")(f7_2)

        # Max-out background label on the finest head (net_s3fd.py:124-127):
        # the 4-channel conf becomes [max(bg0, bg1, bg2), face].
        bmax = jnp.max(cls1[..., :3], axis=-1, keepdims=True)
        cls1 = jnp.concatenate([bmax, cls1[..., 3:4]], axis=-1)

        return [(cls1, reg1), (cls2, reg2), (cls3, reg3),
                (cls4, reg4), (cls5, reg5), (cls6, reg6)]
