"""FAN landmark networks (stacked hourglass, 68-pt heatmaps) + ResNetDepth.

The reference vendors these from the upstream ``face_alignment`` repo
(reference face_detection/models.py:13-261) and imports them at
face_detection/api.py:13 but never instantiates them in any Wav2Lip code
path — they exist so landmark support is reachable. This module is their
NHWC Flax equivalent, completing SURVEY §2 component #10:

* :class:`FANConvBlock` — pre-activation BN→ReLU→conv dense block whose
  output is the channel-concat of three progressively narrower branches
  (models.py:13-55), with the BN→ReLU→1x1 downsample on channel change.
* :class:`HourGlass` — the recursive depth-``depth`` hourglass
  (models.py:98-142): parallel identity branch and avg-pool→recurse→
  nearest-2x-upsample branch, summed.
* :class:`FAN` — 7x7/s2 stem + 3 ConvBlocks, then ``num_modules`` stacked
  hourglass modules each emitting a 68-channel heatmap head, with the
  intermediate-supervision feedback adds between modules (models.py:145-201).
* :class:`ResNetDepth` — Bottleneck ResNet (layers [3, 8, 36, 3]) over
  RGB+68-heatmap input predicting 68 z-coordinates (models.py:204-261).
* :func:`heatmaps_to_landmarks` — the reference's ``get_preds_fromhm``
  (utils.py:132-170) as one vectorized jittable graph: argmax peak +
  quarter-pixel sign-of-gradient refinement, with no per-point Python loop.

TPU notes: everything is NHWC; the hourglass recursion is unrolled at trace
time (depth is static) so XLA sees a flat conv graph; nearest 2x upsampling
is a reshape-broadcast (no gather); heatmap decode is argmax + two
take_along_axis gathers over the batch, replacing the reference's
B x 68 Python loop.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from wav2lip_tpu.models.blocks import kaiming_uniform, torch_uniform_init


def _conv3x3(features: int, name: str) -> nn.Conv:
    """torch conv3x3 (models.py:7-10): 3x3, pad 1, no bias."""
    return nn.Conv(features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                   kernel_init=kaiming_uniform, name=name)


def _bn(name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                        name=name)


class FANConvBlock(nn.Module):
    """Pre-activation dense block (reference models.py:13-55).

    Three BN→ReLU→conv3x3 stages at out/2, out/4, out/4 channels; the block
    output is their channel concat, plus a BN→ReLU→1x1-conv residual when the
    channel count changes (identity otherwise).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        out1 = _conv3x3(self.features // 2, "conv1")(
            nn.relu(_bn("bn1")(x)))
        out2 = _conv3x3(self.features // 4, "conv2")(
            nn.relu(_bn("bn2")(out1)))
        out3 = _conv3x3(self.features // 4, "conv3")(
            nn.relu(_bn("bn3")(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        residual = x
        if x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), use_bias=False,
                kernel_init=kaiming_uniform, name="downsample_conv",
            )(nn.relu(_bn("downsample_bn")(x)))
        return out + residual


def _upsample_nearest_2x(x):
    """F.interpolate(scale_factor=2, mode='nearest') as reshape-broadcast."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class HourGlass(nn.Module):
    """Recursive hourglass (reference models.py:98-142), unrolled at trace
    time. Level ``L``: up = b1_L(x); low = b3_L(recurse(b2_L(avgpool(x))))
    with the extra ``b2_plus_1`` bottleneck at level 1; out = up +
    nearest2x(low). Module names match the torch ``add_module`` keys so the
    checkpoint importer maps 1:1."""

    depth: int = 4
    features: int = 256

    @nn.compact
    def __call__(self, x):
        def level(lvl, inp):
            up1 = FANConvBlock(self.features, name=f"b1_{lvl}")(inp)
            low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = FANConvBlock(self.features, name=f"b2_{lvl}")(low1)
            if lvl > 1:
                low2 = level(lvl - 1, low1)
            else:
                low2 = FANConvBlock(self.features, name=f"b2_plus_{lvl}")(low1)
            low3 = FANConvBlock(self.features, name=f"b3_{lvl}")(low2)
            return up1 + _upsample_nearest_2x(low3)

        return level(self.depth, x)


class FAN(nn.Module):
    """Face Alignment Network (reference models.py:145-201).

    Input NHWC (B, 256, 256, 3) → list of ``num_modules`` heatmap tensors,
    each (B, 64, 64, 68), one per stacked hourglass (intermediate
    supervision). The released 2DFAN-4 weights use ``num_modules=4``.
    """

    num_modules: int = 1

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        # stem: 7x7/s2 conv (with bias) → BN → ReLU, then CB(128) → avgpool2
        # → CB(128) → CB(256)  (models.py:174-178)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    kernel_init=kaiming_uniform,
                    bias_init=torch_uniform_init(x.shape[-1] * 49),
                    name="conv1")(x)
        x = nn.relu(_bn("bn1")(x))
        x = nn.avg_pool(FANConvBlock(128, name="conv2")(x),
                        (2, 2), strides=(2, 2))
        x = FANConvBlock(128, name="conv3")(x)
        x = FANConvBlock(256, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlass(depth=4, features=256, name=f"m{i}")(previous)
            ll = FANConvBlock(256, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), kernel_init=kaiming_uniform,
                         bias_init=torch_uniform_init(256),
                         name=f"conv_last{i}")(ll)
            ll = nn.relu(_bn(f"bn_end{i}")(ll))
            tmp_out = nn.Conv(68, (1, 1), kernel_init=kaiming_uniform,
                              bias_init=torch_uniform_init(256),
                              name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = nn.Conv(256, (1, 1), kernel_init=kaiming_uniform,
                             bias_init=torch_uniform_init(256),
                             name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(256, (1, 1), kernel_init=kaiming_uniform,
                                   bias_init=torch_uniform_init(68),
                                   name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_
        return outputs


class _Bottleneck(nn.Module):
    """torchvision-style Bottleneck, expansion 4 (models.py:58-95)."""

    planes: int
    strides: int = 1
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_uniform, name="conv1")(x)
        out = nn.relu(_bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.strides,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=kaiming_uniform, name="conv2")(out)
        out = nn.relu(_bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      kernel_init=kaiming_uniform, name="conv3")(out)
        out = _bn("bn3")(out)
        residual = x
        if self.use_downsample:
            residual = _bn("downsample_bn")(nn.Conv(
                self.planes * 4, (1, 1), strides=(self.strides,) * 2,
                use_bias=False, kernel_init=kaiming_uniform,
                name="downsample_conv")(x))
        return nn.relu(out + residual)


class ResNetDepth(nn.Module):
    """Depth-prediction ResNet (reference models.py:204-261): Bottleneck
    stack [3, 8, 36, 3] over a 71-channel input (RGB + 68 landmark
    heatmaps), global 7x7 average pool, linear head → 68 z values."""

    layers: Tuple[int, ...] = (3, 8, 36, 3)
    num_classes: int = 68

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=kaiming_uniform,
                    name="conv1")(x)
        x = nn.relu(_bn("bn1")(x))
        # MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or inplanes != planes * 4)
                x = _Bottleneck(planes, strides=s, use_downsample=down,
                                name=f"layer{li + 1}_{bi}")(x)
                inplanes = planes * 4
        x = nn.avg_pool(x, (7, 7), strides=(7, 7))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes,
                        kernel_init=kaiming_uniform,
                        bias_init=torch_uniform_init(x.shape[-1]),
                        name="fc")(x)


def heatmaps_to_landmarks(hm: jnp.ndarray) -> jnp.ndarray:
    """Vectorized ``get_preds_fromhm`` peak decode (utils.py:132-162).

    ``hm``: NHWC heatmaps (B, H, W, N) → (B, N, 2) float (x, y) coords in
    heatmap pixels. Peak = per-map argmax; when the peak is strictly
    interior, refine by 0.25 * sign of the central-difference gradient
    (the reference hardcodes the interior test to ``0 < p < 63`` for its
    only heatmap size 64; shape-derived bounds are identical there). The
    reference's 1-indexed arithmetic then ``-0.5`` reduces to
    ``0-indexed + 0.5 (+ refinement)``, which is what this returns.
    """
    b, h, w, n = hm.shape
    flat = hm.reshape(b, h * w, n)
    idx = jnp.argmax(flat, axis=1)  # (B, N)
    px = idx % w
    py = idx // w

    def peek(dy, dx):
        # clipped flat index; out-of-range reads are masked out below
        yy = jnp.clip(py + dy, 0, h - 1)
        xx = jnp.clip(px + dx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[:, None, :],
                                   axis=1)[:, 0, :]

    dx = jnp.sign(peek(0, 1) - peek(0, -1)) * 0.25
    dy = jnp.sign(peek(1, 0) - peek(-1, 0)) * 0.25
    interior = ((px > 0) & (px < w - 1) & (py > 0) & (py < h - 1))
    x = px + 0.5 + jnp.where(interior, dx, 0.0)
    y = py + 0.5 + jnp.where(interior, dy, 0.0)
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)
