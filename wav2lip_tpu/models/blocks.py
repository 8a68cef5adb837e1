"""Shared conv building blocks for all model families.

The reference builds every net from three blocks (models/conv.py): Conv+BN+ReLU
with an optional pre-activation residual add, Conv+LeakyReLU(0.01) without
normalization, and ConvTranspose+BN+ReLU. These are their NHWC Flax
equivalents; all convs use explicit symmetric padding so shapes match the
reference's integer-padding semantics exactly.

TPU notes: NHWC is the native conv layout; BatchNorm folds into the conv at
inference via XLA fusion; the transpose conv is implemented as an explicit
interior-zero pad + plain stride-1 conv, which is the exact gradient-of-conv
semantics of ``torch.nn.ConvTranspose2d`` (including ``output_padding``),
avoiding the classic silent off-by-one of library transpose-conv wrappers —
and keeping autodiff off XLA:CPU's slow dilated-conv gradient path.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).
kaiming_uniform = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_uniform_init(fan_in: int):
    """U(±1/sqrt(fan_in)) with an explicit fan — torch's default for conv
    BIASES (fan of the weight, which the bias shape can't convey to a flax
    initializer) and for ConvTranspose2d weights (whose torch fan_in is
    out_channels·kh·kw — weight.size(1)·receptive_field on the (in, out, kh,
    kw) layout — not the in-channel fan variance_scaling would derive from
    HWIO)."""
    bound = 1.0 / float(np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvBNRelu(nn.Module):
    """Conv → BatchNorm → (optional residual add) → ReLU.

    Mirrors reference models/conv.py:5-19: the residual add happens *before*
    the activation (``out += x`` then ReLU), and requires matching shapes.
    """

    features: int
    kernel_size: IntPair = 3
    strides: IntPair = 1
    padding: IntPair = 1
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ph, pw = _pair(self.padding)
        kh, kw = _pair(self.kernel_size)
        out = nn.Conv(
            self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=[(ph, ph), (pw, pw)],
            kernel_init=kaiming_uniform,
            bias_init=torch_uniform_init(x.shape[-1] * kh * kw),
            name="conv",
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(out)
        if self.residual:
            out = out + x
        return nn.relu(out)


class ConvLeaky(nn.Module):
    """Conv → LeakyReLU(0.01), no normalization (reference models/conv.py:21-31,
    used only by the visual-quality discriminator; its ``residual`` kwarg is
    accepted but ignored in the reference, so it does not exist here)."""

    features: int
    kernel_size: IntPair = 3
    strides: IntPair = 1
    padding: IntPair = 1

    @nn.compact
    def __call__(self, x):
        ph, pw = _pair(self.padding)
        kh, kw = _pair(self.kernel_size)
        out = nn.Conv(
            self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=[(ph, ph), (pw, pw)],
            kernel_init=kaiming_uniform,
            bias_init=torch_uniform_init(x.shape[-1] * kh * kw),
            name="conv",
        )(x)
        return nn.leaky_relu(out, negative_slope=0.01)


class TorchConvTranspose(nn.Module):
    """Exact ``torch.nn.ConvTranspose2d`` semantics in NHWC.

    Implemented as a fractionally-strided convolution:
      ``out = conv(dilate(x, stride), kernel, padding=(k-1-p, k-1-p+op))``
    where the kernel is stored pre-flipped in HWIO layout, i.e.
    ``kernel[h, w, i, o] = torch_weight[i, o, K-1-h, K-1-w]``. Output size is
    ``(in-1)*stride - 2*p + k + op``, matching torch exactly.
    """

    features: int
    kernel_size: IntPair = 3
    strides: IntPair = 1
    padding: IntPair = 0
    output_padding: IntPair = 0

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        in_features = x.shape[-1]
        # torch ConvTranspose2d fan_in (weights AND bias) = out_ch * kh * kw
        fan = self.features * kh * kw
        kernel = self.param(
            "kernel", torch_uniform_init(fan),
            (kh, kw, in_features, self.features)
        )
        bias = self.param("bias", torch_uniform_init(fan), (self.features,))
        # The fractional stride is materialized as an explicit interior-
        # zero pad (lax.pad interior=stride-1) followed by a PLAIN stride-1
        # conv, rather than passing lhs_dilation to the conv. Numerically
        # bit-identical (the inserted zeros contribute nothing), but it keeps
        # every conv in both the forward AND the autodiff-generated backward
        # pass on the fast non-dilated path: XLA:CPU's kernel-gradient of an
        # lhs-dilated conv falls off the eigen fast path and runs ~180x
        # slower (measured 62.8s vs 0.35s on a 24x24x256 layer), which made
        # CPU-hosted training steps and the multi-chip dryrun pathologically
        # slow. On TPU the pad fuses into the conv and the MXU work is the
        # same either way.
        pad_cfg = [
            (0, 0, 0),
            (kh - 1 - ph, kh - 1 - ph + oph, sh - 1),
            (kw - 1 - pw, kw - 1 - pw + opw, sw - 1),
            (0, 0, 0),
        ]
        xp = jax.lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
        out = jax.lax.conv_general_dilated(
            xp,
            kernel,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class ConvTransposeBNRelu(nn.Module):
    """ConvTranspose → BatchNorm → ReLU (reference models/conv.py:33-44)."""

    features: int
    kernel_size: IntPair = 3
    strides: IntPair = 1
    padding: IntPair = 0
    output_padding: IntPair = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = TorchConvTranspose(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            output_padding=self.output_padding,
            name="conv",
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(out)
        return nn.relu(out)


def fold_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) → (T*B, H, W, C), time-major blocks.

    The reference folds the 5-frame window into the batch axis before running
    2-D convs (models/wav2lip.py:92-94, concatenating per-timestep slices along
    batch); keeping T in the batch dimension is also the natural XLA layout —
    one big static-shape conv instead of a loop.
    """
    B, T = x.shape[0], x.shape[1]
    x = jnp.swapaxes(x, 0, 1)  # (T, B, H, W, C)
    return x.reshape((T * B,) + x.shape[2:])


def unfold_time(x: jnp.ndarray, batch: int) -> jnp.ndarray:
    """(T*B, H, W, C) → (B, T, H, W, C), inverse of :func:`fold_time`
    (reference: models/wav2lip.py:118-123 split+stack)."""
    T = x.shape[0] // batch
    x = x.reshape((T, batch) + x.shape[1:])
    return jnp.swapaxes(x, 0, 1)
