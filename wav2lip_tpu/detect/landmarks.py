"""68-point facial landmark pipeline around the FAN network.

The reference vendors the upstream ``face_alignment`` landmark stack
(face_detection/models.py + utils.py, per face_detection/README.md:1) but
never wires it into a code path — the nets are imported at
face_detection/api.py:13 and the geometry helpers live in utils.py. This
module completes that surface (SURVEY §2 component #10):

* :func:`transform_points` — the (inverse) crop affine of utils.py:56-89,
  vectorized over points instead of one 3x3 matmul per landmark.
* :func:`crop_face` — utils.py:92-129's center+scale crop (including its
  1-indexed overlap arithmetic, reproduced exactly) → model-input square.
* :func:`shuffle_lr` / :func:`flip_heatmaps` — the left/right symmetry
  relabeling of utils.py:212-254, used for flip-augmented inference.
* :class:`LandmarkPipeline` — batched crops → jitted FAN forward + in-graph
  heatmap decode (one device round trip per batch) → landmarks mapped back
  to original-frame coordinates. The box→(center, scale) convention
  (center lifted 12% of box height, scale = perimeter/2 / 195) follows the
  upstream face_alignment API the reference vendored its nets from.

TPU notes: the FAN forward and the argmax/quarter-offset decode compile as
ONE program, so the host receives 68 coordinate pairs per face instead of
68 full 64x64 heatmaps; crops batch to a static (B, 256, 256, 3) shape.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.models.fan import FAN, heatmaps_to_landmarks

# left/right point relabeling for a horizontally flipped face
# (utils.py:214-219): jaw, brows, nose base, eyes, mouth
FLIP_PAIRS = np.array([
    16, 15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0,
    26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 27, 28, 29, 30, 35,
    34, 33, 32, 31, 45, 44, 43, 42, 47, 46, 39, 38, 37, 36, 41,
    40, 54, 53, 52, 51, 50, 49, 48, 59, 58, 57, 56, 55, 64, 63,
    62, 61, 60, 67, 66, 65,
], dtype=np.int32)


def transform_points(points: np.ndarray, center: Sequence[float],
                     scale: float, resolution: float,
                     invert: bool = False) -> np.ndarray:
    """Crop-space ↔ image-space affine (reference utils.py:56-89).

    ``points``: (..., 2) float. Returns int32 like the reference's
    ``.int()`` (truncation toward zero). Forward maps image → crop
    coordinates; ``invert=True`` maps crop/heatmap space back to the image.

    Numerics: the inverse is the float64 CLOSED FORM of the affine, where
    the reference inverts the 3x3 matrix with ``torch.inverse`` in float32
    (utils.py:84-89) and then truncates — float32 roundoff at the truncation
    boundary can flip a coordinate by 1 px for (center, scale) values that
    land an exact multiple of ``resolution/h`` on an integer. Equality holds
    everywhere else (fuzz-tested over random centers/scales in
    tests/test_fan.py::test_transform_fuzz_vs_float32_inverse); parity
    claims for :func:`crop_face` are exact up to that same ±1 px corner
    case, not bit-guaranteed for all inputs.
    """
    pts = np.asarray(points, np.float64)
    h = 200.0 * float(scale)
    if invert:
        # closed-form inverse of diag(res/h) + translation
        out_x = pts[..., 0] * h / resolution + center[0] - h / 2.0
        out_y = pts[..., 1] * h / resolution + center[1] - h / 2.0
    else:
        out_x = pts[..., 0] * resolution / h + resolution * (
            -center[0] / h + 0.5)
        out_y = pts[..., 1] * resolution / h + resolution * (
            -center[1] / h + 0.5)
    return np.stack([out_x, out_y], axis=-1).astype(np.int32)


def crop_face(image: np.ndarray, center: Sequence[float], scale: float,
              resolution: int = 256) -> np.ndarray:
    """Center+scale face crop (reference utils.py:92-129): zero-pad where
    the crop window leaves the frame, bilinear-resize to ``resolution``.
    The overlap arithmetic reproduces the reference's 1-indexed slicing
    exactly; corner coordinates come from :func:`transform_points`, whose
    float64 inverse can differ from the reference's float32 matrix inverse
    by 1 px at exact-integer boundaries (see its docstring) — crops are
    parity-comparable up to that corner case."""
    ul = transform_points(np.array([1.0, 1.0]), center, scale,
                          resolution, invert=True)
    br = transform_points(np.array([float(resolution)] * 2), center, scale,
                          resolution, invert=True)
    ch = image.shape[2] if image.ndim > 2 else 1
    new = np.zeros((int(br[1] - ul[1]), int(br[0] - ul[0]), ch), np.uint8)
    ht, wd = image.shape[0], image.shape[1]
    new_x = (max(1, -ul[0] + 1), min(br[0], wd) - ul[0])
    new_y = (max(1, -ul[1] + 1), min(br[1], ht) - ul[1])
    old_x = (max(1, ul[0] + 1), min(br[0], wd))
    old_y = (max(1, ul[1] + 1), min(br[1], ht))
    new[new_y[0] - 1:new_y[1], new_x[0] - 1:new_x[1]] = np.atleast_3d(
        image)[old_y[0] - 1:old_y[1], old_x[0] - 1:old_x[1]]
    return cv2.resize(new, (resolution, resolution),
                      interpolation=cv2.INTER_LINEAR)


def shuffle_lr(heatmaps: np.ndarray, axis: int = -1) -> np.ndarray:
    """Relabel left/right landmark channels (utils.py:212-233)."""
    return np.take(heatmaps, FLIP_PAIRS, axis=axis)


def flip_heatmaps(hm: jnp.ndarray) -> jnp.ndarray:
    """Undo a horizontal input flip on NHWC heatmaps: mirror the W axis and
    swap the left/right channel labels (utils.py:236-254 ``is_label``)."""
    return jnp.flip(hm, axis=2)[..., jnp.asarray(FLIP_PAIRS)]


def box_to_center_scale(box: Sequence[float]) -> Tuple[np.ndarray, float]:
    """(x1, y1, x2, y2) → FAN crop (center, scale): center lifted by 12% of
    the box height, scale = (w + h) / 195 — the upstream face_alignment
    convention for the vendored nets (face_detection/README.md:1)."""
    x1, y1, x2, y2 = [float(v) for v in box]
    center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0 - (y2 - y1) * 0.12])
    return center, (x2 - x1 + y2 - y1) / 195.0


class LandmarkPipeline:
    """Batched 68-pt landmark inference: crops → one jitted FAN+decode
    program → image-space points."""

    def __init__(self, variables, num_modules: int = 4,
                 batch_size: int = 16, flip_input: bool = False,
                 compute_dtype=jnp.float32):
        self.variables = variables
        self.model = FAN(num_modules=num_modules)
        self.batch_size = int(batch_size)
        self.flip_input = bool(flip_input)
        self.compute_dtype = compute_dtype

        @functools.partial(jax.jit, static_argnames=("flip",))
        def _forward(variables, crops_u8, flip: bool):
            x = crops_u8.astype(self.compute_dtype) / 255.0
            hm = self.model.apply(variables, x)[-1]
            if flip:
                # upstream face_alignment SUMS the flipped heatmaps (no
                # /2): keep that convention so raw-heatmap magnitudes match
                # any consumer expecting it; the argmax+sign decode below
                # is scale-invariant either way
                hm = hm + flip_heatmaps(
                    self.model.apply(variables, jnp.flip(x, axis=2))[-1])
            return heatmaps_to_landmarks(hm.astype(jnp.float32))

        self._jit_forward = _forward

    def landmarks_from_crops(self, crops: np.ndarray) -> np.ndarray:
        """(B, 256, 256, 3) RGB uint8 crops → (B, 68, 2) float heatmap-space
        coords (64x64 grid)."""
        out = []
        for i in range(0, len(crops), self.batch_size):
            part = np.asarray(crops[i:i + self.batch_size], np.uint8)
            pad = self.batch_size - len(part)
            if pad:  # static batch shape → one compiled program
                part = np.concatenate(
                    [part, np.zeros((pad,) + part.shape[1:], np.uint8)])
            pts = np.asarray(
                self._jit_forward(self.variables, part, self.flip_input))
            out.append(pts[:len(pts) - pad] if pad else pts)
        return np.concatenate(out) if out else np.zeros((0, 68, 2),
                                                        np.float32)

    def landmarks_from_frames(
        self, frames: np.ndarray,
        boxes: Sequence[Optional[Sequence[float]]],
    ) -> list:
        """Full-frame RGB uint8 images + per-frame face boxes → per-frame
        (68, 2) int32 image-space landmarks (None where box is None)."""
        crops, geoms, slots = [], [], []
        for fi, box in enumerate(boxes):
            if box is None:
                continue
            center, scale = box_to_center_scale(box)
            crops.append(crop_face(frames[fi], center, scale))
            geoms.append((center, scale))
            slots.append(fi)
        results: list = [None] * len(boxes)
        if crops:
            pts = self.landmarks_from_crops(np.stack(crops))
            for sl, (center, scale), p in zip(slots, geoms, pts):
                # heatmap grid is 64x64 (utils.py:165-168 passes hm.size(2))
                results[sl] = transform_points(p, center, scale, 64.0,
                                               invert=True)
        return results
