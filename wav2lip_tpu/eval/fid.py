"""FID (Fréchet Inception Distance) scoring.

The reference evaluates FID with the external ``pytorch-fid`` package
(reference evaluation/README.md:52-53); nothing ships in-repo. Here the whole
stack is self-contained and TPU-native:

* :class:`InceptionV3FID` — the FID-standard InceptionV3 feature extractor
  (the 2015 TF-slim graph as replicated by pytorch-fid, pool3 → 2048-d
  features) in Flax/NHWC. Weights import from pytorch-fid's
  ``pt_inception-2015-12-05-6726825d.pth`` via :func:`import_inception`
  (no weights ship with this repo — supply the file, or inject any other
  feature extractor into :class:`FIDScorer`).
* :func:`compute_statistics` / :func:`frechet_distance` — the FID math:
  ``||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))`` with scipy's matrix
  square root on the host (a 2048x2048 sqrtm is host-cheap; the expensive
  part — feature extraction — runs batched on device).
* :class:`FIDScorer` — frames/dirs → score, with sharded host↔device
  transfers (utils.transfer).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wav2lip_tpu.utils.cache import enable_compile_cache
from wav2lip_tpu.utils.transfer import put_sharded

# ---------------------------------------------------------------------------
# InceptionV3 (FID variant) in Flax
# ---------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    """Conv(bias=False) + BatchNorm(eps=1e-3) + ReLU — the InceptionV3
    building block."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3_no_pad_count(x):
    """3x3 stride-1 average pool with pad 1 and count_include_pad=False —
    the pytorch-fid deviation from torchvision (FIDInceptionA/C/E)."""
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), pad)
    return s / c


def _max_pool(x, window, strides):
    return nn.max_pool(x, (window, window), strides=(strides, strides),
                       padding="VALID")


_P1 = ((1, 1), (1, 1))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_P1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid: E_1 (Mixed_7b) pools with count_include_pad=False avg,
    # E_2 (Mixed_7c) pools with MAX (FIDInceptionE_2)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_P1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_3x3_no_pad_count(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Feature trunk of the FID InceptionV3 (pytorch-fid inception.py's
    InceptionV3 up to the pool3 output; the 1008-way fc head is dropped).

    Input: (B, 299, 299, 3) RGB in [0, 1] (resize upstream). Output:
    (B, 2048) pool3 features.
    """

    @nn.compact
    def __call__(self, x):
        x = x * 2.0 - 1.0  # pytorch-fid normalize_input
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_P1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool → (B, 2048)


def import_inception(sd) -> Dict:
    """pytorch-fid ``pt_inception-2015-12-05`` state dict → Flax variables.

    Key shapes: ``<block>.conv.weight`` OIHW → HWIO kernels;
    ``<block>.bn.{weight,bias,running_mean,running_var}`` → BN
    scale/bias/batch_stats. The fc head is ignored.
    """
    params: Dict = {}
    stats: Dict = {}

    def set_path(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, w in sd.items():
        if key.startswith("fc."):
            continue
        parts = key.split(".")
        *mods, leaf = parts
        w = np.asarray(w, np.float32)
        if mods and mods[-1] == "conv" and leaf == "weight":
            set_path(params, (*mods, "kernel"),
                     np.transpose(w, (2, 3, 1, 0)))
        elif mods and mods[-1] == "bn":
            if leaf == "weight":
                set_path(params, (*mods, "scale"), w)
            elif leaf == "bias":
                set_path(params, (*mods, "bias"), w)
            elif leaf == "running_mean":
                set_path(stats, (*mods, "mean"), w)
            elif leaf == "running_var":
                set_path(stats, (*mods, "var"), w)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# FID math
# ---------------------------------------------------------------------------


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features → (mu (D,), sigma (D, D))."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


class RunningStatistics:
    """Streaming (mu, sigma) over feature batches — mathematically identical
    to ``compute_statistics`` on the concatenation (same N-1 normalization as
    np.cov) without materializing all features: accumulates the sum and the
    sum of outer products per batch, O(D²) memory regardless of corpus size."""

    def __init__(self):
        self.n = 0
        self._s1 = None  # sum of features, (D,)
        self._s2 = None  # sum of outer products, (D, D)

    def update(self, features: np.ndarray) -> None:
        f = np.asarray(features, np.float64)
        if f.size == 0:
            return
        s1 = f.sum(axis=0)
        s2 = f.T @ f
        if self._s1 is None:
            self._s1, self._s2 = s1, s2
        else:
            self._s1 += s1
            self._s2 += s2
        self.n += len(f)

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError(f"need >=2 feature rows for FID, got {self.n}")
        mu = self._s1 / self.n
        sigma = (self._s2 - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) — the standard FID
    formula (as computed by pytorch-fid's calculate_frechet_distance)."""
    from scipy import linalg

    def _sqrtm(a):
        # scipy >=1.16 returns just the matrix; older returns (X, errest)
        res = linalg.sqrtm(a)
        return res[0] if isinstance(res, tuple) else res

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
        - 2.0 * np.trace(covmean)
    )


# ---------------------------------------------------------------------------
# Scorer
# ---------------------------------------------------------------------------


class FIDScorer:
    """FID between two frame sets.

    ``variables`` are :class:`InceptionV3FID` weights (import_inception), or
    pass ``feature_fn`` to plug any (B, H, W, 3)-RGB-[0,1] → (B, D) extractor
    (e.g. for weight-free regression testing).
    """

    def __init__(self, variables=None,
                 feature_fn: Optional[Callable] = None,
                 batch_size: int = 32, input_size: int = 299,
                 transfer_streams: int = 4):
        enable_compile_cache()
        self.batch_size = batch_size
        self.input_size = input_size
        self.streams = max(1, transfer_streams)
        if feature_fn is not None:
            self._feature_fn = feature_fn
            self._dev_vars = None
        else:
            if variables is None:
                raise ValueError(
                    "FIDScorer needs InceptionV3FID variables or a feature_fn"
                )
            from wav2lip_tpu.utils.transfer import put_tree

            model = InceptionV3FID()
            # weights up once, passed as a jit argument (closure constants
            # get re-fetched at lowering and baked into cached executables)
            self._dev_vars = put_tree(variables)
            self._feature_fn = lambda v, x: model.apply(v, x)

        def embed(variables, parts):
            x = (parts[0] if len(parts) == 1
                 else jnp.concatenate(parts, axis=0))
            x = x.astype(jnp.float32) / 255.0  # uint8 BGR frames
            x = x[..., ::-1]                   # BGR → RGB
            x = jax.image.resize(
                x, (x.shape[0], self.input_size, self.input_size, 3),
                method="bilinear",
            )
            if self._dev_vars is None:  # caller-supplied feature_fn
                return self._feature_fn(x)
            return self._feature_fn(variables, x)

        self._jit_embed = jax.jit(embed)

    def features(self, frames_bgr: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 BGR frames (any equal size) → (N, D) features."""
        frames = np.asarray(frames_bgr, np.uint8)
        n = len(frames)
        out: List[np.ndarray] = []
        for i in range(0, n, self.batch_size):
            chunk = frames[i : i + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)]
                )
            parts = tuple(put_sharded(chunk, self.streams))
            feats = np.asarray(self._jit_embed(self._dev_vars, parts))
            out.append(feats[: min(self.batch_size, n - i)])
        return np.concatenate(out)

    def score_frames(self, frames_a, frames_b) -> float:
        mu1, s1 = compute_statistics(self.features(frames_a))
        mu2, s2 = compute_statistics(self.features(frames_b))
        return frechet_distance(mu1, s1, mu2, s2)

    def score_video_sets(self, videos_a: List[str], videos_b: List[str],
                         max_frames_per_video: Optional[int] = None) -> float:
        """FID between all frames of two video sets (the reference protocol
        runs pytorch-fid over frame dumps of generated vs. real videos).

        Streams: decodes one video at a time and folds its features into
        running (mu, sigma) accumulators, so memory is O(one video + D²)
        instead of O(corpus) — a realistic benchmark set is thousands of
        videos."""
        from wav2lip_tpu.io.video import VideoFrameReader

        import cv2

        size = (self.input_size, self.input_size)

        def stats_of(paths) -> Tuple[np.ndarray, np.ndarray]:
            stats = RunningStatistics()
            for p in paths:
                frames = []
                with VideoFrameReader(p) as r:
                    for i, f in enumerate(r):
                        if (max_frames_per_video is not None
                                and i >= max_frames_per_video):
                            break
                        # squash-resize on host so mixed-size videos batch
                        # together (pytorch-fid resizes each image to 299)
                        frames.append(cv2.resize(f, size))
                if frames:
                    stats.update(self.features(frames))
            if stats.n == 0:
                raise ValueError("no frames decoded for FID")
            return stats.finalize()

        mu1, s1 = stats_of(videos_a)
        mu2, s2 = stats_of(videos_b)
        return frechet_distance(mu1, s1, mu2, s2)
