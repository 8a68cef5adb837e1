"""Face track + crop front end for protocol LSE scoring of full-scene videos.

The reference scores real-world (ReSyncED) videos by first running
syncnet_python's ``run_pipeline.py`` — S3FD detection per frame, IOU-greedy
face tracking with gap interpolation, median-filter box smoothing, and a
0.40-scale square crop to 224x224 — and only then scoring the crops
(``evaluation/scores_LSE/calculate_scores_real_videos.sh:6-7`` chains
``run_pipeline.py`` into ``calculate_scores_real_videos.py``). Feeding a raw
full-scene frame to the scorer squashes the face into a corner of the 224x224
input and the LSE numbers become meaningless.

This module rebuilds that front end TPU-natively on the in-repo jitted S3FD
(detect.FaceDetectionPipeline — batched, no per-frame host loop), with the
external protocol's documented geometry re-derived rather than ported:

* detection at ``facedet_scale`` (0.25) of the source resolution — the
  protocol itself detects on downscaled frames;
* greedy IOU tracking: a detection joins the current track when its IOU with
  the track's last box exceeds ``iou_threshold`` and the frame gap is at most
  ``num_failed_det``; tracks shorter than ``min_track`` frames or with mean
  box size under ``min_face_size`` px are discarded; missed frames are filled
  by per-coordinate linear interpolation;
* per-frame square crop: half-size ``s = max(h, w)/2`` and center, each
  median-filtered (kernel ``smooth_kernel``), padded with constant 110
  pixels, cropped to ``[cy-s : cy+s(1+2*cs)] x [cx-s(1+cs) : cx+s(1+cs)]``
  with ``cs = crop_scale = 0.40``, resized to 224x224.

The audio is sliced to the track's frame span so the scorer sees the same
AV alignment the protocol's ffmpeg crop step produces.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np
from scipy import signal as scipy_signal


@dataclass(frozen=True)
class TrackConfig:
    """syncnet_python run_pipeline defaults."""

    facedet_scale: float = 0.25
    iou_threshold: float = 0.5
    min_track: int = 50
    num_failed_det: int = 25
    min_face_size: float = 100.0
    crop_scale: float = 0.40
    smooth_kernel: int = 13
    pad_value: int = 110


@dataclass
class FaceTrack:
    """A contiguous face track: ``frames[i]`` is the source frame index of
    interpolated box ``boxes[i]`` (x1, y1, x2, y2 float, source scale)."""

    frames: np.ndarray  # (T,) int
    boxes: np.ndarray   # (T, 4) float


def _iou(a: Sequence[float], b: Sequence[float]) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    denom = area_a + area_b - inter
    return inter / denom if denom > 0 else 0.0


def track_faces(
    detections: List[List[Tuple[float, float, float, float]]],
    cfg: TrackConfig = TrackConfig(),
) -> List[FaceTrack]:
    """Greedy IOU tracking over per-frame detection lists.

    Repeatedly seeds a track with the earliest unconsumed detection and
    extends it with the first detection within ``num_failed_det`` frames
    whose IOU with the track's tail exceeds ``iou_threshold``; gaps are
    linearly interpolated per coordinate. Tracks failing the ``min_track``
    length or ``min_face_size`` mean-size gates are dropped.
    """
    remaining = [list(frame_dets) for frame_dets in detections]
    tracks: List[FaceTrack] = []
    while True:
        track: List[Tuple[int, Tuple[float, float, float, float]]] = []
        for fidx, faces in enumerate(remaining):
            for face in faces:
                if not track:
                    track.append((fidx, face))
                    faces.remove(face)
                    break
                gap = fidx - track[-1][0]
                if gap == 0:
                    continue
                if gap > cfg.num_failed_det:
                    break
                if _iou(face, track[-1][1]) > cfg.iou_threshold:
                    track.append((fidx, face))
                    faces.remove(face)
                    break
        if not track:
            break
        if len(track) >= cfg.min_track:
            fr = np.asarray([t[0] for t in track])
            bx = np.asarray([t[1] for t in track], np.float64)
            full = np.arange(fr[0], fr[-1] + 1)
            interp = np.stack(
                [np.interp(full, fr, bx[:, c]) for c in range(4)], axis=1
            )
            mean_w = float(np.mean(interp[:, 2] - interp[:, 0]))
            mean_h = float(np.mean(interp[:, 3] - interp[:, 1]))
            if max(mean_w, mean_h) > cfg.min_face_size:
                tracks.append(FaceTrack(frames=full, boxes=interp))
    return tracks


def crop_track(
    frames_bgr: Sequence[np.ndarray],
    track: FaceTrack,
    cfg: TrackConfig = TrackConfig(),
    out_size: int = 224,
) -> List[np.ndarray]:
    """The protocol's smoothed square crops for one track, resized to
    ``out_size`` (224). Centers/half-sizes are median-filtered; every crop
    reads from a constant-padded frame so boxes near edges stay square."""
    b = track.boxes
    half = np.maximum(b[:, 3] - b[:, 1], b[:, 2] - b[:, 0]) / 2.0
    cx = (b[:, 0] + b[:, 2]) / 2.0
    cy = (b[:, 1] + b[:, 3]) / 2.0
    k = min(cfg.smooth_kernel, len(half) if len(half) % 2 else len(half) - 1)
    if k >= 3:
        half = scipy_signal.medfilt(half, kernel_size=k)
        cx = scipy_signal.medfilt(cx, kernel_size=k)
        cy = scipy_signal.medfilt(cy, kernel_size=k)
    cs = cfg.crop_scale
    crops: List[np.ndarray] = []
    for i, fidx in enumerate(track.frames):
        frame = frames_bgr[int(fidx)]
        bs = half[i]
        bsi = int(bs * (1 + 2 * cs))
        padded = np.pad(
            frame, ((bsi, bsi), (bsi, bsi), (0, 0)),
            mode="constant", constant_values=cfg.pad_value,
        )
        my, mx = cy[i] + bsi, cx[i] + bsi
        face = padded[
            int(my - bs) : int(my + bs * (1 + 2 * cs)),
            int(mx - bs * (1 + cs)) : int(mx + bs * (1 + cs)),
        ]
        crops.append(cv2.resize(face, (out_size, out_size)))
    return crops


def detect_all_faces(
    frames_bgr: Sequence[np.ndarray],
    detector,
    cfg: TrackConfig = TrackConfig(),
    min_score: float = 0.5,
) -> List[List[Tuple[float, float, float, float]]]:
    """Per-frame detection lists at source coordinates, detecting on
    ``facedet_scale``-scaled frames like the protocol (its S3FD runs at 1/4
    resolution). ``detector`` is a detect.FaceDetectionPipeline."""
    s = cfg.facedet_scale
    if abs(s - 1.0) > 1e-6:
        h, w = frames_bgr[0].shape[:2]
        small = [
            cv2.resize(f, (max(1, int(w * s)), max(1, int(h * s))))
            for f in frames_bgr
        ]
    else:
        small = list(frames_bgr)
    dets = detector.detect_batch(np.stack(small))
    out: List[List[Tuple[float, float, float, float]]] = []
    inv = 1.0 / s
    for frame_dets in dets:
        out.append([
            (d[0] * inv, d[1] * inv, d[2] * inv, d[3] * inv)
            for d in frame_dets if d[4] >= min_score
        ])
    return out


def track_and_crop(
    frames_bgr: Sequence[np.ndarray],
    detector,
    cfg: TrackConfig = TrackConfig(),
    out_size: int = 224,
) -> Tuple[List[np.ndarray], FaceTrack]:
    """Full front end: detect → track → pick the longest track → crop.

    Returns (224x224 crops, the chosen track). Raises ValueError when no
    track passes the protocol's gates — scoring a full-scene video without a
    stable face is undefined under this protocol.
    """
    detections = detect_all_faces(frames_bgr, detector, cfg)
    tracks = track_faces(detections, cfg)
    if not tracks:
        raise ValueError(
            "no face track found (protocol gates: >= "
            f"{cfg.min_track} frames, mean size > {cfg.min_face_size} px)"
        )
    best = max(tracks, key=lambda t: len(t.frames))
    return crop_track(frames_bgr, best, cfg, out_size), best


def slice_audio_to_track(
    audio: np.ndarray, sr: float, fps: float, track: FaceTrack
) -> np.ndarray:
    """Audio samples spanning the track's frame range — the equivalent of
    the protocol's ffmpeg ``-ss/-to`` crop so AV alignment is preserved."""
    a = int(round(track.frames[0] / fps * sr))
    b = int(round((track.frames[-1] + 1) / fps * sr))
    return audio[a:b]
