"""Real-world (ReSyncED) evaluation helpers.

The reference's real_videos_inference.py adds two transforms on top of the
standard pipeline, reimplemented here as pure functions:

* :func:`rescale_frames` — auto-rescale so the detected face spans roughly
  ``face_res`` pixels while the frame stays within 480-720 px
  (real_videos_inference.py:51-70);
* :func:`increase_frames` — stretch a frame list to a target length by
  evenly duplicating frames, used in TTS mode where the synthesized audio
  outlasts the video (real_videos_inference.py:149-167).

The ``random``/``dubbed``/``tts`` modes differ only in which transforms apply
(dubbed: none — sync to the new audio directly; random: face-size rescale;
tts: rescale + frame stretching), wired together in
``cli/evaluate.py real`` .
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import cv2
import numpy as np


def target_scale_for_face(
    face_box: Tuple[int, int, int, int],
    frame_hw: Tuple[int, int],
    face_res: int = 180,
    min_frame_res: int = 480,
    max_frame_res: int = 720,
) -> float:
    """Scale factor making the face height ≈ face_res, clamped so the frame
    height lands in [min_frame_res, max_frame_res]."""
    x1, y1, x2, y2 = face_box
    face_h = max(y2 - y1, 1)
    h = frame_hw[0]
    scale = face_res / face_h
    scale = min(scale, max_frame_res / h)
    scale = max(scale, min_frame_res / h)
    return float(scale)


def rescale_frames(frames: List[np.ndarray], scale: float) -> List[np.ndarray]:
    if abs(scale - 1.0) < 1e-3:
        return frames
    h, w = frames[0].shape[:2]
    new_wh = (int(w * scale), int(h * scale))
    return [cv2.resize(f, new_wh) for f in frames]


def increase_frames(frames: List[np.ndarray], target_len: int
                    ) -> List[np.ndarray]:
    """Evenly duplicate frames until the list reaches ``target_len``
    (reference real_videos_inference.py:149-167 semantics: insert copies at a
    regular stride until lengths match)."""
    if len(frames) >= target_len:
        return frames[:target_len]
    out = list(frames)
    while len(out) < target_len:
        deficit = target_len - len(out)
        stride = max(len(out) // deficit, 1)
        merged: List[np.ndarray] = []
        for i, f in enumerate(out):
            merged.append(f)
            if len(merged) + (len(out) - i - 1) < target_len and i % stride == 0:
                merged.append(f)
        out = merged[:target_len] if len(merged) >= target_len else merged
    return out
