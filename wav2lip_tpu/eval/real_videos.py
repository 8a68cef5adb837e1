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
    """Evenly duplicate frames until the list reaches ``target_len``, with
    the reference's exact duplicate placement
    (real_videos_inference.py:149-167): each pass walks the list with a
    floating accumulator stepping ``target_len / len(frames)`` and appends a
    duplicate of frame ``i`` whenever ``ceil(accumulator) == i``, repeating
    whole passes until long enough, then truncates. TTS-mode outputs are
    frame-for-frame identical to the reference's."""
    out = list(frames)
    while len(out) < target_len:
        dup_every = float(target_len) / len(out)
        merged: List[np.ndarray] = []
        next_duplicate = 0.0
        for i, f in enumerate(out):
            merged.append(f)
            if int(np.ceil(next_duplicate)) == i:
                merged.append(f)
            next_duplicate += dup_every
        out = merged
    return out[:target_len]
