"""Host-side media I/O.

The TPU work happens between decode and encode; demux/decode/encode/mux stay
on the host exactly as in the reference (cv2.VideoCapture/VideoWriter +
ffmpeg subprocess calls, inference.py:190-213,217-222,256,276-277). ffmpeg is
probed at runtime and every ffmpeg-dependent step degrades with a clear error
(or a documented fallback) when the binary is absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def read_video_frames(
    path: str,
    resize_factor: int = 1,
    rotate: bool = False,
    crop: Tuple[int, int, int, int] = (0, -1, 0, -1),
) -> Tuple[List[np.ndarray], float]:
    """Decode a video into BGR frames with the reference's ingest transforms
    (inference.py:190-213): integer downscale, optional 90° clockwise rotate,
    then crop (top, bottom, left, right; -1 = full extent).

    Returns (frames, fps).
    """
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"could not open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames: List[np.ndarray] = []
    y1, y2, x1, x2 = crop
    while True:
        ok, frame = cap.read()
        if not ok:
            cap.release()
            break
        if resize_factor > 1:
            frame = cv2.resize(
                frame,
                (frame.shape[1] // resize_factor, frame.shape[0] // resize_factor),
            )
        if rotate:
            frame = cv2.rotate(frame, cv2.ROTATE_90_CLOCKWISE)
        fy2 = frame.shape[0] if y2 == -1 else y2
        fx2 = frame.shape[1] if x2 == -1 else x2
        frames.append(frame[y1:fy2, x1:fx2])
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return frames, float(fps)


class VideoFrameWriter:
    """Streaming BGR frame writer (cv2.VideoWriter).

    The reference writes a DIVX .avi intermediate then muxes audio with ffmpeg
    (inference.py:256,276). mp4v is used by default here since it is portable
    across OpenCV builds; pass ``fourcc='DIVX'`` for bit-identical reference
    behavior.
    """

    def __init__(self, path: str, fps: float, frame_size_hw: Tuple[int, int],
                 fourcc: str = "mp4v"):
        h, w = frame_size_hw
        self.path = path
        self._writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
        )
        if not self._writer.isOpened():
            raise ValueError(f"could not open video writer: {path}")

    def write(self, frame_bgr: np.ndarray) -> None:
        self._writer.write(frame_bgr)

    def close(self) -> None:
        self._writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def extract_audio(media_path: str, out_wav: Optional[str] = None,
                  sample_rate: int = 16000) -> str:
    """Extract a wav track from a media file via ffmpeg
    (reference inference.py:217-222, preprocess.py:35).

    Returns the wav path. Raises RuntimeError when ffmpeg is unavailable —
    callers should pass .wav audio directly in that case.
    """
    if media_path.endswith(".wav"):
        return media_path
    if not has_ffmpeg():
        raise RuntimeError(
            "ffmpeg is required to extract audio from non-wav inputs; "
            "provide a .wav file instead"
        )
    if out_wav is None:
        out_wav = tempfile.mktemp(suffix=".wav")
    subprocess.check_call(
        ["ffmpeg", "-loglevel", "error", "-y", "-i", media_path,
         "-ar", str(sample_rate), "-ac", "1", out_wav]
    )
    return out_wav


def mux_audio(video_path: str, audio_path: str, outfile: str) -> str:
    """Mux the audio track onto the rendered video (reference
    inference.py:276-277, ``ffmpeg -i audio -i video -q:v 1 out``).

    Without ffmpeg the silent video is copied to ``outfile`` and a warning is
    printed — lip-synced frames are still produced, just without the audio
    track embedded.
    """
    os.makedirs(os.path.dirname(os.path.abspath(outfile)), exist_ok=True)
    if has_ffmpeg():
        subprocess.check_call(
            ["ffmpeg", "-loglevel", "error", "-y", "-i", audio_path,
             "-i", video_path, "-strict", "-2", "-q:v", "1", outfile]
        )
    else:
        shutil.copyfile(video_path, outfile)
        print(
            f"[wav2lip_tpu] ffmpeg not found: wrote video without audio track "
            f"to {outfile}"
        )
    return outfile
