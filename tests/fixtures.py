"""Synthetic media fixtures.

LRS2 is license-restricted and no real media ships with this repo, so tests
build tiny synthetic assets: a talking-head-like video (a high-contrast
"face" disc with a moving mouth bar), a tonal wav, and a preprocessed dataset
tree in the reference's on-disk format (per-video ``{idx}.jpg`` face crops +
``audio.wav``, preprocess.py:61-79).
"""

import os
from os.path import join

import cv2
import numpy as np
import scipy.io.wavfile as wavfile


def make_wav(path: str, seconds: float = 2.0, sr: int = 16000, seed: int = 0):
    r = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    sig = (
        0.4 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
        + 0.15 * np.sin(2 * np.pi * 1100 * t)
        + 0.02 * r.standard_normal(n)
    )
    wavfile.write(path, sr, (sig * 20000).astype(np.int16))
    return path


def synth_face_frame(w: int, h: int, t: int, face_scale: float = 0.6):
    """A frame with a bright disc 'face' and a time-varying 'mouth' bar."""
    img = np.full((h, w, 3), 32, np.uint8)
    cy, cx = h // 2, w // 2
    r = int(min(h, w) * face_scale / 2)
    cv2.circle(img, (cx, cy), r, (80, 160, 220), -1)          # skin
    cv2.circle(img, (cx - r // 3, cy - r // 3), r // 8, (40, 40, 40), -1)  # eyes
    cv2.circle(img, (cx + r // 3, cy - r // 3), r // 8, (40, 40, 40), -1)
    mouth_h = max(2, int(r // 4 * (0.5 + 0.5 * np.sin(t * 0.7))))
    cv2.rectangle(
        img,
        (cx - r // 3, cy + r // 3 - mouth_h // 2),
        (cx + r // 3, cy + r // 3 + mouth_h // 2),
        (30, 30, 120),
        -1,
    )
    return img


def make_video(path: str, num_frames: int = 50, fps: float = 25.0,
               w: int = 128, h: int = 128):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened()
    for t in range(num_frames):
        vw.write(synth_face_frame(w, h, t))
    vw.release()
    return path


def make_preprocessed_dataset(
    root: str, num_videos: int = 3, frames_per_video: int = 40,
    crop_size: int = 64, seconds: float = 2.0,
):
    """Build a reference-format preprocessed tree:
    ``root/{speaker}/{vid}/{idx}.jpg`` + ``audio.wav``; returns video dirs."""
    dirs = []
    for v in range(num_videos):
        d = join(root, "spk0", f"vid{v}")
        os.makedirs(d, exist_ok=True)
        for i in range(frames_per_video):
            # leave an index gap in one video to exercise rejection paths
            if v == 0 and i == frames_per_video // 2:
                continue
            img = synth_face_frame(crop_size, crop_size, i + v, face_scale=0.95)
            cv2.imwrite(join(d, f"{i}.jpg"), img)
        make_wav(join(d, "audio.wav"), seconds=seconds, seed=v)
        dirs.append(d)
    return dirs


def write_filelists(filelists_dir: str, rel_video_paths, split: str = "train"):
    os.makedirs(filelists_dir, exist_ok=True)
    with open(join(filelists_dir, f"{split}.txt"), "w") as f:
        for p in rel_video_paths:
            f.write(p + "\n")


def pixel_stub_detector(variables, parts, factor=1):
    """Stub FaceDetectionPipeline._jit_detect that finds the bright (>150)
    region in the actual pixel content — behaves like a real detector for
    full frames AND ROI crops, so ROI-tracked detection and detector-mode
    inference can be tested end to end without S3FD compiles."""
    x = np.concatenate([np.asarray(q) for q in parts], axis=0)
    if factor > 1:
        x = x[:, ::factor, ::factor]
    total = x.shape[0]
    boxes = np.zeros((total, 16, 4), np.float32)
    scores = np.zeros((total, 16), np.float32)
    num = np.zeros(total, np.int64)
    for i in range(total):
        ys, xs = np.where(x[i].max(axis=-1) > 150)
        if len(ys) < 4:
            continue
        boxes[i, 0] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        scores[i, 0] = 0.9
        num[i] = 1
    return boxes, scores, num
