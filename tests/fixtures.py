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


def talking_envelope(num_frames: int, fps: float, seed: int):
    """Per-frame 'speech energy' envelope in [0.1, 1]: a syllabic telegraph
    process — 2-4-frame syllables, each holding an independent uniform
    level. Crisp level changes every few frames mean two windows offset by
    even a couple of frames almost surely carry different energy profiles,
    so the reference's random-offset negative sampling
    (color_syncnet_train.py:80-87) yields genuinely wrong pairs. A smooth
    low-rate envelope (the first design) made half the negatives
    near-duplicates of the positives and SyncNet plateaued at ~0.66 BCE."""
    r = np.random.default_rng(seed)
    e = np.empty(num_frames)
    i = 0
    while i < num_frames:
        dur = int(r.integers(2, 5))
        e[i:i + dur] = r.uniform(0.1, 1.0)
        i += dur
    return e[:num_frames]


def talking_face_frame(size: int, openness: float):
    """Face crop whose mouth-bar height encodes ``openness`` in [0, 1] —
    the audio-visual correspondence SyncNet must learn."""
    img = np.full((size, size, 3), 32, np.uint8)
    c = size // 2
    r = int(size * 0.48)
    cv2.circle(img, (c, c), r, (80, 160, 220), -1)
    cv2.circle(img, (c - r // 3, c - r // 3), r // 8, (40, 40, 40), -1)
    cv2.circle(img, (c + r // 3, c - r // 3), r // 8, (40, 40, 40), -1)
    mouth_h = max(2, int(r * 0.55 * openness))
    cv2.rectangle(
        img,
        (c - r // 3, c + r // 3 - mouth_h // 2),
        (c + r // 3, c + r // 3 + mouth_h // 2),
        (30, 30, 120),
        -1,
    )
    return img


def talking_wav(env: np.ndarray, fps: float, sr: int = 16000, seed: int = 0):
    """Audio whose amplitude tracks the per-frame envelope: a harmonic
    carrier AM-modulated by ``env`` (linearly interpolated to ``sr``)."""
    r = np.random.default_rng(seed + 1000)
    n = int(len(env) / fps * sr)
    t = np.arange(n) / sr
    e = np.interp(t, np.arange(len(env)) / fps, env)
    sig = e * (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
    ) + 0.005 * r.standard_normal(n)
    return (sig * 16000).astype(np.int16)


def make_talking_video(path: str, num_frames: int, fps: float = 25.0,
                       w: int = 128, h: int = 128, seed: int = 0,
                       face_scale: float = 0.6):
    """Raw talking-head clip + wav pair where the mouth tracks the audio
    envelope (returns the wav path). Unlike ``make_video``, the mouth is a
    FUNCTION OF THE SOUND — sync between the streams is learnable, which is
    what the product-loop proof trains on."""
    env = talking_envelope(num_frames, fps, seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened()
    size = int(min(w, h) * face_scale)
    for i in range(num_frames):
        frame = np.full((h, w, 3), 32, np.uint8)
        face = talking_face_frame(size, env[i])
        y0, x0 = (h - size) // 2, (w - size) // 2
        frame[y0:y0 + size, x0:x0 + size] = face
        vw.write(frame)
    vw.release()
    wav_path = os.path.splitext(path)[0] + ".wav"
    wavfile.write(wav_path, 16000, talking_wav(env, fps, seed=seed))
    return wav_path


def make_talking_dataset(root: str, num_videos: int = 6,
                         frames_per_video: int = 120, crop_size: int = 96,
                         fps: float = 25.0, seed: int = 0):
    """Preprocessed-format talking dataset (face crops + audio.wav per
    video dir) with LEARNABLE audio-visual sync: mouth openness equals the
    audio amplitude envelope. Returns the video dirs."""
    dirs = []
    for v in range(num_videos):
        d = join(root, "spk0", f"vid{v}")
        os.makedirs(d, exist_ok=True)
        env = talking_envelope(frames_per_video, fps, seed + v)
        for i in range(frames_per_video):
            cv2.imwrite(join(d, f"{i}.jpg"),
                        talking_face_frame(crop_size, env[i]))
        wavfile.write(join(d, "audio.wav"), 16000,
                      talking_wav(env, fps, seed=seed + v))
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
