"""Chunked streaming lip-sync inference pipeline.

The product path (reference: inference.py:181-277): decode video → mel
spectrogram → per-frame mel windows → face boxes (S3FD, fixed ``--box``, or
static first-frame) → batched generator forward → composite the generated
mouth patch back into each full frame → encode + mux audio.

TPU-first deltas from the reference:
* fixed generator batch shape — the last partial batch is padded, not
  re-traced (the reference re-runs Python per variable batch);
* face detection is the batched, fully-on-device pipeline from
  :mod:`wav2lip_tpu.detect` instead of a per-anchor host loop with an
  OOM-halving retry ladder;
* crop/mask/normalize for each batch runs on device inside the same jit as
  the generator forward, so the host only ships uint8 face crops;
* host-side compositing overlaps device compute via a one-batch pipeline
  (the host prepares batch N+1 and composites batch N-1 while batch N runs).

Behavioral parity preserved: pads/box/static/resize_factor/rotate/crop/
nosmooth flags, bbox smoothing window of 5, mel NaN guard, frame truncation
to the chunk count, and cyclic frame reuse ``i % len(frames)``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.audio import load_wav, MelFrontend
from wav2lip_tpu.config import Config, DEFAULT_CONFIG
from wav2lip_tpu.data.windows import mel_chunk_starts, slice_mel_chunks, smooth_boxes
from wav2lip_tpu.detect import FaceDetectionPipeline
from wav2lip_tpu.io.video import (
    VideoFrameWriter,
    extract_audio,
    mux_audio,
    read_video_frames,
)
from wav2lip_tpu.models import Wav2LipGenerator
from wav2lip_tpu.utils.cache import enable_compile_cache
from wav2lip_tpu.utils.profiling import StageTimer

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


class FaceNotDetectedError(ValueError):
    pass


class VideoTooShortError(ValueError):
    """Raised in ``skip_if_short`` mode when a video has fewer frames than
    mel chunks (the eval harness skips such videos,
    gen_videos_from_filelist.py:195-196)."""


@dataclass
class FrameCrop:
    """Per output frame: source frame index and face box (y1, y2, x1, x2)."""

    frame_idx: int
    coords: Tuple[int, int, int, int]


class LipSyncPipeline:
    def __init__(
        self,
        generator_vars,
        detector: Optional[FaceDetectionPipeline] = None,
        config: Config = DEFAULT_CONFIG,
        batch_size: Optional[int] = None,
    ):
        enable_compile_cache()
        self.vars = generator_vars
        self.detector = detector
        self.cfg = config
        self.batch_size = batch_size or config.infer.wav2lip_batch_size
        self.img_size = config.infer.img_size
        self.mel = MelFrontend(config.audio)
        self.model = Wav2LipGenerator()
        self._jit_generate = jax.jit(self._generate_fn)
        self.timings = StageTimer()  # per-stage wall time of the last run

    # -- device step ---------------------------------------------------------

    def _generate_fn(self, faces_u8: jnp.ndarray, mels: jnp.ndarray):
        """(B, 96, 96, 3) uint8 face crops + (B, 80, 16) mel windows →
        (B, 96, 96, 3) uint8 generated crops.

        Masking the lower half, the 6-channel concat, /255 normalization
        (reference inference.py:136-140) and the *255 output conversion all
        fuse into the generator's XLA program.
        """
        faces = faces_u8.astype(jnp.float32) / 255.0
        h = self.img_size // 2
        masked = faces.at[:, h:, :, :].set(0.0)
        x = jnp.concatenate([masked, faces], axis=-1)
        mel_in = mels[..., None]  # (B, 80, 16, 1)
        out = self.model.apply(self.vars, mel_in, x)
        return jnp.clip(out * 255.0, 0, 255).astype(jnp.uint8)

    # -- face localization ----------------------------------------------------

    def _face_boxes(
        self, frames: List[np.ndarray], static: bool
    ) -> List[Tuple[int, int, int, int]]:
        """Per-frame (y1, y2, x1, x2) after pads and temporal smoothing
        (reference inference.py:68-106)."""
        icfg = self.cfg.infer
        if icfg.box[0] != -1:
            y1, y2, x1, x2 = icfg.box
            return [(y1, y2, x1, x2)] * len(frames)

        if self.detector is None:
            raise ValueError(
                "no face detector configured: pass --box or provide S3FD weights"
            )
        targets = frames[:1] if static else frames
        raw = self.detector.first_face_boxes(np.asarray(targets))

        pady1, pady2, padx1, padx2 = icfg.pads
        results = []
        for rect, image in zip(raw, targets):
            if rect is None:
                os.makedirs("temp", exist_ok=True)
                cv2.imwrite("temp/faulty_frame.jpg", image)
                raise FaceNotDetectedError(
                    "Face not detected! Ensure the video contains a face in "
                    "all the frames."
                )
            x1, y1, x2, y2 = rect
            results.append([
                max(0, x1 - padx1),
                max(0, y1 - pady1),
                min(image.shape[1], x2 + padx2),
                min(image.shape[0], y2 + pady2),
            ])
        boxes = np.asarray(results, np.float64)
        if not icfg.nosmooth:
            boxes = smooth_boxes(boxes, T=icfg.smooth_window)
        return [
            (int(y1), int(y2), int(x1), int(x2)) for x1, y1, x2, y2 in boxes
        ]

    # -- main entry ------------------------------------------------------------

    def run(
        self,
        face_path: str,
        audio_path: str,
        outfile: str,
        fps: Optional[float] = None,
        temp_dir: str = "temp",
        tail: str = "right_align",
        skip_if_short: bool = False,
    ) -> str:
        """Lip-sync ``face_path`` to ``audio_path`` into ``outfile``.

        ``tail`` selects the final-mel-chunk policy: ``"right_align"`` is the
        product behavior (inference.py:236-237); ``"drop"`` is the eval
        harness's (gen_videos_from_filelist.py:178-183). ``skip_if_short``
        raises :class:`VideoTooShortError` when the clip has fewer frames
        than mel chunks instead of cycling frames (eval harness,
        gen_videos_from_filelist.py:195-196).
        """
        icfg = self.cfg.infer
        static = icfg.static
        self.timings = StageTimer()

        # 1. frame ingest (reference inference.py:182-213)
        with self.timings("decode"):
            if face_path.lower().endswith(IMAGE_EXTS):
                img = cv2.imread(face_path)
                if img is None:
                    raise ValueError(f"could not read image: {face_path}")
                frames = [img]
                static = True
                video_fps = fps or icfg.fps
            else:
                frames, video_fps = read_video_frames(
                    face_path,
                    resize_factor=icfg.resize_factor,
                    rotate=icfg.rotate,
                    crop=icfg.crop,
                )
                if fps is not None:
                    video_fps = fps

        # 2. audio → mel (+ NaN guard for TTS audio, inference.py:228-229)
        os.makedirs(temp_dir, exist_ok=True)
        with self.timings("audio"):
            wav_path = extract_audio(
                audio_path, os.path.join(temp_dir, "temp.wav"),
                self.cfg.audio.sample_rate,
            )
            wav = load_wav(wav_path, self.cfg.audio.sample_rate)
            mel = self.mel.melspectrogram(wav)
        if np.isnan(mel).any():
            raise ValueError(
                "Mel contains nan! Using a TTS voice? Add a small epsilon "
                "noise to the wav file and try again"
            )

        # 3. chunk plan: one mel window per output frame
        starts = mel_chunk_starts(
            mel.shape[1], video_fps, self.cfg.model.mel_step_size, tail=tail
        )
        mel_chunks = slice_mel_chunks(mel, starts, self.cfg.model.mel_step_size)
        num_out = len(mel_chunks)
        if skip_if_short and not static and len(frames) < num_out:
            raise VideoTooShortError(
                f"{face_path}: {len(frames)} frames < {num_out} mel chunks"
            )
        frames = frames[:num_out] if not static else frames

        # 4. face boxes once per source frame
        with self.timings("detect"):
            boxes = self._face_boxes(frames, static)

        crops: List[FrameCrop] = [
            FrameCrop(0 if static else i % len(frames),
                      boxes[0 if static else i % len(frames)])
            for i in range(num_out)
        ]

        # 5. batched generate + composite, one-batch host/device pipeline
        frame_h, frame_w = frames[0].shape[:2]
        tmp_video = os.path.join(temp_dir, "result.avi")
        written = 0
        with VideoFrameWriter(tmp_video, video_fps, (frame_h, frame_w),
                              fourcc="DIVX") as writer:
            pending = None  # (device_future, crop_metadata)
            for lo in range(0, num_out, self.batch_size):
                hi = min(lo + self.batch_size, num_out)
                batch_crops = crops[lo:hi]
                with self.timings("prep"):
                    face_batch = np.zeros(
                        (self.batch_size, self.img_size, self.img_size, 3),
                        np.uint8,
                    )
                    for j, c in enumerate(batch_crops):
                        y1, y2, x1, x2 = c.coords
                        face = frames[c.frame_idx][y1:y2, x1:x2]
                        face_batch[j] = cv2.resize(
                            face, (self.img_size, self.img_size)
                        )
                    mel_batch = np.zeros(
                        (self.batch_size, mel.shape[0],
                         self.cfg.model.mel_step_size),
                        np.float32,
                    )
                    mel_batch[: hi - lo] = mel_chunks[lo:hi]

                with self.timings("generate_dispatch"):
                    preds = self._jit_generate(face_batch, mel_batch)

                if pending is not None:
                    with self.timings("composite"):
                        written += self._composite(writer, frames, *pending)
                pending = (preds, batch_crops)
            if pending is not None:
                with self.timings("composite"):
                    written += self._composite(writer, frames, *pending)

        assert written == num_out, (written, num_out)

        # 6. mux (reference inference.py:276-277)
        with self.timings("mux"):
            return mux_audio(tmp_video, wav_path, outfile)

    def _composite(self, writer, frames, preds, batch_crops) -> int:
        preds = np.asarray(preds)  # sync point: device → host
        for j, c in enumerate(batch_crops):
            y1, y2, x1, x2 = c.coords
            frame = frames[c.frame_idx].copy()
            patch = cv2.resize(preds[j], (x2 - x1, y2 - y1))
            frame[y1:y2, x1:x2] = patch
            writer.write(frame)
        return len(batch_crops)
