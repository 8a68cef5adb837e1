"""LSE-D / LSE-C lip-sync scoring harness.

Reimplements the reference's evaluation protocol
(evaluation/scores_LSE/SyncNetInstance_calc_scores.py:19-31,110-150,
calculate_scores_LRS.py:28-50) as a self-contained scorer: slide a 5-frame
window over the video and the aligned mel window over the audio, embed both
with a SyncNet, compute pairwise distances over ±``vshift`` frame offsets,
and report

* LSE-D — the minimum of the mean-over-windows distance curve, and
* LSE-C — median(curve) − min(curve), the sync confidence;

plus the inferred AV offset (vshift − argmin of the mean curve). This is the
reference statistic exactly (SyncNetInstance_calc_scores.py:131-137: mdist =
mean over windows first, then min/median of that curve); per-corpus numbers
average these per-video scores (calculate_scores_LRS.py:40-50).

Difference from the reference, by design: the reference depends on a clone of
the external ``syncnet_python`` repo and its MFCC frontend
(evaluation/README.md:10-29); this scorer embeds with *this framework's*
SyncNet (mel frontend + lower-half face windows), so it is self-contained and
runs on device. Scores are consistent for ranking/regression but are not
numerically identical to joonson/syncnet_python outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.audio import MelFrontend, load_wav
from wav2lip_tpu.config import Config, DEFAULT_CONFIG
from wav2lip_tpu.data.windows import crop_window_start
from wav2lip_tpu.models import SyncNet
from wav2lip_tpu.utils.cache import enable_compile_cache


@dataclass
class LSEResult:
    lse_d: float
    lse_c: float
    av_offset: int


class LSEScorer:
    """Self-contained LSE-D/LSE-C scorer over this framework's SyncNet.

    Input-framing caveat: frames are resized whole to the 96×96 SyncNet
    input — no face detection/crop happens here, so scores are meaningful
    for face-cropped clips (LRS2-style corpora, the eval generators'
    output) but NOT for full-scene videos where the face is a small region.
    For published-number comparability use
    :class:`wav2lip_tpu.eval.syncnet_protocol.SyncNetPythonScorer`, which
    follows the external protocol (224² frames, MFCCs, its own model).
    """

    def __init__(self, sync_vars, config: Config = DEFAULT_CONFIG,
                 vshift: int = 15, batch_size: int = 64):
        from wav2lip_tpu.utils.transfer import put_tree

        enable_compile_cache()
        # weights up once, passed as a jit argument (closure constants get
        # re-fetched at lowering and baked into cached executables)
        self.vars = put_tree(sync_vars)
        self.cfg = config
        self.vshift = vshift
        self.batch_size = batch_size
        self.mel = MelFrontend(config.audio)
        self.model = SyncNet()
        self._jit_embed = jax.jit(
            lambda v, mels, faces: self.model.apply(v, mels, faces)
        )

    # -- embedding ------------------------------------------------------------

    def _windows(self, frames: np.ndarray, mel_tm: np.ndarray, fps: float):
        """Build aligned (face_window, mel_window) pairs for every start
        frame with full coverage."""
        T = self.cfg.model.syncnet_T
        step = self.cfg.model.mel_step_size
        size = self.cfg.model.img_size
        n = len(frames)
        # each frame participates in up to T overlapping windows — resize
        # and lower-half once per FRAME, not once per window (the resize is
        # the dominant host cost of scoring)
        lower = np.stack([
            cv2.resize(f, (size, size))[size // 2 :] for f in frames
        ])                                           # (n, 48, 96, 3)
        faces, mels = [], []
        for i in range(n - T + 1):
            start = crop_window_start(i, fps)
            if start + step > mel_tm.shape[0]:
                break
            win = lower[i : i + T]                   # (T, 48, 96, 3)
            faces.append(
                np.transpose(win, (1, 2, 0, 3)).reshape(size // 2, size, T * 3)
            )
            mels.append(mel_tm[start : start + step].T)  # (80, 16)
        if not faces:
            raise ValueError("clip too short for LSE scoring")
        return (
            np.asarray(faces, np.float32) / 255.0,
            np.asarray(mels, np.float32)[..., None],
        )

    def _embed_all(self, faces: np.ndarray, mels: np.ndarray):
        n = len(faces)
        bs = self.batch_size
        a_out, v_out = [], []
        for i in range(0, n, bs):
            fa = faces[i : i + bs]
            me = mels[i : i + bs]
            pad = bs - len(fa)
            if pad:
                fa = np.concatenate([fa, np.zeros((pad,) + fa.shape[1:], fa.dtype)])
                me = np.concatenate([me, np.zeros((pad,) + me.shape[1:], me.dtype)])
            a, v = self._jit_embed(self.vars, me, fa)
            a_out.append(np.asarray(a)[: len(faces[i : i + bs])])
            v_out.append(np.asarray(v)[: len(faces[i : i + bs])])
        return np.concatenate(a_out), np.concatenate(v_out)

    # -- scoring ---------------------------------------------------------------

    def score_embeddings(self, a: np.ndarray, v: np.ndarray) -> LSEResult:
        """Distance-over-shifts scoring (SyncNetInstance_calc_scores.py:19-31,
        131-150). ``a``/``v``: (N, D) aligned audio/video embeddings."""
        vshift = self.vshift
        n = len(a)
        a_pad = np.pad(a, ((vshift, vshift), (0, 0)))
        # dists[i, s] = ||v[i] - a[i + s - vshift]||
        dists = np.zeros((n, 2 * vshift + 1), np.float64)
        for s in range(2 * vshift + 1):
            diff = v - a_pad[s : s + n]
            dists[:, s] = np.sqrt((diff ** 2).sum(axis=1))
        # windows whose shifted index falls outside [0, n) used padded zeros —
        # same as the reference's zero-padding of the feature tensor.
        # Reference order of operations (SyncNetInstance_calc_scores.py:
        # 131-137): mean over windows FIRST, then min/median of the curve —
        # min and mean do not commute, so per-window minima would bias
        # LSE-D low.
        mean_curve = dists.mean(axis=0)
        best_shift = int(np.argmin(mean_curve))
        minval = float(mean_curve[best_shift])
        return LSEResult(
            lse_d=minval,
            lse_c=float(np.median(mean_curve) - minval),
            av_offset=vshift - best_shift,
        )

    def score_video(self, video_path: str, wav_path: Optional[str] = None
                    ) -> LSEResult:
        """Score a rendered clip. Audio comes from ``wav_path`` (or is
        extracted from the video when ffmpeg is available)."""
        from wav2lip_tpu.io.video import extract_audio, read_video_frames

        frames, fps = read_video_frames(video_path)
        wav_path = wav_path or extract_audio(video_path)
        wav = load_wav(wav_path, self.cfg.audio.sample_rate)
        mel_tm = self.mel.melspectrogram(wav).T
        faces, mels = self._windows(np.asarray(frames), mel_tm, fps)
        a, v = self._embed_all(faces, mels)
        return self.score_embeddings(a, v)

    def score_video_tracked(self, video_path: str, detector,
                            wav_path: Optional[str] = None,
                            track_cfg=None) -> LSEResult:
        """Full-scene scoring: the S3FD track+crop front end
        (eval.face_track, rebuilding syncnet_python run_pipeline's stage,
        calculate_scores_real_videos.sh:6-7) runs before scoring, so a video
        where the face is a small off-center region scores like its
        face-cropped version. ``detector`` is a detect.FaceDetectionPipeline
        (pass downscale=1 — the tracker applies the protocol's own 0.25
        detection scale)."""
        from wav2lip_tpu.eval.face_track import (
            TrackConfig,
            slice_audio_to_track,
            track_and_crop,
        )
        from wav2lip_tpu.io.video import extract_audio, read_video_frames

        frames, fps = read_video_frames(video_path)
        wav_path = wav_path or extract_audio(video_path)
        wav = load_wav(wav_path, self.cfg.audio.sample_rate)
        crops, track = track_and_crop(
            frames, detector, track_cfg or TrackConfig()
        )
        wav_t = slice_audio_to_track(
            wav, self.cfg.audio.sample_rate, fps, track
        )
        mel_tm = self.mel.melspectrogram(wav_t).T
        faces, mels = self._windows(np.asarray(crops), mel_tm, fps)
        a, v = self._embed_all(faces, mels)
        return self.score_embeddings(a, v)

    def score_many(self, pairs: List[Tuple[str, Optional[str]]]):
        """Average scores over (video, wav) pairs — the corpus averaging of
        calculate_scores_LRS.py:43-50."""
        results = [self.score_video(v, w) for v, w in pairs]
        return {
            "lse_d": float(np.mean([r.lse_d for r in results])),
            "lse_c": float(np.mean([r.lse_c for r in results])),
            "per_video": results,
        }
