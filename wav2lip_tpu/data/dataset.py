"""Host-side training input pipeline.

Produces the reference's training samples (wav2lip_train.py:40-164,
color_syncnet_train.py:37-131) from a preprocessed dataset directory tree
(per-video folders of face-crop JPEGs named ``{frame_idx}.jpg`` plus an
``audio.wav``), in NHWC layout ready for device transfer:

* SyncNet sample: coin-flip positive/negative 5-frame lower-half window
  stacked on channels (48, 96, 15), a (80, 16) mel window, and the label;
* Wav2Lip sample: 6-channel masked-target ⊕ wrong-reference window
  (T, 96, 96, 6), per-frame segmented mels (T, 80, 16, 1), the sync-loss mel
  window (80, 16), and the ground-truth window (T, 96, 96, 3).

Deliberate fix over the reference: each video's mel spectrogram is computed
once and cached (the reference recomputes the full mel per *sample*,
wav2lip_train.py:137-143 — the dominant input cost). Mels are deterministic,
so behavior is unchanged. Rejection/resampling semantics are preserved:
videos with ≤ 3·T frames are skipped, windows with missing frames or
out-of-range mels are resampled — but unlike the reference's bare
``while 1: continue`` (which spins silently at 100% CPU forever on a broken
setup, e.g. a filelist that doesn't match the data_root layout), a long run
of CONSECUTIVE rejections raises with a diagnostic (``_note_reject``).

A ``PrefetchLoader`` runs sampling in worker threads (cv2 JPEG decode
releases the GIL) and keeps a bounded queue of ready batches, standing in for
the reference's torch DataLoader worker processes.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from glob import glob
from os.path import basename, dirname, isfile, join
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from wav2lip_tpu.audio import load_wav, MelFrontend
from wav2lip_tpu.config import AudioConfig, ModelConfig
from wav2lip_tpu.data.windows import crop_audio_window, segmented_mels


def get_video_list(data_root: str, split: str,
                   filelists_dir: str = "filelists") -> List[str]:
    """Read ``{filelists_dir}/{split}.txt`` → video directory paths
    (reference hparams.py:4-12; lines may carry extra fields after a space)."""
    out = []
    with open(join(filelists_dir, f"{split}.txt")) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if " " in line:
                line = line.split()[0]
            out.append(join(data_root, line))
    return out


class WindowSampler:
    """Random sync-window sampler over preprocessed video folders."""

    def __init__(
        self,
        video_dirs: Sequence[str],
        audio_cfg: AudioConfig = AudioConfig(),
        model_cfg: ModelConfig = ModelConfig(),
        seed: int = 0,
        mel_cache_size: int = 256,
    ):
        if not video_dirs:
            raise ValueError("empty video list")
        self.videos = list(video_dirs)
        self.acfg = audio_cfg
        self.mcfg = model_cfg
        self.rng = random.Random(seed)
        self.frontend = MelFrontend(audio_cfg)
        self._mel_cache: Dict[str, np.ndarray] = {}
        self._mel_cache_size = mel_cache_size
        self._lock = threading.Lock()
        # Loud-failure guard on the reference's infinite resampling
        # (wav2lip_train.py:112-127 ``while 1: ... continue``): a broken
        # setup — filelist entries that don't match the data_root layout,
        # videos all ≤ 3·T frames, missing audio.wav — makes every attempt
        # fail, and the reference spins silently at 100% CPU forever. Only
        # CONSECUTIVE rejections count (any success resets), so sparse
        # datasets with high legitimate rejection rates never trip this.
        self._rejects = 0
        self._reject_limit = max(1000, min(20 * len(self.videos), 100_000))

    # -- helpers -------------------------------------------------------------

    def _frame_id(self, path: str) -> int:
        return int(basename(path).split(".")[0])

    def _window_paths(self, start_path: str) -> Optional[List[str]]:
        """T consecutive frame paths starting at ``start_path``, or None when
        a frame is missing (undetected faces leave index gaps,
        preprocess.py:61-67)."""
        start = self._frame_id(start_path)
        vid = dirname(start_path)
        out = []
        for fid in range(start, start + self.mcfg.syncnet_T):
            p = join(vid, f"{fid}.jpg")
            if not isfile(p):
                return None
            out.append(p)
        return out

    def _read_window(self, paths: List[str]) -> Optional[np.ndarray]:
        frames = []
        size = self.mcfg.img_size
        for p in paths:
            img = cv2.imread(p)
            if img is None:
                return None
            frames.append(cv2.resize(img, (size, size)))
        return np.stack(frames)  # (T, H, W, 3) BGR uint8

    def _mel_for(self, vid_dir: str) -> Optional[np.ndarray]:
        """Time-major (T_mel, 80) mel for the video's audio.wav, cached."""
        with self._lock:
            if vid_dir in self._mel_cache:
                return self._mel_cache[vid_dir]
        wavpath = join(vid_dir, "audio.wav")
        try:
            wav = load_wav(wavpath, self.acfg.sample_rate)
            mel = self.frontend.melspectrogram(wav).T.copy()
        except Exception:
            return None
        with self._lock:
            if len(self._mel_cache) >= self._mel_cache_size:
                self._mel_cache.pop(next(iter(self._mel_cache)))
            self._mel_cache[vid_dir] = mel
        return mel

    def _note_reject(self, reason: str) -> None:
        """Count a rejected sampling attempt; raise once the dataset looks
        unusable rather than unlucky (see ``_reject_limit`` in __init__).
        Racy increments from loader threads only blur the count by a few —
        the threshold is three orders of magnitude above noise."""
        self._rejects += 1
        if self._rejects >= self._reject_limit:
            probe = {
                v: len(glob(join(v, "*.jpg"))) for v in self.videos[:3]
            }
            raise RuntimeError(
                f"WindowSampler: {self._rejects} consecutive sampling "
                f"attempts rejected over {len(self.videos)} video(s) — "
                f"last reason: {reason}. The dataset looks unusable, not "
                f"unlucky. First video dirs and their frame counts: {probe}. "
                "Check that the filelist entries joined onto data_root match "
                "the preprocessed layout: each video dir needs > 3*T "
                "face-crop JPEGs named {frame_idx}.jpg plus an audio.wav "
                "(reference preprocess.py:61-67 layout)."
            )

    def _pick_video(self) -> Tuple[str, List[str]]:
        while True:
            vid = self.videos[self.rng.randrange(len(self.videos))]
            frames = glob(join(vid, "*.jpg"))
            # reject too-short videos (reference wav2lip_train.py:116)
            if len(frames) > 3 * self.mcfg.syncnet_T:
                return vid, frames
            self._note_reject(
                f"{vid}: {len(frames)} frames <= 3*T="
                f"{3 * self.mcfg.syncnet_T}"
            )

    # -- samples ---------------------------------------------------------------

    def sample_syncnet(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """→ (faces (48, 96, 15) uint8, mel (80, 16) float32, y (1,) float32).

        Coin-flip between the aligned window (y=1) and a mismatched window
        from the same video (y=0) (color_syncnet_train.py:80-87); face input
        is the lower half with T frames stacked on channels, time-major.

        Pixels ship as uint8: the jitted steps cast to f32/255 on device
        (within 1 ulp of the reference's host-side ``img / 255.``,
        color_syncnet_train.py:120 — see train/steps.py ``_as_unit``) so the
        host→device copy moves 4x fewer bytes — the end-to-end trainer's
        wall on thin links.
        """
        T = self.mcfg.syncnet_T
        size = self.mcfg.img_size
        while True:
            vid, frames = self._pick_video()
            img_name = self.rng.choice(frames)
            wrong_img_name = self.rng.choice(frames)
            while wrong_img_name == img_name:
                wrong_img_name = self.rng.choice(frames)

            if self.rng.choice([True, False]):
                y, chosen = 1.0, img_name
            else:
                y, chosen = 0.0, wrong_img_name

            paths = self._window_paths(chosen)
            if paths is None:
                self._note_reject("window crosses a frame-index gap")
                continue
            window = self._read_window(paths)
            if window is None:
                self._note_reject("unreadable frame JPEG")
                continue
            mel_tm = self._mel_for(vid)
            if mel_tm is None:
                self._note_reject("missing/unreadable audio.wav")
                continue
            mel = crop_audio_window(
                mel_tm, self._frame_id(img_name), self.mcfg.fps,
                self.mcfg.mel_step_size,
            )
            if mel.shape[0] != self.mcfg.mel_step_size:
                self._note_reject("mel window out of audio range")
                continue

            self._rejects = 0
            lower = window[:, size // 2 :, :, :]  # (T, 48, 96, 3)
            faces = np.transpose(lower, (1, 2, 0, 3)).reshape(
                size // 2, size, T * 3
            )
            return (
                np.ascontiguousarray(faces),  # uint8; device casts to f32/255
                mel.T.astype(np.float32),
                np.asarray([y], np.float32),
            )

    def sample_wav2lip(self):
        """→ dict with x (T,96,96,6) uint8, indiv_mels (T,80,16,1) f32,
        mel (80,16) f32, gt (T,96,96,3) uint8 — reference
        wav2lip_train.py:111-164 semantics. Pixels ship as uint8 and the
        jitted steps cast to f32/255 on device (within 1 ulp, 4x fewer
        host→device bytes; see ``sample_syncnet``)."""
        T = self.mcfg.syncnet_T
        size = self.mcfg.img_size
        while True:
            vid, frames = self._pick_video()
            img_name = self.rng.choice(frames)
            wrong_img_name = self.rng.choice(frames)
            while wrong_img_name == img_name:
                wrong_img_name = self.rng.choice(frames)

            paths = self._window_paths(img_name)
            wrong_paths = self._window_paths(wrong_img_name)
            if paths is None or wrong_paths is None:
                self._note_reject("window crosses a frame-index gap")
                continue
            window = self._read_window(paths)
            wrong_window = self._read_window(wrong_paths)
            if window is None or wrong_window is None:
                self._note_reject("unreadable frame JPEG")
                continue
            mel_tm = self._mel_for(vid)
            if mel_tm is None:
                self._note_reject("missing/unreadable audio.wav")
                continue
            fid = self._frame_id(img_name)
            mel = crop_audio_window(
                mel_tm, fid, self.mcfg.fps, self.mcfg.mel_step_size
            )
            if mel.shape[0] != self.mcfg.mel_step_size:
                self._note_reject("mel window out of audio range")
                continue
            indiv = segmented_mels(
                mel_tm, fid, self.mcfg.fps, T, self.mcfg.mel_step_size
            )
            if indiv is None:
                self._note_reject("segmented mels out of audio range")
                continue

            self._rejects = 0
            gt = window                                       # (T,H,W,3) u8
            masked = gt.copy()
            masked[:, size // 2 :, :, :] = 0
            x = np.concatenate([masked, wrong_window], axis=-1)  # (T,H,W,6)
            return {
                "x": x,
                "indiv_mels": indiv[..., None].astype(np.float32),
                "mel": mel.T.astype(np.float32),
                "gt": gt,
            }


class PrefetchLoader:
    """Thread-pool batch loader with a bounded prefetch queue."""

    def __init__(self, sample_fn, batch_size: int, num_workers: int = 4,
                 prefetch: int = 4):
        self.sample_fn = sample_fn
        self.batch_size = batch_size
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        # at least one worker: zero threads would make __next__ block
        # forever (num_workers=0 means "minimal parallelism", not "no data")
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_workers))
        ]
        for t in self._threads:
            t.start()

    def _collate(self, samples):
        first = samples[0]
        if isinstance(first, dict):
            return {k: np.stack([s[k] for s in samples]) for k in first}
        return tuple(np.stack(col) for col in zip(*samples))

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._collate(
                    [self.sample_fn() for _ in range(self.batch_size)]
                )
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — re-raised in __next__
            # a dying worker must not turn into a silent forever-block on
            # the consumer side (one bad file in a video dir used to hang
            # training with no traceback)
            self._error = e

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if self._error is not None:
                raise RuntimeError(
                    "PrefetchLoader worker failed"
                ) from self._error
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                continue

    def close(self):
        self._stop.set()
        # drain so workers blocked on put() can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
