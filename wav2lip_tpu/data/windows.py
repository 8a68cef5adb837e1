"""Window and mel-chunk alignment arithmetic.

Every temporal alignment rule in the system lives here as a pure function with
exhaustive unit tests — the reference scatters these across scripts (the
``mel_idx_multiplier`` loop inference.py:231-240, ``crop_audio_window``
wav2lip_train.py:75-84, ``get_segmented_mels`` wav2lip_train.py:86-99,
``get_smoothened_boxes`` inference.py:59-66) and any off-by-one here silently
destroys lip sync.

Conventions: mel spectrograms are (num_mels, T) on the inference path and
time-major (T, num_mels) in training datasets (matching the reference's ``.T``
at wav2lip_train.py:141); video frames are 0-indexed; mel frames advance at
``mels_per_second`` = 80 for the default 16 kHz / hop 200 config.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

MEL_STEP_SIZE = 16  # width of one audio window in mel frames
SYNCNET_T = 5       # video frames per sync window
MELS_PER_SECOND = 80.0


def mel_chunk_starts(
    num_mel_frames: int,
    fps: float,
    mel_step_size: int = MEL_STEP_SIZE,
    mels_per_second: float = MELS_PER_SECOND,
    tail: str = "right_align",
) -> np.ndarray:
    """Start index of the 16-wide mel window for each output video frame.

    Replicates the reference's chunking loop (inference.py:231-240): frame i
    reads mel columns ``[int(i * mels_per_second / fps), +mel_step_size)``;
    with ``tail="right_align"`` the first frame whose window would run off the
    end gets the final right-aligned window and chunking stops there. The
    evaluation generators instead *drop* the tail
    (evaluation/gen_videos_from_filelist.py:178-183): ``tail="drop"``.

    Returns an int32 array of shape (num_chunks,); the number of chunks is the
    number of video frames that will be generated.
    """
    if tail not in ("right_align", "drop"):
        raise ValueError(
            f"tail must be 'right_align' or 'drop', got {tail!r}"
        )
    if num_mel_frames < mel_step_size:
        raise ValueError(
            f"need at least {mel_step_size} mel frames, got {num_mel_frames}"
        )
    multiplier = mels_per_second / fps
    starts = []
    i = 0
    while True:
        start = int(i * multiplier)
        if start + mel_step_size > num_mel_frames:
            if tail == "right_align":
                starts.append(num_mel_frames - mel_step_size)
            break
        starts.append(start)
        i += 1
    return np.asarray(starts, dtype=np.int32)


def slice_mel_chunks(
    mel: np.ndarray, starts: np.ndarray, mel_step_size: int = MEL_STEP_SIZE
) -> np.ndarray:
    """Gather (num_chunks, num_mels, mel_step_size) windows from (num_mels, T).

    Vectorized equivalent of the reference's per-chunk Python slicing; the same
    gather runs on device in the inference pipeline.
    """
    idx = starts[:, None] + np.arange(mel_step_size)[None, :]
    return np.transpose(mel[:, idx], (1, 0, 2))


def crop_window_start(
    frame_idx: int, fps: float, mels_per_second: float = MELS_PER_SECOND
) -> int:
    """Mel start index for the sync window anchored at video frame ``frame_idx``
    (reference: wav2lip_train.py:75-84, ``int(80. * (frame / fps))``)."""
    return int(mels_per_second * (frame_idx / float(fps)))


def crop_audio_window(
    spec_tm: np.ndarray,
    frame_idx: int,
    fps: float,
    mel_step_size: int = MEL_STEP_SIZE,
) -> np.ndarray:
    """Slice a (mel_step_size, num_mels) window out of a time-major (T, M) mel.

    May return fewer than ``mel_step_size`` rows near the end of the audio —
    callers must check (the reference resamples in that case,
    wav2lip_train.py:147).
    """
    start = crop_window_start(frame_idx, fps)
    return spec_tm[start : start + mel_step_size, :]


def segmented_mel_starts(
    frame_idx: int,
    fps: float,
    T: int = SYNCNET_T,
    mels_per_second: float = MELS_PER_SECOND,
) -> Optional[np.ndarray]:
    """Per-frame mel window starts for the generator's audio input.

    The reference (wav2lip_train.py:86-99) converts the 0-indexed start frame
    to 1-indexed, then for each of the T frames crops the window anchored two
    frames earlier: frame ``frame_idx + k`` (k in [0, T)) reads the window for
    1-indexed frame ``frame_idx + 1 + k - 2``. Returns None when the anchor
    would be negative (frame_idx == 0), matching the reference's rejection.
    """
    start_1idx = frame_idx + 1
    if start_1idx - 2 < 0:
        return None
    anchors = np.arange(start_1idx, start_1idx + T) - 2
    starts = (mels_per_second * anchors / float(fps)).astype(np.int64)
    return starts.astype(np.int32)


def segmented_mels(
    spec_tm: np.ndarray,
    frame_idx: int,
    fps: float,
    T: int = SYNCNET_T,
    mel_step_size: int = MEL_STEP_SIZE,
) -> Optional[np.ndarray]:
    """(T, num_mels, mel_step_size) per-frame mel windows, or None if any
    window is out of range (reference: get_segmented_mels)."""
    starts = segmented_mel_starts(frame_idx, fps, T=T)
    if starts is None:
        return None
    if starts[-1] + mel_step_size > spec_tm.shape[0] or starts[0] < 0:
        return None
    idx = starts[:, None] + np.arange(mel_step_size)[None, :]
    # (T, mel_step_size, num_mels) → (T, num_mels, mel_step_size)
    return np.transpose(spec_tm[idx], (0, 2, 1))


def smooth_boxes(boxes: np.ndarray, T: int = 5) -> np.ndarray:
    """Temporal smoothing of per-frame face boxes.

    Replicates the reference's in-place forward pass (inference.py:59-66)
    including its quirk that later windows average already-smoothed earlier
    entries: ``boxes[i] = mean(boxes[i : i+T])`` evaluated sequentially, with
    the window clamped to the last T boxes near the end.
    """
    boxes = np.array(boxes, dtype=np.float64, copy=True)
    n = len(boxes)
    for i in range(n):
        if i + T > n:
            window = boxes[n - T :]
        else:
            window = boxes[i : i + T]
        boxes[i] = np.mean(window, axis=0)
    return boxes
