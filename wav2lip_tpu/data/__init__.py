from wav2lip_tpu.data.windows import (
    mel_chunk_starts,
    slice_mel_chunks,
    crop_window_start,
    segmented_mel_starts,
    smooth_boxes,
)

__all__ = [
    "mel_chunk_starts",
    "slice_mel_chunks",
    "crop_window_start",
    "segmented_mel_starts",
    "smooth_boxes",
]
