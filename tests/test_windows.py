"""Alignment arithmetic tests — each compared against a naive re-derivation of
the reference's loops (inference.py:231-240, wav2lip_train.py:75-99,
inference.py:59-66)."""

import numpy as np
import pytest

from wav2lip_tpu.data.windows import (
    mel_chunk_starts,
    slice_mel_chunks,
    crop_window_start,
    crop_audio_window,
    segmented_mel_starts,
    segmented_mels,
    smooth_boxes,
)


def naive_chunk_starts(num_mel_frames, fps, mel_step_size=16):
    """Direct transliteration of the reference chunking loop for testing."""
    mel_idx_multiplier = 80.0 / fps
    starts = []
    i = 0
    while 1:
        start_idx = int(i * mel_idx_multiplier)
        if start_idx + mel_step_size > num_mel_frames:
            starts.append(num_mel_frames - mel_step_size)
            break
        starts.append(start_idx)
        i += 1
    return np.array(starts)


class TestMelChunkStarts:
    @pytest.mark.parametrize("fps", [25.0, 30.0, 24.0, 29.97, 15.0, 60.0])
    @pytest.mark.parametrize("T", [16, 81, 161, 250, 1000])
    def test_matches_reference_loop(self, fps, T):
        got = mel_chunk_starts(T, fps)
        ref = naive_chunk_starts(T, fps)
        np.testing.assert_array_equal(got, ref)

    def test_25fps_alignment(self):
        # At 25 fps the multiplier is exactly 3.2: starts 0,3,6,9,12,16,...
        starts = mel_chunk_starts(161, 25.0)
        assert starts[0] == 0 and starts[1] == 3 and starts[5] == 16
        # 161 mel frames = 2s of audio → ~46 chunks incl. right-aligned tail
        assert starts[-1] == 161 - 16
        assert (starts + 16 <= 161).all()

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            mel_chunk_starts(15, 25.0)

    def test_tail_drop_mode(self):
        # evaluation harness drops the tail instead of right-aligning
        # (gen_videos_from_filelist.py:178-183)
        ra = mel_chunk_starts(161, 25.0, tail="right_align")
        dr = mel_chunk_starts(161, 25.0, tail="drop")
        assert len(dr) == len(ra) - 1
        np.testing.assert_array_equal(dr, ra[:-1])

    def test_exact_fit(self):
        # Reference quirk: when the audio holds exactly one window, the loop
        # emits it twice (the in-range chunk at 0, then the right-aligned tail
        # which is also 0) — preserved for frame-count parity.
        starts = mel_chunk_starts(16, 25.0)
        np.testing.assert_array_equal(starts, [0, 0])


class TestSliceMelChunks:
    def test_gather_matches_slicing(self):
        r = np.random.default_rng(0)
        mel = r.standard_normal((80, 161)).astype(np.float32)
        starts = mel_chunk_starts(161, 25.0)
        chunks = slice_mel_chunks(mel, starts)
        assert chunks.shape == (len(starts), 80, 16)
        for k, s in enumerate(starts):
            np.testing.assert_array_equal(chunks[k], mel[:, s : s + 16])


class TestCropWindow:
    @pytest.mark.parametrize("frame,fps,expected", [
        (0, 25.0, 0),
        (1, 25.0, 3),     # int(3.2)
        (2, 25.0, 6),
        (5, 25.0, 16),
        (25, 25.0, 80),
        (7, 30.0, 18),    # int(80*7/30)=int(18.67)
    ])
    def test_start_index(self, frame, fps, expected):
        assert crop_window_start(frame, fps) == expected

    def test_crop_shape(self):
        spec = np.zeros((200, 80))
        w = crop_audio_window(spec, 10, 25.0)
        assert w.shape == (16, 80)
        # near the end: short window returned, caller must check
        w = crop_audio_window(spec, 60, 25.0)  # start=192, only 8 rows left
        assert w.shape[0] == 8


class TestSegmentedMels:
    def test_frame_zero_rejected(self):
        assert segmented_mel_starts(0, 25.0) is None

    def test_reference_indexing(self):
        # frame_idx=3 → 1-indexed 4 → anchors (i-2 for i in 4..8) = 2..6
        starts = segmented_mel_starts(3, 25.0)
        expected = [int(80 * a / 25.0) for a in [2, 3, 4, 5, 6]]
        np.testing.assert_array_equal(starts, expected)

    def test_segmented_mels_values(self):
        r = np.random.default_rng(1)
        spec = r.standard_normal((400, 80)).astype(np.float32)
        out = segmented_mels(spec, 10, 25.0)
        assert out.shape == (5, 80, 16)
        starts = segmented_mel_starts(10, 25.0)
        for k, s in enumerate(starts):
            np.testing.assert_array_equal(out[k], spec[s : s + 16].T)

    def test_out_of_range_returns_none(self):
        spec = np.zeros((20, 80))
        assert segmented_mels(spec, 10, 25.0) is None


class TestSmoothBoxes:
    def naive(self, boxes, T):
        boxes = np.array(boxes, dtype=np.float64)
        for i in range(len(boxes)):
            if i + T > len(boxes):
                window = boxes[len(boxes) - T :]
            else:
                window = boxes[i : i + T]
            boxes[i] = np.mean(window, axis=0)
        return boxes

    @pytest.mark.parametrize("n", [1, 3, 5, 6, 20])
    def test_matches_reference_inplace_semantics(self, n):
        r = np.random.default_rng(2)
        boxes = r.uniform(0, 100, size=(n, 4))
        got = smooth_boxes(boxes, T=5)
        ref = self.naive(boxes.copy(), T=5)
        np.testing.assert_allclose(got, ref)

    def test_input_not_mutated(self):
        boxes = np.arange(40, dtype=np.float64).reshape(10, 4)
        orig = boxes.copy()
        smooth_boxes(boxes, T=5)
        np.testing.assert_array_equal(boxes, orig)

    def test_constant_invariant(self):
        boxes = np.tile([1.0, 2.0, 3.0, 4.0], (8, 1))
        np.testing.assert_allclose(smooth_boxes(boxes, T=5), boxes)


def test_mel_chunk_starts_rejects_unknown_tail():
    """A typo'd tail mode must not silently drop the final window."""
    import pytest

    from wav2lip_tpu.data.windows import mel_chunk_starts

    with pytest.raises(ValueError, match="tail"):
        mel_chunk_starts(100, 25.0, tail="right-align")
