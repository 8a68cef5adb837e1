"""Real-video (ReSyncED) helper tests."""

import numpy as np

from wav2lip_tpu.eval.real_videos import (
    increase_frames,
    rescale_frames,
    target_scale_for_face,
)


def frames_of(n, h=100, w=100):
    return [np.full((h, w, 3), i, np.uint8) for i in range(n)]


class TestTargetScale:
    def test_small_face_scales_up_within_bounds(self):
        # 50px face in a 480px frame → wants 3.6x but clamps to 720/480=1.5
        s = target_scale_for_face((0, 0, 50, 50), (480, 640), face_res=180)
        assert s == 1.5

    def test_large_face_scales_down(self):
        s = target_scale_for_face((0, 0, 360, 360), (720, 1280), face_res=180)
        assert 0 < s < 1

    def test_identity_when_face_matches(self):
        s = target_scale_for_face((0, 100, 0, 280), (600, 800), face_res=180)
        assert abs(s - 1.0) < 0.1


class TestRescaleFrames:
    def test_noop_at_unit_scale(self):
        f = frames_of(3)
        assert rescale_frames(f, 1.0) is f

    def test_resizes(self):
        out = rescale_frames(frames_of(2), 0.5)
        assert out[0].shape == (50, 50, 3)


class TestIncreaseFrames:
    def test_already_long_enough_truncates(self):
        out = increase_frames(frames_of(10), 7)
        assert len(out) == 7

    def test_stretches_to_target(self):
        for n, target in [(10, 15), (10, 20), (5, 23), (3, 10)]:
            out = increase_frames(frames_of(n), target)
            assert len(out) == target
            # order preserved: frame values must be non-decreasing
            vals = [int(f[0, 0, 0]) for f in out]
            assert vals == sorted(vals)
            # every original frame still present
            assert set(vals) == set(range(n))

    def test_duplicate_placement_matches_reference_exactly(self):
        """Frame-index-identical to the reference's ceil-accumulator loop
        (real_videos_inference.py:149-167), transliterated here as the
        oracle: duplicates land where ceil(next_duplicate) == i with
        next_duplicate stepping l/len(frames) per source frame."""

        def oracle(frames, l):
            while len(frames) < l:
                dup_every = float(l) / len(frames)
                final_frames = []
                next_duplicate = 0.0
                for i, f in enumerate(frames):
                    final_frames.append(f)
                    if int(np.ceil(next_duplicate)) == i:
                        final_frames.append(f)
                    next_duplicate += dup_every
                frames = final_frames
            return frames[:l]

        for n, target in [(10, 15), (10, 20), (5, 23), (3, 10), (7, 8),
                          (2, 31), (13, 14), (4, 4)]:
            got = [int(f[0, 0, 0])
                   for f in increase_frames(frames_of(n), target)]
            want = [int(f[0, 0, 0]) for f in oracle(frames_of(n), target)]
            assert got == want, (n, target)
