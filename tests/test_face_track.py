"""Face track + crop front end tests (eval.face_track): the in-repo rebuild
of syncnet_python run_pipeline's detection→tracking→crop stage
(calculate_scores_real_videos.sh:6-7 chains it before LSE scoring)."""

import numpy as np
import pytest

from fixtures import synth_face_frame
from wav2lip_tpu.eval.face_track import (
    FaceTrack,
    TrackConfig,
    crop_track,
    slice_audio_to_track,
    track_and_crop,
    track_faces,
)


def box_seq(n, x=40.0, y=30.0, w=60.0, h=60.0, drift=0.5):
    """n frames of one slowly drifting detection box."""
    return [
        [(x + drift * i, y + drift * i, x + w + drift * i, y + h + drift * i)]
        for i in range(n)
    ]


class StubDetector:
    """detect.FaceDetectionPipeline stand-in: returns a fixed full-score box
    per frame, scaled to whatever resolution it is handed (the tracker hands
    it facedet_scale-downscaled frames)."""

    def __init__(self, box_at_full_res, full_hw):
        self.box = np.asarray(box_at_full_res, np.float64)
        self.full_hw = full_hw

    def detect_batch(self, frames):
        h = frames.shape[1]
        s = h / self.full_hw[0]
        b = self.box * s
        return [[(b[0], b[1], b[2], b[3], 0.99)] for _ in range(len(frames))]


class TestTracking:
    def test_single_drifting_track(self):
        cfg = TrackConfig(min_track=50, min_face_size=50.0)
        tracks = track_faces(box_seq(60), cfg)
        assert len(tracks) == 1
        assert len(tracks[0].frames) == 60

    def test_gap_interpolated(self):
        dets = box_seq(60)
        for i in (20, 21, 22):  # missed detections inside the track
            dets[i] = []
        cfg = TrackConfig(min_track=50, min_face_size=50.0)
        tracks = track_faces(dets, cfg)
        assert len(tracks) == 1
        t = tracks[0]
        assert len(t.frames) == 60  # gap filled by interpolation
        # interpolated boxes continue the linear drift exactly
        np.testing.assert_allclose(t.boxes[21][0], 40.0 + 0.5 * 21, atol=1e-6)

    def test_gap_beyond_limit_splits(self):
        dets = box_seq(130)
        for i in range(60, 60 + 30):  # 30 > num_failed_det=25
            dets[i] = []
        cfg = TrackConfig(min_track=30, min_face_size=50.0)
        tracks = track_faces(dets, cfg)
        assert len(tracks) == 2

    def test_short_and_small_tracks_gated(self):
        cfg = TrackConfig(min_track=50, min_face_size=50.0)
        assert track_faces(box_seq(20), cfg) == []  # too short
        small = [[(10.0, 10.0, 30.0, 30.0)] for _ in range(60)]  # 20px face
        assert track_faces(small, cfg) == []

    def test_iou_break_starts_new_track(self):
        a = box_seq(60)
        b = [[(300.0, 200.0, 380.0, 280.0)] for _ in range(60)]  # elsewhere
        cfg = TrackConfig(min_track=50, min_face_size=50.0)
        tracks = track_faces(a + b, cfg)
        assert len(tracks) == 2


class TestCropGeometry:
    def test_square_crop_size_and_center(self):
        """The protocol crop spans s*(2+2*cs) square around the smoothed
        center, so the face sits in the upper-middle of the 224 crop."""
        n = 20
        frames = [np.full((240, 320, 3), 110, np.uint8) for _ in range(n)]
        face = (120.0, 80.0, 200.0, 160.0)  # 80x80 at center (160, 120)
        for f in frames:
            f[80:160, 120:200] = 200
        track = FaceTrack(
            frames=np.arange(n),
            boxes=np.tile(np.asarray(face), (n, 1)),
        )
        crops = crop_track(frames, track, TrackConfig())
        assert len(crops) == n
        assert crops[0].shape == (224, 224, 3)
        # crop width = 2*s*(1+cs) = 80*1.4 = 112 source px -> face (80 px)
        # occupies 80/112 of the width, centered horizontally
        col_bright = (crops[0].mean(axis=(0, 2)) > 150).mean()
        assert 0.6 < col_bright < 0.85


class TestFullSceneEqualsPrecropped:
    def test_tracked_full_scene_matches_precropped_lse(self):
        """VERDICT criterion: a full-scene video with a small OFF-CENTER face
        scores the same LSE-D as its pre-cropped version. The background
        equals the protocol pad value (110), so the tracked crop of the
        full scene is pixel-identical to the tracked crop of the cropped
        clip — embeddings and the whole distance curve must match."""
        import jax

        from wav2lip_tpu.eval.syncnet_protocol import (
            ProtocolSyncNet,
            SyncNetPythonScorer,
        )

        n, fh = 70, 160
        base = [synth_face_frame(fh, fh, t, face_scale=0.9) for t in range(n)]
        oy, ox = 40, 280
        scene = []
        for f in base:
            canvas = np.full((360, 480, 3), 110, np.uint8)
            canvas[oy : oy + fh, ox : ox + fh] = f
            scene.append(canvas)

        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(int(n / 25.0 * 16000))
                 * 3000).astype(np.int16)

        model = ProtocolSyncNet()
        variables = jax.jit(model.init)(
            jax.random.key(0),
            np.zeros((1, 13, 20, 1), np.float32),
            np.zeros((1, 5, 224, 224, 3), np.float32),
        )
        scorer = SyncNetPythonScorer(variables, vshift=5, batch_size=8)
        cfg = TrackConfig(min_track=50, min_face_size=50.0)

        det_scene = StubDetector((ox, oy, ox + fh, oy + fh), (360, 480))
        crops_scene, track_scene = track_and_crop(scene, det_scene, cfg)

        det_crop = StubDetector((0, 0, fh, fh), (fh, fh))
        crops_pre, track_pre = track_and_crop(base, det_crop, cfg)

        assert len(crops_scene) == len(crops_pre) == n
        for a, b in zip(crops_scene, crops_pre):
            np.testing.assert_array_equal(a, b)

        a_scene = slice_audio_to_track(audio, 16000, 25.0, track_scene)
        a_pre = slice_audio_to_track(audio, 16000, 25.0, track_pre)
        np.testing.assert_array_equal(a_scene, a_pre)

        r_scene = scorer.score_arrays(crops_scene, a_scene)
        r_pre = scorer.score_arrays(crops_pre, a_pre)
        assert r_scene.lse_d == pytest.approx(r_pre.lse_d, abs=1e-6)
        assert r_scene.lse_c == pytest.approx(r_pre.lse_c, abs=1e-6)
        assert r_scene.av_offset == r_pre.av_offset
