"""Detection ops tests: jittable NMS vs. a naive transliteration of the
reference's greedy NMS (bbox.py:44-64), anchor decode vs. hand-computed SSD
decoding, and the full pipeline contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from wav2lip_tpu.ops.nms import batched_nms, pairwise_iou
from wav2lip_tpu.ops.anchors import decode_scale, decode_all_scales


def naive_nms(dets: np.ndarray, thresh: float):
    """Reference greedy NMS semantics, re-derived for testing."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return keep


def random_dets(n, rng, size=200.0):
    x1 = rng.uniform(0, size * 0.8, n)
    y1 = rng.uniform(0, size * 0.8, n)
    w = rng.uniform(5, size * 0.3, n)
    h = rng.uniform(5, size * 0.3, n)
    scores = rng.uniform(0.01, 1.0, n)
    return np.stack([x1, y1, x1 + w, y1 + h, scores], axis=1).astype(np.float32)


class TestNMS:
    @pytest.mark.parametrize("n", [1, 5, 32, 100])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_greedy(self, n, seed):
        rng = np.random.default_rng(seed)
        dets = random_dets(n, rng)
        ref_keep = naive_nms(dets, 0.3)

        K = 128
        boxes = np.zeros((1, K, 4), np.float32)
        scores = np.zeros((1, K), np.float32)
        valid = np.zeros((1, K), bool)
        boxes[0, :n] = dets[:, :4]
        scores[0, :n] = dets[:, 4]
        valid[0, :n] = True
        out_boxes, out_scores, num = batched_nms(
            boxes, scores, valid, iou_threshold=0.3, max_out=64
        )
        got_n = int(num[0])
        assert got_n == min(len(ref_keep), 64)
        ref_sorted = dets[ref_keep]  # already score-descending
        np.testing.assert_allclose(
            np.asarray(out_boxes)[0, :got_n], ref_sorted[:got_n, :4], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_scores)[0, :got_n], ref_sorted[:got_n, 4], rtol=1e-5
        )

    def test_invalid_entries_ignored(self):
        boxes = np.zeros((1, 8, 4), np.float32)
        boxes[0, 0] = [0, 0, 10, 10]
        scores = np.full((1, 8), 0.9, np.float32)
        valid = np.zeros((1, 8), bool)
        valid[0, 0] = True
        _, out_scores, num = batched_nms(boxes, scores, valid)
        assert int(num[0]) == 1
        assert float(out_scores[0, 0]) == pytest.approx(0.9)

    def test_iou_plus_one_convention(self):
        # identical 10x10 boxes: IoU exactly 1; shifted beyond: 0
        b = jnp.asarray([[0.0, 0.0, 9.0, 9.0], [20.0, 20.0, 29.0, 29.0]])
        iou = np.asarray(pairwise_iou(b))
        assert iou[0, 0] == pytest.approx(1.0)
        assert iou[0, 1] == 0.0


class TestAnchorDecode:
    def test_identity_decode(self):
        # zero loc regressions → box centered on the anchor with size 4*stride
        stride = 4
        H = W = 4
        cls = np.zeros((1, H, W, 2), np.float32)  # softmax → 0.5
        loc = np.zeros((1, H, W, 4), np.float32)
        scores, boxes = decode_scale(jnp.asarray(cls), jnp.asarray(loc), stride)
        scores, boxes = np.asarray(scores), np.asarray(boxes)
        assert scores.shape == (1, 16) and boxes.shape == (1, 16, 4)
        np.testing.assert_allclose(scores, 0.5)
        # anchor (0,0): center (2,2), wh 16 → [-6,-6,10,10]
        np.testing.assert_allclose(boxes[0, 0], [-6, -6, 10, 10], atol=1e-5)
        # anchor (h=1, w=2): center x=2+2*4=10, y=2+4=6
        idx = 1 * W + 2
        np.testing.assert_allclose(boxes[0, idx], [2, -2, 18, 14], atol=1e-5)

    def test_ssd_variance_decode(self):
        stride = 8
        cls = np.zeros((1, 1, 1, 2), np.float32)
        cls[..., 1] = 3.0  # face logit
        loc = np.asarray([[[[0.5, -0.25, np.log(2.0) / 0.2, 0.0]]]], np.float32)
        scores, boxes = decode_scale(jnp.asarray(cls), jnp.asarray(loc), stride)
        # center (4,4); cx = 4 + 0.5*0.1*32 = 5.6; cy = 4 - 0.25*0.1*32 = 3.2
        # w = 32 * exp(log(2)) = 64, h = 32
        np.testing.assert_allclose(
            np.asarray(boxes)[0, 0],
            [5.6 - 32, 3.2 - 16, 5.6 + 32, 3.2 + 16],
            rtol=1e-5,
        )
        assert float(scores[0, 0]) == pytest.approx(
            1 / (1 + np.exp(-3.0)), rel=1e-5
        )

    def test_all_scales_concat(self):
        heads = []
        sizes = [(32, 32), (16, 16), (8, 8), (8, 8), (4, 4), (2, 2)]
        for h, w in sizes:
            heads.append(
                (jnp.zeros((2, h, w, 2)), jnp.zeros((2, h, w, 4)))
            )
        scores, boxes = decode_all_scales(heads)
        total = sum(h * w for h, w in sizes)
        assert scores.shape == (2, total)
        assert boxes.shape == (2, total, 4)


class TestDetectorMesh:
    def test_mesh_matches_single_device(self):
        """Data-parallel detection over a 4-device mesh must produce the
        same boxes as the single-device path (all per-frame math; the mesh
        only splits the batch — the TPU-native analogue of the reference's
        one-detector-per-GPU fan-out, preprocess.py:96-99)."""
        import jax

        from wav2lip_tpu.config import DEFAULT_CONFIG
        from wav2lip_tpu.detect import FaceDetectionPipeline
        from wav2lip_tpu.models import S3FD
        from wav2lip_tpu.parallel import make_mesh

        res = 128
        det_vars = jax.jit(S3FD().init)(
            jax.random.key(0), np.zeros((1, res, res, 3), np.float32)
        )
        r = np.random.default_rng(0)
        frames = (r.random((8, res, res, 3)) * 255).astype(np.uint8)

        single = FaceDetectionPipeline(det_vars, DEFAULT_CONFIG.detect,
                                       batch_size=8)
        mesh = make_mesh(jax.devices()[:4])
        parallel = FaceDetectionPipeline(det_vars, DEFAULT_CONFIG.detect,
                                         batch_size=8, mesh=mesh)
        a = single.detect_batch(frames)
        b = parallel.detect_batch(frames)
        assert len(a) == len(b) == 8
        for da, db in zip(a, b):
            assert len(da) == len(db)
            for ra, rb in zip(da, db):
                np.testing.assert_allclose(ra, rb, rtol=1e-5, atol=1e-4)

    def test_mesh_rejects_indivisible_batch(self):
        import jax

        from wav2lip_tpu.config import DEFAULT_CONFIG
        from wav2lip_tpu.detect import FaceDetectionPipeline
        from wav2lip_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="must be a multiple"):
            FaceDetectionPipeline({}, DEFAULT_CONFIG.detect, batch_size=6,
                                  mesh=make_mesh(jax.devices()[:4]))


class TestDetectDownscale:
    """Detection-resolution downscale (DetectConfig.downscale): frames are
    host-resized 1/f before upload and boxes rescaled f after — f^2 fewer
    trunk FLOPs and f^2 less link traffic for the full-detector path."""

    def _pipe(self, **cfg_kw):
        import dataclasses

        import jax

        from wav2lip_tpu.config import DEFAULT_CONFIG
        from wav2lip_tpu.detect import FaceDetectionPipeline
        from wav2lip_tpu.models import S3FD

        det_vars = jax.jit(S3FD().init)(
            jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32)
        )
        cfg = dataclasses.replace(DEFAULT_CONFIG.detect, **cfg_kw)
        return FaceDetectionPipeline(det_vars, cfg, batch_size=4)

    def test_auto_factor_selection(self):
        p = self._pipe(downscale=0, downscale_max_side=640)
        assert p.downscale_factor(480, 640) == 1   # already small enough
        assert p.downscale_factor(720, 1280) == 2  # 1280 -> 640
        assert p.downscale_factor(1080, 1920) == 3  # 1920 -> 640
        assert p.downscale_factor(2160, 3840) == 6
        off = self._pipe(downscale=1)
        assert off.downscale_factor(1080, 1920) == 1
        fixed = self._pipe(downscale=4)
        assert fixed.downscale_factor(480, 640) == 4

    def test_in_graph_decimation_and_box_rescale(self):
        """The jitted graph receives FULL-resolution frames plus the static
        factor (decimation runs on device, not the host) and must mean-pool
        to 1/f before the trunk; returned boxes come back in source-frame
        coordinates (x f)."""
        import jax.numpy as jnp

        p = self._pipe(downscale=2)
        seen = []
        real_fn = p._detect_fn

        def spy_detect(variables, parts, factor):
            # what resolution does the trunk see? re-run the decimation
            # prefix of the real graph to find out
            x = jnp.concatenate([jnp.asarray(q) for q in parts], axis=0)
            b, h, w, c = x.shape
            hh, ww = (h // factor) * factor, (w // factor) * factor
            pooled = x[:, :hh, :ww].astype(np.float32).reshape(
                b, hh // factor, factor, ww // factor, factor, c
            ).mean(axis=(2, 4))
            seen.append((factor, (h, w), pooled.shape[1:3]))
            total = b
            boxes = np.zeros((total, 16, 4), np.float32)
            boxes[:, 0] = [4.0, 6.0, 20.0, 30.0]  # downscaled coords
            scores = np.zeros((total, 16), np.float32)
            scores[:, 0] = 0.9
            num = np.ones(total, np.int64)
            return boxes, scores, num

        p._jit_detect = spy_detect
        frames = np.zeros((3, 64, 96, 3), np.uint8)
        dets = p.detect_batch(frames)
        assert seen == [(2, (64, 96), (32, 48))]
        assert len(dets) == 3
        np.testing.assert_allclose(dets[0][0][:4], (8.0, 12.0, 40.0, 60.0))
        assert dets[0][0][4] == pytest.approx(0.9)
        del real_fn

    def test_device_decimation_matches_inter_area(self):
        """The in-graph f x f mean pool is numerically cv2 INTER_AREA for
        integer factors (the protocol-faithful downscale), up to uint8
        rounding."""
        import cv2
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (1, 64, 96, 3), np.uint8)
        f = 2
        x = jnp.asarray(img).astype(jnp.float32)
        pooled = np.asarray(
            x.reshape(1, 32, f, 48, f, 3).mean(axis=(2, 4))
        )[0]
        area = cv2.resize(img[0], (48, 32), interpolation=cv2.INTER_AREA)
        assert np.abs(pooled - area.astype(np.float32)).max() <= 0.5 + 1e-4

    def test_downscale_boxes_close_to_fullres(self):
        """With a smooth synthetic 'detector response', half-res detection
        plus rescale lands within a couple of pixels of full-res — the
        box is consumed as a padded, smoothed 96x96 crop window so this
        drift is invisible downstream (inference.py:59-66,121-154)."""
        import dataclasses

        full = self._pipe(downscale=1)
        half = self._pipe(downscale=2)

        def responder(scale):
            def fake(variables, parts, factor):
                h, w = np.asarray(parts[0]).shape[1:3]
                h, w = h // factor, w // factor  # trunk-visible resolution
                total = sum(np.asarray(q).shape[0] for q in parts)
                boxes = np.zeros((total, 16, 4), np.float32)
                # a "face" covering the central half of whatever resolution
                # the trunk saw, like a real scale-equivariant detector
                boxes[:, 0] = [w * 0.25, h * 0.25, w * 0.75, h * 0.75]
                scores = np.zeros((total, 16), np.float32)
                scores[:, 0] = 0.9
                return boxes, scores, np.ones(total, np.int64)
            return fake

        full._jit_detect = responder(1)
        half._jit_detect = responder(2)
        frames = np.zeros((2, 128, 192, 3), np.uint8)
        a = np.asarray(full.first_face_boxes(frames), np.float64)
        b = np.asarray(half.first_face_boxes(frames), np.float64)
        assert np.abs(a - b).max() <= 2.0


from fixtures import pixel_stub_detector as _pixel_detector  # noqa: E402


class TestDetectBatchWindow:
    def test_inflight_window_preserves_order(self):
        """detect_batch dispatches sub-batches behind a 3-deep in-flight
        window; per-frame results must still come back in frame order, with
        the padded tail discarded."""
        from wav2lip_tpu.config import DEFAULT_CONFIG
        from wav2lip_tpu.detect import FaceDetectionPipeline

        det = FaceDetectionPipeline(
            {"params": {"w": np.zeros((1,), np.float32)}},
            DEFAULT_CONFIG.detect, batch_size=4,
        )
        calls = []

        def stub(variables, parts, factor=1):
            x = np.concatenate([np.asarray(q) for q in parts], axis=0)
            calls.append(x.shape[0])
            total = x.shape[0]
            boxes = np.zeros((total, 16, 4), np.float32)
            scores = np.zeros((total, 16), np.float32)
            num = np.ones(total, np.int64)
            # encode each frame's identity (its mean brightness) in x1
            boxes[:, 0, 0] = x.reshape(total, -1).mean(axis=1)
            scores[:, 0] = 0.9
            return boxes, scores, num

        det._jit_detect = stub
        n = 11  # 3 sub-batches: 4 + 4 + 3(padded to 4)
        frames = np.stack([
            np.full((32, 32, 3), 10 * (i + 1), np.uint8) for i in range(n)
        ])
        dets = det.detect_batch(frames)
        assert calls == [4, 4, 4]
        assert len(dets) == n
        for i, d in enumerate(dets):
            assert d[0][0] == pytest.approx(10 * (i + 1))


class TestRoiTracking:
    """ROI-tracked first_face_boxes (DetectConfig.roi_track): keyframe
    full-frame detection, then small-crop tracking with full-frame fallback
    — the small-upload mode that keeps detection fast when the host-device
    link degrades under bidirectional traffic."""

    def _pipe(self, **cfg_kw):
        import dataclasses

        import jax

        from wav2lip_tpu.config import DEFAULT_CONFIG
        from wav2lip_tpu.detect import FaceDetectionPipeline
        from wav2lip_tpu.models import S3FD

        det_vars = jax.jit(S3FD().init)(
            jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32)
        )
        cfg = dataclasses.replace(
            DEFAULT_CONFIG.detect, roi_track=True, downscale=1, **cfg_kw)
        p = FaceDetectionPipeline({}, cfg, batch_size=8)
        p.variables = det_vars  # unused by the stub
        p._jit_detect = _pixel_detector
        return p

    @staticmethod
    def _moving_face_frames(n=30, h=240, w=320, size=60):
        frames = np.zeros((n, h, w, 3), np.uint8)
        truth = []
        for t in range(n):
            x = 40 + 2 * t  # drifts right 2 px/frame
            y = 60 + t
            frames[t, y : y + size, x : x + size] = 200
            truth.append((x, y, x + size, y + size))
        return frames, truth

    def test_roi_matches_fullframe(self):
        from wav2lip_tpu.detect import RoiTracker

        frames, truth = self._moving_face_frames()
        p = self._pipe()
        tracked = p.first_face_boxes(frames, tracker=RoiTracker())
        full = p.first_face_boxes(frames)
        assert None not in tracked
        t = np.asarray(tracked, np.float64)
        f = np.asarray(full, np.float64)
        # sub-pixel-to-low-single-digit drift from the ROI resize roundtrip
        assert np.abs(t - f).max() <= 3.0
        assert np.abs(t - np.asarray(truth, np.float64)).max() <= 3.0

    def test_roi_uses_small_crops_after_keyframe(self):
        from wav2lip_tpu.detect import RoiTracker

        frames, _ = self._moving_face_frames(n=20)
        p = self._pipe(roi_out=96)
        seen = []
        inner = p._jit_detect

        def spy(variables, parts, factor=1):
            seen.append(np.asarray(parts[0]).shape[1:3])
            return inner(variables, parts, factor)

        p._jit_detect = spy
        p.first_face_boxes(frames, tracker=RoiTracker())
        assert seen[0] == (240, 320)        # keyframe: full frame
        assert all(s == (96, 96) for s in seen[1:])  # tracked: tiny crops

    def test_teleport_triggers_fullframe_fallback(self):
        from wav2lip_tpu.detect import RoiTracker

        h, w, size = 240, 320, 50
        frames = np.zeros((12, h, w, 3), np.uint8)
        for t in range(12):
            if t < 6:
                x, y = 30, 40
            else:
                x, y = 240, 170  # far outside any ROI around (30, 40)
            frames[t, y : y + size, x : x + size] = 200
        p = self._pipe()
        out = p.first_face_boxes(frames, tracker=RoiTracker())
        assert None not in out
        assert out[5][:2] == (30, 40)
        assert abs(out[6][0] - 240) <= 2 and abs(out[6][1] - 170) <= 2

    def test_faceless_frame_reports_none(self):
        from wav2lip_tpu.detect import RoiTracker

        frames, _ = self._moving_face_frames(n=8)
        frames[4:] = 0  # face disappears entirely
        p = self._pipe()
        out = p.first_face_boxes(frames, tracker=RoiTracker())
        assert None not in out[:4]
        assert out[4] is None

    def test_two_face_score_flip_reanchors_at_keyframe(self):
        """Multi-face semantics delta of ROI tracking (documented in
        DetectConfig.roi_track): the reference re-picks the HIGHEST-SCORE
        face every frame (api.py:69-78), while the tracked path follows the
        previous face between keyframes. With two faces whose score order
        flips mid-span, the tracked output must (a) match the reference
        choice before the flip, (b) diverge for AT MOST roi_refresh_every
        frames, and (c) re-anchor to the reference's (new) choice at the
        next keyframe."""
        from wav2lip_tpu.detect import RoiTracker

        h, w, size = 240, 320, 50
        ax, ay, bx, by = 30, 60, 230, 120  # face A left, face B right
        flip_at, refresh = 10, 8
        n = 30
        frames = np.zeros((n, h, w, 3), np.uint8)
        for t in range(n):
            bright_a, bright_b = (220, 140) if t < flip_at else (140, 220)
            frames[t, ay : ay + size, ax : ax + size] = bright_a
            frames[t, by : by + size, bx : bx + size] = bright_b

        def two_face_stub(variables, parts, factor=1):
            """Score ∝ brightness: >180 → 0.9, (100, 180] → 0.6; boxes
            returned score-descending (the detector contract)."""
            x = np.concatenate([np.asarray(q) for q in parts], axis=0)
            if factor > 1:
                x = x[:, ::factor, ::factor]
            total = x.shape[0]
            boxes = np.zeros((total, 16, 4), np.float32)
            scores = np.zeros((total, 16), np.float32)
            num = np.zeros(total, np.int64)
            for i in range(total):
                lum = x[i].max(axis=-1)
                found = []
                for lo, hi, sc in ((180, 256, 0.9), (100, 180, 0.6)):
                    ys, xs = np.where((lum > lo) & (lum < hi))
                    if len(ys) >= 4:
                        found.append(([xs.min(), ys.min(),
                                       xs.max() + 1, ys.max() + 1], sc))
                for k, (b, sc) in enumerate(found):
                    boxes[i, k] = b
                    scores[i, k] = sc
                num[i] = len(found)
            return boxes, scores, num

        p = self._pipe(roi_refresh_every=refresh)
        p._jit_detect = two_face_stub
        tracked = p.first_face_boxes(frames, tracker=RoiTracker())
        reference = p.first_face_boxes(frames)  # untracked: per-frame argmax

        def which(box):
            return "A" if box[0] < w // 2 else "B"

        ref_faces = [which(b) for b in reference]
        got_faces = [which(b) for b in tracked]
        # the reference path flips exactly at the score flip
        assert ref_faces == ["A"] * flip_at + ["B"] * (n - flip_at)
        # (a) identical before the flip
        assert got_faces[:flip_at] == ref_faces[:flip_at]
        # (b) divergence bounded by the keyframe cadence
        diverged = [i for i in range(n) if got_faces[i] != ref_faces[i]]
        assert diverged, "tracked path unexpectedly flipped mid-span"
        assert len(diverged) <= refresh
        assert max(diverged) - min(diverged) < refresh
        # (c) re-anchored to the reference choice at the next keyframe
        # (keyframes at 0, refresh+1 cadence: since_refresh hits the limit)
        first_keyframe_after_flip = next(
            i for i in range(flip_at, n) if i not in diverged
        )
        assert got_faces[first_keyframe_after_flip:] == (
            ref_faces[first_keyframe_after_flip:]
        )

    def test_periodic_keyframe_refresh(self):
        from wav2lip_tpu.detect import RoiTracker

        frames, _ = self._moving_face_frames(n=20)
        p = self._pipe(roi_refresh_every=5)
        seen = []
        inner = p._jit_detect

        def spy(variables, parts, factor=1):
            seen.append(np.asarray(parts[0]).shape[1:3])
            return inner(variables, parts, factor)

        p._jit_detect = spy
        p.first_face_boxes(frames, tracker=RoiTracker())
        fulls = sum(1 for s in seen if s == (240, 320))
        assert fulls == 4  # frames 0, 6, 12, 18 — re-anchor every 5 tracked

    def test_roi_window_snaps_with_motion_margin(self):
        """Window sizing (_roi_window): the snapped side is the smallest
        roi_out multiple >= roi_scale x face (capped in-frame), never the
        barely-covering multiple — the speculative span reuses one window
        for a whole keyframe gap, so the margin is the motion budget."""
        p = self._pipe(roi_out=128, roi_scale=2.2)
        # face 60 px in a 600x800 frame: 2.2x60=132 -> smallest multiple
        # of 128 that covers it is 256, and the frame fits it
        x0, y0, side = p._roi_window((100, 100, 160, 160), 600, 800)
        assert side == 256
        assert (x0, y0) == (2, 2)  # centered on (130, 130)
        # face 360 px in 720p: 2.2x needs 792 -> 7 multiples, frame caps at
        # 5 (640), still >= 1.1x face -> snapped
        _, _, side = p._roi_window((200, 100, 560, 460), 720, 1280)
        assert side == 640
        # face too large for any multiple: exact clamped side
        _, _, side = p._roi_window((0, 0, 230, 230), 240, 320)
        assert side == 240

    def test_edge_clipped_box_triggers_fallback(self):
        """A detection clamped at an interior window edge (the face moved
        partly out of the stale window) must re-detect full-frame, not
        return the clipped box (_box_clips_roi)."""
        p = self._pipe(roi_out=128)
        # interior edges: window (10, 10, side 128) inside 600x800
        clips = lambda rb: p._box_clips_roi(rb, 10, 10, 128, 600, 800)
        assert not clips((30.0, 30.0, 90.0, 90.0))      # interior box
        assert clips((0.5, 30.0, 90.0, 90.0))           # left edge
        assert clips((30.0, 30.0, 127.5, 90.0))         # right edge
        assert clips((30.0, 0.2, 90.0, 90.0))           # top edge
        assert clips((30.0, 30.0, 90.0, 127.9))         # bottom edge
        # window edges that lie ON the frame boundary are exempt — a face
        # near the border always touches them
        assert not p._box_clips_roi((0.5, 30.0, 90.0, 90.0),
                                    0, 10, 128, 600, 800)
        assert not p._box_clips_roi((30.0, 30.0, 127.9, 90.0),
                                    800 - 128, 10, 128, 600, 800)

    def test_walking_face_stays_correct_past_window(self):
        """A face that outruns the speculative window degrades to
        slow-but-correct: every post-exit frame falls back to full-frame
        detection, so boxes keep tracking the truth (no silent clipping).
        Guards the regression the 1.1x snap rule allowed."""
        from wav2lip_tpu.detect import RoiTracker

        h, w, size, n = 240, 320, 60, 40
        frames = np.zeros((n, h, w, 3), np.uint8)
        truth = []
        for t in range(n):
            x, y = 30 + 4 * t, 90  # 4 px/frame: exits any in-frame window
            frames[t, y : y + size, x : x + size] = 200
            truth.append((x, y, x + size, y + size))
        p = self._pipe()
        out = p.first_face_boxes(frames, tracker=RoiTracker())
        assert None not in out
        err = np.abs(np.asarray(out, np.float64)
                     - np.asarray(truth, np.float64)).max()
        assert err <= 3.0, err


class TestDispatchAhead:
    """Pipelined ROI-tracked detection (round-5 detect-leg RTT cuts): the
    keyframe pre-dispatch (begin_keyframe) and the chunk dispatch/fetch
    split (begin_tracked / finish_tracked) must return exactly the boxes
    the synchronous path returns — they reorder link traffic, not math."""

    # reuse the stubbed pipe + fixture frames, not the parent's test set
    _pipe = TestRoiTracking._pipe
    _moving_face_frames = staticmethod(TestRoiTracking._moving_face_frames)

    def test_keyframe_prefetch_parity_and_single_dispatch(self):
        from wav2lip_tpu.detect import RoiTracker

        frames, _ = self._moving_face_frames(n=16)
        p = self._pipe()
        want = p.first_face_boxes(frames, tracker=RoiTracker())

        p2 = self._pipe()
        fullframe_calls = []
        inner = p2._jit_detect

        def spy(variables, parts, factor=1):
            if np.asarray(parts[0]).shape[1:3] == frames.shape[1:3]:
                fullframe_calls.append(1)
            return inner(variables, parts, factor)

        p2._jit_detect = spy
        tr = RoiTracker()
        p2.begin_keyframe(frames[0], tr)
        assert tr.pending_keyframe is not None
        got = p2.first_face_boxes(frames, tracker=tr)
        assert got == want
        assert tr.pending_keyframe is None
        # the pre-dispatched keyframe was CONSUMED, not re-detected
        assert len(fullframe_calls) == 1
        # warm-tracker begin_keyframe is a no-op
        p2.begin_keyframe(frames[0], tr)
        assert tr.pending_keyframe is None

    def test_pipelined_chunks_match_synchronous(self):
        """Dispatch chunk B before fetching chunk A (the _AsyncBoxes
        lookahead order) — results equal the synchronous span path."""
        from wav2lip_tpu.detect import RoiTracker

        frames, _ = self._moving_face_frames(n=25)
        p = self._pipe()
        want = p.first_face_boxes(frames, tracker=RoiTracker())

        tr = RoiTracker()
        head = p.first_face_boxes(frames[:1], tracker=tr)  # keyframe
        pa = p.begin_tracked(frames[1:13], tr)
        pb = p.begin_tracked(frames[13:25], tr)  # dispatched before A fetched
        assert pa["taken"] == 12 and pb["taken"] == 12
        assert tr.inflight == 24
        got_a = p.finish_tracked(frames[1:13], pa, tr)
        got_b = p.finish_tracked(frames[13:25], pb, tr)
        assert tr.inflight == 0
        assert head + got_a + got_b == want

    def test_begin_tracked_budget_and_gates(self):
        from wav2lip_tpu.detect import RoiTracker

        frames, _ = self._moving_face_frames(n=30)
        p = self._pipe(roi_refresh_every=10)
        tr = RoiTracker()
        assert p.begin_tracked(frames, tr) is None  # cold tracker
        p.first_face_boxes(frames[:1], tracker=tr)  # keyframe warms it
        # a pending keyframe (stale contract) blocks dispatch-ahead
        tr.pending_keyframe = ("sentinel", 1.0)
        assert p.begin_tracked(frames[1:], tr) is None
        tr.pending_keyframe = None
        pend = p.begin_tracked(frames[1:], tr)
        assert pend["taken"] == 10  # capped at the refresh budget
        assert p.begin_tracked(frames[11:], tr) is None  # budget in flight
        p.finish_tracked(frames[1:11], pend, tr)
        # budget consumed by since_refresh now: next frame needs a keyframe
        assert p.begin_tracked(frames[11:], tr) is None
        rest = p.first_face_boxes(frames[11:], tracker=tr)
        assert None not in rest
