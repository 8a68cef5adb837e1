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

    def test_frames_downscaled_and_boxes_rescaled(self):
        """The jitted graph must see 1/f-resolution frames; returned boxes
        must come back in source-frame coordinates (x f)."""
        p = self._pipe(downscale=2)
        seen_shapes = []

        def fake_detect(variables, parts):
            total = sum(np.asarray(q).shape[0] for q in parts)
            h, w = np.asarray(parts[0]).shape[1:3]
            seen_shapes.append((h, w))
            boxes = np.zeros((total, 16, 4), np.float32)
            boxes[:, 0] = [4.0, 6.0, 20.0, 30.0]  # downscaled coords
            scores = np.zeros((total, 16), np.float32)
            scores[:, 0] = 0.9
            num = np.ones(total, np.int64)
            return boxes, scores, num

        p._jit_detect = fake_detect
        frames = np.zeros((3, 64, 96, 3), np.uint8)
        dets = p.detect_batch(frames)
        assert seen_shapes == [(32, 48)]
        assert len(dets) == 3
        np.testing.assert_allclose(dets[0][0][:4], (8.0, 12.0, 40.0, 60.0))
        assert dets[0][0][4] == pytest.approx(0.9)

    def test_downscale_boxes_close_to_fullres(self):
        """With a smooth synthetic 'detector response', half-res detection
        plus rescale lands within a couple of pixels of full-res — the
        box is consumed as a padded, smoothed 96x96 crop window so this
        drift is invisible downstream (inference.py:59-66,121-154)."""
        import dataclasses

        full = self._pipe(downscale=1)
        half = self._pipe(downscale=2)

        def responder(scale):
            def fake(variables, parts):
                h, w = np.asarray(parts[0]).shape[1:3]
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
