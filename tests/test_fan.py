"""FAN landmark stack tests (SURVEY §2 component #10): parameter parity with
the reference torch definitions, torch-output parity through the checkpoint
importer, and exact-parity of the heatmap decode / crop geometry against the
reference's own utils (face_detection/models.py, face_detection/utils.py)."""

import os

import jax
import numpy as np
import pytest

from wav2lip_tpu.convert import import_fan, import_resnet_depth
from wav2lip_tpu.detect.landmarks import (
    LandmarkPipeline,
    box_to_center_scale,
    crop_face,
    transform_points,
)
from wav2lip_tpu.models import FAN, ResNetDepth, heatmaps_to_landmarks

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "face_detection"))


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def ref_fan():
    if not HAS_REF:
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from face_detection.models import FAN as TorchFAN
    from face_detection.models import ResNetDepth as TorchResNetDepth
    from face_detection import utils as ref_utils

    torch.manual_seed(0)
    return {"torch": torch, "FAN": TorchFAN, "ResNetDepth": TorchResNetDepth,
            "utils": ref_utils}


class TestParamParity:
    def test_fan4_param_count(self, ref_fan):
        tmodel = ref_fan["FAN"](4)
        ref_n = sum(p.numel() for p in tmodel.parameters())
        shapes = jax.eval_shape(
            FAN(num_modules=4).init, jax.random.key(0),
            np.zeros((1, 64, 64, 3), np.float32))
        assert _count(shapes["params"]) == ref_n

    def test_resnet_depth_param_count(self, ref_fan):
        tmodel = ref_fan["ResNetDepth"]()
        ref_n = sum(p.numel() for p in tmodel.parameters())
        shapes = jax.eval_shape(
            ResNetDepth().init, jax.random.key(0),
            np.zeros((1, 224, 224, 71), np.float32))
        assert _count(shapes["params"]) == ref_n


class TestTorchParity:
    def test_fan_outputs_match(self, ref_fan):
        torch = ref_fan["torch"]
        tmodel = ref_fan["FAN"](2).eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        variables = import_fan(sd)

        r = np.random.default_rng(3)
        # 128² input (any multiple of the hourglass's 64x stride works)
        x_t = r.random((1, 3, 128, 128)).astype(np.float32)
        with torch.no_grad():
            ref_outs = [o.numpy() for o in tmodel(torch.from_numpy(x_t))]
        got = jax.jit(FAN(num_modules=2).apply)(
            variables, np.transpose(x_t, (0, 2, 3, 1)))
        assert len(got) == len(ref_outs) == 2
        for g, ref in zip(got, ref_outs):
            g = np.transpose(np.asarray(g), (0, 3, 1, 2))
            assert g.shape == ref.shape  # (1, 68, 32, 32)
            np.testing.assert_allclose(g, ref, atol=3e-5)

    def test_resnet_depth_outputs_match(self, ref_fan):
        torch = ref_fan["torch"]
        from face_detection.models import Bottleneck

        tmodel = ref_fan["ResNetDepth"](
            block=Bottleneck, layers=[1, 1, 1, 1]).eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        variables = import_resnet_depth(sd)

        r = np.random.default_rng(4)
        x_t = r.random((2, 71, 224, 224)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x_t)).numpy()
        got = np.asarray(jax.jit(ResNetDepth(layers=(1, 1, 1, 1)).apply)(
            variables, np.transpose(x_t, (0, 2, 3, 1))))
        assert got.shape == ref.shape == (2, 68)
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestDecodeParity:
    def test_heatmap_decode_matches_reference(self, ref_fan):
        torch = ref_fan["torch"]
        r = np.random.default_rng(5)
        hm = r.standard_normal((2, 68, 64, 64)).astype(np.float32)
        ref_preds, _ = ref_fan["utils"].get_preds_fromhm(torch.from_numpy(hm))
        got = np.asarray(jax.jit(heatmaps_to_landmarks)(
            np.transpose(hm, (0, 2, 3, 1))))
        np.testing.assert_allclose(got, ref_preds.numpy(), atol=1e-6)

    def test_transform_matches_reference(self, ref_fan):
        center, scale = np.array([123.0, 87.0]), 1.7
        for invert in (False, True):
            pts = np.array([[5.0, 9.0], [63.5, 0.25], [31.0, 31.0]])
            ref = np.stack([
                ref_fan["utils"].transform(list(p), center, scale, 64.0,
                                           invert).numpy()
                for p in pts
            ])
            got = transform_points(pts, center, scale, 64.0, invert=invert)
            np.testing.assert_array_equal(got, ref.astype(np.int32))

    def test_transform_fuzz_vs_float32_inverse(self, ref_fan):
        """Property test for the documented numerics delta: the float64
        closed-form inverse vs the reference's float32 torch.inverse +
        truncation (utils.py:84-89). Over random (center, scale, point) the
        two must agree to within 1 px (the truncation-boundary flip), and
        disagree only rarely."""
        r = np.random.default_rng(42)
        n, mismatches = 400, 0
        for _ in range(n):
            center = r.uniform(5.0, 500.0, size=2)
            scale = float(r.uniform(0.3, 3.0))
            pts = r.uniform(0.0, 64.0, size=(3, 2))
            for invert in (False, True):
                ref = np.stack([
                    ref_fan["utils"].transform(list(p), center, scale,
                                               64.0, invert).numpy()
                    for p in pts
                ]).astype(np.int64)
                got = transform_points(pts, center, scale, 64.0,
                                       invert=invert).astype(np.int64)
                diff = np.abs(got - ref)
                assert diff.max() <= 1, (center, scale, pts, got, ref)
                mismatches += int((diff > 0).sum())
        # boundary flips are a measure-zero corner case; random inputs
        # should virtually never land on one
        assert mismatches <= n * 0.02 * 12, mismatches

    def test_crop_matches_reference(self, ref_fan):
        r = np.random.default_rng(6)
        img = r.integers(0, 255, (180, 240, 3), np.uint8)
        center, scale = np.array([120.0, 80.0]), 0.9
        ref = ref_fan["utils"].crop(img, center, scale, resolution=256.0)
        got = crop_face(img, center, scale, resolution=256)
        np.testing.assert_array_equal(got, ref)


class TestLandmarkPipeline:
    def test_end_to_end_shapes_and_peak(self):
        variables = jax.jit(FAN(num_modules=1).init)(
            jax.random.key(0), np.zeros((1, 256, 256, 3), np.float32))
        pipe = LandmarkPipeline(variables, num_modules=1, batch_size=4)
        r = np.random.default_rng(7)
        frames = r.integers(0, 255, (3, 180, 320, 3), np.uint8)
        boxes = [(80.0, 40.0, 200.0, 160.0), None, (10.0, 10.0, 90.0, 90.0)]
        out = pipe.landmarks_from_frames(frames, boxes)
        assert out[1] is None
        assert out[0].shape == (68, 2) and out[0].dtype == np.int32
        # decode must point at the per-channel heatmap argmax (±0.75 px in
        # heatmap space before the crop affine)
        crops = np.stack([crop_face(frames[0],
                                    *box_to_center_scale(boxes[0]))])
        pts = pipe.landmarks_from_crops(crops)
        hm = np.asarray(FAN(num_modules=1).apply(
            variables, crops.astype(np.float32) / 255.0)[-1])
        flat = hm[0].reshape(-1, 68)
        py, px = np.unravel_index(np.argmax(flat, axis=0), hm.shape[1:3])
        np.testing.assert_allclose(pts[0, :, 0], px + 0.5, atol=0.75)
        np.testing.assert_allclose(pts[0, :, 1], py + 0.5, atol=0.75)

    def test_flip_input_consistency(self):
        variables = jax.jit(FAN(num_modules=1).init)(
            jax.random.key(1), np.zeros((1, 256, 256, 3), np.float32))
        pipe = LandmarkPipeline(variables, num_modules=1, batch_size=2,
                                flip_input=True)
        r = np.random.default_rng(8)
        crops = r.integers(0, 255, (2, 256, 256, 3), np.uint8)
        pts = pipe.landmarks_from_crops(crops)
        assert pts.shape == (2, 68, 2)
        assert np.all(pts >= 0) and np.all(pts < 64)
