"""Preprocess CLI tests (reference: preprocess.py).

Covers the training-dataset builder that had no coverage of its own: the
index-gap semantics for undetected frames (preprocess.py:61-67), the output
tree layout (preprocessed_root/{speaker}/{vid}/{idx}.jpg), host shard
slicing (--shard/--num_shards, the multi-host replacement for the
reference's one-detector-per-GPU thread pool, preprocess.py:96-99), and the
CLI main() end to end over synthetic videos with the real
FaceDetectionPipeline host logic driven by the pixel stub detector.
"""

import os
from glob import glob
from os.path import isdir, join

import cv2
import numpy as np
import pytest

from fixtures import make_video, pixel_stub_detector

from wav2lip_tpu.cli.preprocess import main, out_dir_for, process_video


class _StubDetector:
    """first_face_boxes lookalike: a fixed box, with chosen frame indices
    reported undetected (None)."""

    def __init__(self, miss=(), box=(2, 3, 40, 41)):
        self.miss = set(miss)
        self.box = box
        self.seen = 0

    def first_face_boxes(self, batch):
        out = []
        for j in range(len(batch)):
            idx = self.seen + j
            out.append(None if idx in self.miss else self.box)
        self.seen += len(batch)
        return out


class TestProcessVideo:
    def test_index_gaps_and_crop_layout(self, tmp_path):
        """Undetected frames are SKIPPED, leaving index gaps — downstream
        window sampling depends on the gap staying a gap
        (preprocess.py:63-64; wav2lip_train.py window rejection)."""
        vfile = join(str(tmp_path), "spkA", "v1.mp4")
        os.makedirs(join(str(tmp_path), "spkA"))
        make_video(vfile, num_frames=12)
        out_root = join(str(tmp_path), "prep")
        det = _StubDetector(miss=(5,))

        written = process_video(vfile, det, out_root, batch_size=8)

        d = out_dir_for(vfile, out_root)
        assert d == join(out_root, "spkA", "v1")
        names = sorted(os.listdir(d))
        assert written == 11 and len(names) == 11
        assert "5.jpg" not in names          # the gap
        assert "0.jpg" in names and "11.jpg" in names
        img = cv2.imread(join(d, "0.jpg"))
        # crop extent == box extent (x1,y1,x2,y2) = (2,3,40,41)
        assert img.shape == (38, 38, 3)

    def test_crosses_batch_boundaries(self, tmp_path):
        """Frame indexing must stay global across detector batches."""
        vfile = join(str(tmp_path), "s", "v.mp4")
        os.makedirs(join(str(tmp_path), "s"))
        make_video(vfile, num_frames=10)
        det = _StubDetector(miss=(0, 9))
        written = process_video(vfile, det, join(str(tmp_path), "p"),
                                batch_size=4)
        names = sorted(os.listdir(join(str(tmp_path), "p", "s", "v")))
        assert written == 8
        assert "0.jpg" not in names and "9.jpg" not in names
        assert "4.jpg" in names  # second batch, global index preserved


@pytest.fixture()
def data_root(tmp_path):
    root = join(str(tmp_path), "raw")
    for spk, vid in (("spk0", "a"), ("spk1", "b")):
        os.makedirs(join(root, spk), exist_ok=True)
        make_video(join(root, spk, f"{vid}.mp4"), num_frames=8)
    return root


@pytest.fixture()
def stubbed_pipeline(monkeypatch):
    """Route main() around weights: resolve/load are no-ops and the real
    FaceDetectionPipeline runs with its jitted trunk replaced by the pixel
    stub (finds the synthetic bright face), so first_face_boxes' actual
    batching/padding host logic is what the CLI drives."""
    import wav2lip_tpu.convert.fetch as fetch_mod
    import wav2lip_tpu.detect as detect_mod
    import wav2lip_tpu.train.checkpoint as ckpt_mod

    captured = {}
    real_cls = detect_mod.FaceDetectionPipeline

    def factory(variables, cfg, **kw):
        captured["cfg"] = cfg
        p = real_cls(variables, cfg, **kw)
        p._jit_detect = pixel_stub_detector
        return p

    monkeypatch.setattr(fetch_mod, "resolve_s3fd_checkpoint", lambda p: p)
    monkeypatch.setattr(ckpt_mod, "load_model_variables",
                        lambda path, importer: {})
    monkeypatch.setattr(detect_mod, "FaceDetectionPipeline", factory)
    return captured


class TestPreprocessCLI:
    def test_main_end_to_end(self, data_root, tmp_path, stubbed_pipeline):
        out = join(str(tmp_path), "prep")
        rc = main(["--data_root", data_root, "--preprocessed_root", out])
        assert rc == 0
        for spk, vid in (("spk0", "a"), ("spk1", "b")):
            d = join(out, spk, vid)
            assert isdir(d)
            assert len(glob(join(d, "*.jpg"))) == 8  # all faces found
        # dataset-reproduction pins: f32 trunk, no downscale, no ROI track
        cfg = stubbed_pipeline["cfg"]
        assert cfg.compute_dtype == "float32"
        assert cfg.downscale == 1 and cfg.roi_track is False

    def test_shard_slicing_is_disjoint_and_complete(
            self, data_root, tmp_path, stubbed_pipeline):
        """--shard i --num_shards n must partition the video list (each
        host preprocesses a disjoint slice; union covers everything)."""
        outs = []
        for shard in (0, 1):
            out = join(str(tmp_path), f"prep{shard}")
            assert main(["--data_root", data_root,
                         "--preprocessed_root", out,
                         "--shard", str(shard), "--num_shards", "2"]) == 0
            outs.append({
                os.path.relpath(d, out)
                for d in glob(join(out, "*", "*")) if isdir(d)
            })
        assert outs[0] & outs[1] == set()
        assert outs[0] | outs[1] == {join("spk0", "a"), join("spk1", "b")}
