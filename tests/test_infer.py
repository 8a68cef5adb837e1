"""End-to-end inference tests: the BASELINE config-1 slice (fixed --box, no
detector) over synthetic media, exercising video I/O → mel → chunking →
masking → generator → composite → encode, plus the CLI surface."""

import os
import dataclasses

import cv2
import jax
import numpy as np
import pytest

from fixtures import make_video, make_wav
from wav2lip_tpu.config import DEFAULT_CONFIG
from wav2lip_tpu.infer import LipSyncPipeline
from wav2lip_tpu.models import Wav2LipGenerator


@pytest.fixture(scope="module")
def gen_vars():
    return jax.jit(Wav2LipGenerator().init)(
        jax.random.key(0),
        np.zeros((1, 80, 16, 1), np.float32),
        np.zeros((1, 96, 96, 6), np.float32),
    )


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    video = make_video(str(d / "face.mp4"), num_frames=30, fps=25.0,
                       w=128, h=128)
    wav = make_wav(str(d / "a.wav"), seconds=1.0)
    return video, wav


def box_config(batch_size=16, **infer_kw):
    return dataclasses.replace(
        DEFAULT_CONFIG,
        infer=dataclasses.replace(
            DEFAULT_CONFIG.infer,
            box=(20, 108, 20, 108),
            wav2lip_batch_size=batch_size,
            **infer_kw,
        ),
    )


def read_all_frames(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


class TestBoxInference:
    def test_end_to_end(self, gen_vars, media, tmp_path):
        video, wav = media
        out = str(tmp_path / "out.mp4")
        pipe = LipSyncPipeline(gen_vars, detector=None, config=box_config())
        result = pipe.run(video, wav, out, temp_dir=str(tmp_path / "tmp"))
        assert os.path.isfile(result)

        frames = read_all_frames(result)
        # 1.0s audio → 81 mel frames → 22 chunks (21 in-range + the
        # right-aligned tail, matching the reference loop)
        assert len(frames) == 22
        assert frames[0].shape == (128, 128, 3)

        # pixels inside the box were re-rendered; outside untouched
        src = read_all_frames(video)
        inside = np.abs(
            frames[0][20:108, 20:108].astype(int)
            - src[0][20:108, 20:108].astype(int)
        ).mean()
        outside = np.abs(
            frames[0][:20].astype(int) - src[0][:20].astype(int)
        ).mean()
        assert inside > 5.0
        assert outside < 6.0  # codec noise only

    @pytest.mark.skipif(
        not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)),
        reason="no /dev/shm",
    )
    def test_inplace_prealloc_matches_buffered_raw(self, gen_vars, media,
                                                   tmp_path):
        """codec="auto" on a RAM-backed sink takes the in-place path (decode
        and composite land directly in the memory-mapped output file); its
        frames must be bit-identical to the buffered codec="raw" path."""
        import tempfile

        from wav2lip_tpu.io.video import PreallocRawAVIWriter

        video, wav = media
        with tempfile.TemporaryDirectory(dir="/dev/shm") as shm:
            out_auto = os.path.join(shm, "auto.avi")
            pipe = LipSyncPipeline(gen_vars, detector=None,
                                   config=box_config())
            pipe.run(video, wav, out_auto, temp_dir=os.path.join(shm, "t"))
            # the sink really was the preallocated in-place writer
            probe = pipe.cfg  # auto resolution is in make_frame_writer
            w = None
            from wav2lip_tpu.io.video import make_frame_writer
            w = make_frame_writer(os.path.join(shm, "probe.avi"), 25.0,
                                  (128, 128), codec=probe.infer.codec,
                                  n_frames_hint=22)
            assert isinstance(w, PreallocRawAVIWriter)
            w.frame_view(0)[:] = 0
            w.commit(0)
            w.close()

            out_raw = str(tmp_path / "raw.avi")
            pipe2 = LipSyncPipeline(gen_vars, detector=None,
                                    config=box_config(codec="raw"))
            pipe2.run(video, wav, out_raw, temp_dir=str(tmp_path / "t2"))

            a = read_all_frames(out_auto)
            b = read_all_frames(out_raw)
            assert len(a) == len(b) == 22
            for fa, fb in zip(a, b):
                np.testing.assert_array_equal(fa, fb)

    def test_static_image_input(self, gen_vars, media, tmp_path):
        video, wav = media
        img_path = str(tmp_path / "face.png")
        cv2.imwrite(img_path, read_all_frames(video)[0])
        out = str(tmp_path / "img_out.mp4")
        pipe = LipSyncPipeline(gen_vars, detector=None, config=box_config())
        pipe.run(img_path, wav, out, fps=25.0, temp_dir=str(tmp_path / "t2"))
        frames = read_all_frames(out)
        assert len(frames) == 22

    def test_partial_batch_and_batch_invariance(self, gen_vars, media,
                                                tmp_path):
        """Different batch sizes must produce identical output frames (the
        last partial batch is padded, never re-shaped)."""
        video, wav = media
        outs = []
        for bs in (7, 32):
            out = str(tmp_path / f"out_{bs}.mp4")
            pipe = LipSyncPipeline(gen_vars, detector=None,
                                   config=box_config(batch_size=bs))
            pipe.run(video, wav, out, temp_dir=str(tmp_path / f"t{bs}"))
            outs.append(read_all_frames(out))
        assert len(outs[0]) == len(outs[1])
        for a, b in zip(outs[0], outs[1]):
            # identical up to codec noise
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0

    def test_mesh_data_parallel_matches_single_device(self, gen_vars, media,
                                                      tmp_path):
        """Data-parallel generation over a 4-device mesh must produce output
        frames identical to the single-device path (batch-parallel convs,
        running-stat BN — no cross-sample math at inference)."""
        from wav2lip_tpu.parallel import make_mesh

        video, wav = media
        ref_out = str(tmp_path / "ref.mp4")
        pipe = LipSyncPipeline(gen_vars, detector=None,
                               config=box_config(batch_size=16))
        pipe.run(video, wav, ref_out, temp_dir=str(tmp_path / "tr"))

        mesh = make_mesh(jax.devices()[:4])
        mesh_out = str(tmp_path / "mesh.mp4")
        mpipe = LipSyncPipeline(gen_vars, detector=None,
                                config=box_config(batch_size=16), mesh=mesh)
        mpipe.run(video, wav, mesh_out, temp_dir=str(tmp_path / "tm"))

        ref_frames = read_all_frames(ref_out)
        mesh_frames = read_all_frames(mesh_out)
        assert len(ref_frames) == len(mesh_frames) == 22
        for a, b in zip(ref_frames, mesh_frames):
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0

    def test_mesh_rejects_indivisible_batch(self, gen_vars):
        from wav2lip_tpu.parallel import make_mesh

        with pytest.raises(ValueError, match="must be a multiple"):
            LipSyncPipeline(gen_vars, detector=None,
                            config=box_config(batch_size=6),
                            mesh=make_mesh(jax.devices()[:4]))

    def test_tail_drop_chunking(self, gen_vars, media, tmp_path):
        """Eval-harness mode drops the final partial mel chunk instead of
        right-aligning it (gen_videos_from_filelist.py:178-183): one fewer
        output frame than product mode for a non-dividing mel length."""
        video, wav = media
        pipe = LipSyncPipeline(gen_vars, detector=None, config=box_config())
        out = str(tmp_path / "drop.mp4")
        pipe.run(video, wav, out, temp_dir=str(tmp_path / "td"), tail="drop")
        # 81 mel frames → 21 full chunks; the 22nd (right-aligned) is dropped
        assert len(read_all_frames(out)) == 21

    def test_skip_if_short(self, gen_vars, media, tmp_path):
        """skip_if_short raises when frames < mel chunks
        (gen_videos_from_filelist.py:195-196) instead of cycling frames."""
        from wav2lip_tpu.infer.pipeline import VideoTooShortError

        _, wav = media
        short = make_video(str(tmp_path / "short.mp4"), num_frames=10,
                           fps=25.0, w=128, h=128)
        pipe = LipSyncPipeline(gen_vars, detector=None, config=box_config())
        with pytest.raises(VideoTooShortError):
            pipe.run(short, wav, str(tmp_path / "s.mp4"),
                     temp_dir=str(tmp_path / "ts"), skip_if_short=True)
        # without the flag the same clip renders by cycling frames
        pipe.run(short, wav, str(tmp_path / "s2.mp4"),
                 temp_dir=str(tmp_path / "ts2"))
        assert len(read_all_frames(str(tmp_path / "s2.mp4"))) == 22

    def test_resize_factor_and_crop(self, gen_vars, media, tmp_path):
        video, wav = media
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            infer=dataclasses.replace(
                DEFAULT_CONFIG.infer,
                box=(10, 54, 10, 54),
                wav2lip_batch_size=8,
                resize_factor=2,
            ),
        )
        out = str(tmp_path / "rs.mp4")
        pipe = LipSyncPipeline(gen_vars, detector=None, config=cfg)
        pipe.run(video, wav, out, temp_dir=str(tmp_path / "t3"))
        frames = read_all_frames(out)
        assert frames[0].shape == (64, 64, 3)

    def test_nan_audio_guard(self, gen_vars, media, tmp_path):
        video, _ = media
        import scipy.io.wavfile as wavfile

        bad = str(tmp_path / "nan.wav")
        wavfile.write(bad, 16000, np.full(16000, np.nan, np.float32))
        pipe = LipSyncPipeline(gen_vars, detector=None, config=box_config())
        with pytest.raises(ValueError, match="nan"):
            pipe.run(video, bad, str(tmp_path / "x.mp4"),
                     temp_dir=str(tmp_path / "t4"))


class TestInferCLI:
    def test_cli_with_orbax_checkpoint(self, gen_vars, media, tmp_path):
        from wav2lip_tpu.cli.infer import main
        from wav2lip_tpu.train import checkpoint as ckpt

        video, wav = media
        path = ckpt.save_checkpoint(
            str(tmp_path / "ckpts"), 1,
            {"params": gen_vars["params"],
             "batch_stats": gen_vars["batch_stats"],
             "opt_state": None, "global_step": 1, "global_epoch": 0},
        )
        out = str(tmp_path / "cli_out.mp4")
        rc = main([
            "--checkpoint_path", path,
            "--face", video,
            "--audio", wav,
            "--outfile", out,
            "--box", "20", "108", "20", "108",
            "--wav2lip_batch_size", "16",
            "--decode_workers", "2",  # exercises flag plumbing; the pipe
            # falls back to the serial reader when banding can't apply
            "--temp_dir", str(tmp_path / "t5"),
        ])
        assert rc == 0
        assert os.path.isfile(out)

    def test_cli_requires_detector_or_box(self, media, tmp_path):
        from wav2lip_tpu.cli.infer import main

        video, wav = media
        rc = main([
            "--checkpoint_path", "nonexistent",
            "--face", video,
            "--audio", wav,
        ])
        assert rc != 0


class TestDetectorInference:
    """Detector-mode pipe.run (BASELINE config 2 shape): frames decode
    asynchronously into the preallocated sink, ROI-tracked detection runs in
    its own thread, composite is paste-only, and a lying container header
    triggers the buffered restart instead of cycling over composited slots.

    The detector's jitted graph is stubbed with a host-side bright-pixel
    finder (the synthetic fixture face is a bright disc): the subject here
    is the pipeline plumbing, not S3FD (tests/test_detect.py owns that).
    """

    def _detector(self):
        from wav2lip_tpu.detect import FaceDetectionPipeline

        det = FaceDetectionPipeline(
            {"params": {"w": np.zeros((1,), np.float32)}}, batch_size=8
        )

        from fixtures import pixel_stub_detector

        det._jit_detect = pixel_stub_detector
        return det

    @pytest.fixture()
    def shm_dir(self, tmp_path):
        """An output dir on a RAM-backed fs when available: that is where
        make_frame_writer picks the preallocated in-place sink, which is the
        decode-into-views/async-decode path under test. Plain tmp_path
        still covers the buffered fallback on hosts without /dev/shm.
        Removed on teardown — leaked raw-AVI payloads in /dev/shm are RAM."""
        import shutil
        import tempfile

        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            d = tempfile.mkdtemp(prefix="w2l_test_", dir="/dev/shm")
            yield d
            shutil.rmtree(d, ignore_errors=True)
        else:
            yield str(tmp_path / "shm")

    def test_detector_mode_end_to_end(self, gen_vars, media, tmp_path,
                                      shm_dir):
        video, wav = media
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            infer=dataclasses.replace(DEFAULT_CONFIG.infer,
                                      wav2lip_batch_size=16),
        )
        pipe = LipSyncPipeline(gen_vars, detector=self._detector(),
                               config=cfg)
        out = os.path.join(shm_dir, "det_out.mp4")
        pipe.run(video, wav, out, temp_dir=shm_dir)
        frames = read_all_frames(out)
        # 1.0 s audio < 1.2 s video: output length == mel chunk count < 30
        assert 20 <= len(frames) < 30
        assert frames[0].shape == (128, 128, 3)
        # the face region was composited (generator output differs from the
        # source disc) while corners stay source pixels up to codec loss
        src = read_all_frames(video)
        corner = np.abs(frames[3][:8, :8].astype(int)
                        - src[3][:8, :8].astype(int))
        assert corner.max() <= 6
        assert np.abs(frames[3].astype(int) - src[3].astype(int)).max() > 16

    def test_short_header_cycles_in_place(self, gen_vars, tmp_path,
                                          monkeypatch, shm_dir):
        """A container header that overestimates the frame count no longer
        restarts the run: the async decode-into-sink path is short_ok and
        cycled outputs reuse composited slots (FrameCrop.cycle_of) — the
        output still has one frame per mel chunk, with no warning."""
        import warnings as _warnings

        import wav2lip_tpu.infer.pipeline as P

        video = make_video(str(tmp_path / "v.mp4"), num_frames=20,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=1.2)

        class LyingReader(P.VideoFrameReader):
            """Reports far more frames than the stream holds."""

            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                self.approx_frame_count += 40

        monkeypatch.setattr(P, "VideoFrameReader", LyingReader)
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            infer=dataclasses.replace(DEFAULT_CONFIG.infer,
                                      wav2lip_batch_size=16),
        )
        pipe = LipSyncPipeline(gen_vars, detector=self._detector(),
                               config=cfg)
        out = os.path.join(shm_dir, "o.mp4")
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # no restart/buffer warnings
            pipe.run(video, wav, out, temp_dir=shm_dir)
        frames = read_all_frames(out)
        # 1.2 s audio > 0.8 s video: output cycles the 20 source frames up
        # to the mel chunk count
        assert len(frames) > 20

    def test_cycled_in_place_matches_buffered(self, gen_vars, tmp_path,
                                              shm_dir):
        """Byte-parity proof for FrameCrop.cycle_of: audio longer than the
        clip, rendered (a) through the in-place sink (cycled outputs copy
        composited slots and re-paste) and (b) fully RAM-buffered
        (_force_buffered, reference-style cycling over pristine frames).
        The written containers must be byte-identical — the paste rect
        fully overwrites the only pixels where a composited slot differs
        from the original frame, and the generator's crop for a cycled
        output is served from the cache of the ORIGINAL crop."""
        import filecmp

        video = make_video(str(tmp_path / "v.mp4"), num_frames=20,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=1.4)
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            infer=dataclasses.replace(DEFAULT_CONFIG.infer,
                                      wav2lip_batch_size=16),
        )
        pipe = LipSyncPipeline(gen_vars, detector=self._detector(),
                               config=cfg)
        out_a = os.path.join(shm_dir, "inplace.mp4")
        out_b = os.path.join(shm_dir, "buffered.mp4")
        pipe.run(video, wav, out_a, temp_dir=os.path.join(shm_dir, "ta"))
        pipe.run(video, wav, out_b, temp_dir=os.path.join(shm_dir, "tb"),
                 _force_buffered=True)
        n_src = len(read_all_frames(video))
        assert len(read_all_frames(out_a)) > n_src  # cycling did happen
        assert filecmp.cmp(out_a, out_b, shallow=False)


class TestAsyncBoxesTracked:
    """The detect thread's dispatch-ahead runner (_AsyncBoxes._run_tracked,
    round-5 RTT cuts) must publish boxes equivalent to the synchronous
    tracked path under a LIVE decoder: chunk c+1's crops ship while chunk
    c's results are in flight, windows may be one chunk fresher than the
    synchronous single-span placement, so boxes match within the ROI
    resize-roundtrip tolerance the tracked mode already carries."""

    def _pipe_and_frames(self, n=30):
        import wav2lip_tpu.infer.pipeline as P
        from fixtures import pixel_stub_detector
        from wav2lip_tpu.detect import FaceDetectionPipeline

        det = FaceDetectionPipeline(
            {"params": {"w": np.zeros((1,), np.float32)}}, batch_size=8
        )
        det._jit_detect = pixel_stub_detector
        pipe = LipSyncPipeline(
            {"params": {"w": np.zeros((1,), np.float32)}},
            detector=det, config=box_config())
        frames = np.zeros((n, 240, 320, 3), np.uint8)
        truth = []
        for t in range(n):
            x, y, size = 40 + 2 * t, 60 + t, 60
            frames[t, y : y + size, x : x + size] = 200
            truth.append((x, y, x + size, y + size))
        return P, pipe, frames, truth

    def test_live_decode_matches_synchronous_tracked(self):
        import threading
        import time

        from wav2lip_tpu.detect import RoiTracker
        from wav2lip_tpu.data.windows import smooth_boxes

        n = 30
        P, pipe, frames, truth = self._pipe_and_frames(n)

        # expected: synchronous tracked detection -> pads -> smoothing
        raw_sync = pipe._pad_boxes(
            pipe.detector.first_face_boxes(list(frames),
                                           tracker=RoiTracker()),
            list(frames))
        want = smooth_boxes(np.asarray(raw_sync), T=5)

        # live decoder: frames become visible a few at a time
        avail = [1]
        lock = threading.Lock()

        def wait_upto(k):
            k = min(k, n)
            while True:
                with lock:
                    if avail[0] >= k or avail[0] >= n:
                        return avail[0]
                time.sleep(0.001)

        def feeder():
            while avail[0] < n:
                time.sleep(0.004)
                with lock:
                    avail[0] = min(n, avail[0] + 3)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        stage = P._AsyncBoxes(pipe, list(frames), chunk=8, n=n,
                              wait_upto=wait_upto)
        got = np.asarray([stage.get(i) for i in range(n)], np.float64)
        t.join()
        # get() returns (y1, y2, x1, x2); want rows are (x1, y1, x2, y2)
        want_yx = want[:, [1, 3, 0, 2]]
        assert np.abs(got - want_yx).max() <= 3.0

    def test_short_stream_with_pending_dispatch(self):
        """The decoder ends mid-clip while a dispatch-ahead fetch is
        outstanding: the runner must still resolve and publish everything
        it dispatched, and shrink to the decoded count."""
        import wav2lip_tpu.infer.pipeline as P

        n_plan, n_real = 30, 17
        P2, pipe, frames, _ = self._pipe_and_frames(n_plan)

        calls = []

        def wait_upto(k):
            calls.append(k)
            return min(n_real, max(k, n_real))  # instantly-done short stream

        stage = P._AsyncBoxes(pipe, list(frames[:n_real]), chunk=8,
                              n=n_plan, wait_upto=wait_upto)
        boxes = [stage.get(i) for i in range(n_real)]
        assert stage.n == n_real
        assert all(b is not None for b in boxes)


class TestParallelDecode:
    """N-way banded decode into the preallocated sink (_ParallelDecode):
    byte-parity with the serial decoder on both the box path and the
    detector path, including a lying container header (short bands cap the
    prefix → cycling). Workers are forced to 2 so the tests exercise the
    banded path on any host (auto mode keeps 1-core hosts serial)."""

    @pytest.fixture()
    def shm_dir(self, tmp_path):
        import shutil
        import tempfile

        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            d = tempfile.mkdtemp(prefix="w2l_test_", dir="/dev/shm")
            yield d
            shutil.rmtree(d, ignore_errors=True)
        else:
            yield str(tmp_path / "shm")

    def _run_pair(self, pipe_of, video, wav, shm_dir, names=("p", "s")):
        import filecmp

        outs = []
        for name, workers in zip(names, (2, 1)):
            out = os.path.join(shm_dir, f"{name}.mp4")
            pipe_of(workers).run(video, wav, out,
                                 temp_dir=os.path.join(shm_dir, "t" + name))
            outs.append(out)
        assert filecmp.cmp(outs[0], outs[1], shallow=False)
        return outs[0]

    def test_box_path_parity(self, gen_vars, tmp_path, shm_dir):
        video = make_video(str(tmp_path / "v.mp4"), num_frames=40,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=1.5)

        def pipe_of(workers):
            return LipSyncPipeline(
                gen_vars,
                config=box_config(decode_workers=workers),
            )

        out = self._run_pair(pipe_of, video, wav, shm_dir)
        frames = read_all_frames(out)
        assert len(frames) >= 30  # 1.5 s at 25 fps, within header count

    def test_detector_path_parity(self, gen_vars, tmp_path, shm_dir):
        from fixtures import pixel_stub_detector
        from wav2lip_tpu.detect import FaceDetectionPipeline

        video = make_video(str(tmp_path / "v.mp4"), num_frames=40,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=1.5)

        def pipe_of(workers):
            det = FaceDetectionPipeline(
                {"params": {"w": np.zeros((1,), np.float32)}}, batch_size=8
            )
            det._jit_detect = pixel_stub_detector
            cfg = dataclasses.replace(
                DEFAULT_CONFIG,
                infer=dataclasses.replace(DEFAULT_CONFIG.infer,
                                          wav2lip_batch_size=16,
                                          decode_workers=workers),
            )
            return LipSyncPipeline(gen_vars, detector=det, config=cfg)

        self._run_pair(pipe_of, video, wav, shm_dir)

    def test_short_header_parallel_cycles(self, gen_vars, tmp_path,
                                          monkeypatch, shm_dir):
        """Header overestimates: one band hits end-of-stream, the decoded
        prefix caps there, and outputs cycle — identical to the serial
        short path."""
        import wav2lip_tpu.infer.pipeline as P

        video = make_video(str(tmp_path / "v.mp4"), num_frames=32,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=1.8)  # 45 outputs

        class LyingReader(P.VideoFrameReader):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                self.approx_frame_count += 60

        monkeypatch.setattr(P, "VideoFrameReader", LyingReader)

        def pipe_of(workers):
            return LipSyncPipeline(
                gen_vars,
                config=box_config(decode_workers=workers),
            )

        out = self._run_pair(pipe_of, video, wav, shm_dir)
        assert len(read_all_frames(out)) > 32  # cycled past the source

    def test_seek_failure_falls_back_serial(self, gen_vars, tmp_path,
                                            monkeypatch, shm_dir):
        import wav2lip_tpu.infer.pipeline as P

        video = make_video(str(tmp_path / "v.mp4"), num_frames=40,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=1.5)

        monkeypatch.setattr(P.VideoFrameReader, "seek",
                            lambda self, i: False)
        pipe = LipSyncPipeline(gen_vars,
                               config=box_config(decode_workers=4))
        out = os.path.join(shm_dir, "fb.mp4")
        pipe.run(video, wav, out, temp_dir=os.path.join(shm_dir, "tf"))
        assert len(read_all_frames(out)) >= 30
