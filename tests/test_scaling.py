"""Measured thread-level scaling of the banded decoder and the 3-stage
inference pipeline (round-4 verdict Weak #5: every multi-core claim was a
projection).

The CI host has ONE core, so these experiments model per-frame host cost
with ``time.sleep`` — which releases the GIL exactly like the cv2/ffmpeg
decode, resize and encode calls the real stages spend their time in. What
that measures is the THREADING ARCHITECTURE: if any stage serialized on a
lock, a queue handoff, or an ordering constraint, the sleeps would not
overlap and the walls below would sum instead of max. It does NOT measure
memory bandwidth or cache effects of real multi-core decode — the single
measured-core roofline for those lives in docs/DESIGN.md (io/video.py
banded decode section).
"""

import dataclasses
import os
import time

import numpy as np
import pytest

import wav2lip_tpu.infer.pipeline as P
from wav2lip_tpu.config import DEFAULT_CONFIG
from wav2lip_tpu.utils.profiling import StageTimer


class _SleepReader:
    """VideoFrameReader stand-in whose read() costs ``cost_s`` of
    GIL-released time (like ffmpeg) and fills the frame with its index."""

    def __init__(self, num_frames: int, shape, cost_s: float):
        self.n = num_frames
        self.shape = shape
        self.cost = cost_s
        self.pos = 0
        self.closed = False

    def seek(self, i: int) -> bool:
        self.pos = i
        return True

    def read(self, dst=None):
        if self.pos >= self.n:
            return None
        time.sleep(self.cost)
        out = dst if dst is not None else np.empty(self.shape, np.uint8)
        out[:] = self.pos % 251
        self.pos += 1
        return out

    def close(self):
        self.closed = True


class _StubPipe:
    """Minimal LipSyncPipeline surface _ParallelDecode touches."""

    def __init__(self):
        self.timings = StageTimer()
        self._producers = []

    def _register_producer(self, stop_fn):
        self._producers.append(stop_fn)


def _run_banded(num_frames: int, workers: int, cost_s: float) -> float:
    shape = (32, 32, 3)
    buf = np.zeros((num_frames,) + shape, np.uint8)
    rd0 = _SleepReader(num_frames, shape, cost_s)
    first = rd0.read()  # caller consumed frame 0 (run() does the same)

    dec = P._ParallelDecode(
        _StubPipe(), rd0, first, lambda i: buf[i],
        num_out=num_frames, num_src=num_frames, workers=workers,
        reopen=lambda: _SleepReader(num_frames, shape, cost_s),
    )
    t0 = time.perf_counter()
    got = dec.wait_upto(num_frames)
    dt = time.perf_counter() - t0
    dec.shutdown()
    assert got == num_frames
    # every slot decoded exactly once with its own frame's payload
    want = (np.arange(num_frames) % 251).astype(np.uint8)
    assert (buf[:, 0, 0, 0] == want).all()
    return dt


class TestBandedDecodeScaling:
    def test_bands_scale_near_linearly(self):
        """4 bands of sleep-cost decode finish ≥2.5× faster than 1 band —
        no hidden serialization in publish/prefix bookkeeping."""
        n, cost = 64, 0.006
        t1 = _run_banded(n, workers=1, cost_s=cost)
        t4 = _run_banded(n, workers=4, cost_s=cost)
        assert t1 > n * cost * 0.9  # serial really paid per-frame cost
        assert t4 < t1 / 2.5, (t1, t4)

    @pytest.mark.slow
    def test_scaling_table(self, capsys):
        """Record the measured scaling table (docs/DESIGN.md carries the
        copy of record)."""
        n, cost = 96, 0.006
        rows = []
        for w in (1, 2, 4, 8):
            dt = _run_banded(n, workers=w, cost_s=cost)
            rows.append((w, dt))
        with capsys.disabled():
            print("\nbanded decode, 96 frames x 6 ms sleep-cost each:")
            for w, dt in rows:
                print(f"  workers={w}: wall {dt * 1000:.0f} ms, "
                      f"speedup {rows[0][1] / dt:.2f}x")
        # 8-way: ≥5x over serial (perfect would be 8x; allow sched jitter)
        assert rows[3][1] < rows[0][1] / 5.0


class TestPipelineOverlap:
    """The decode → device → writer stages overlap: wall approaches
    max(stage totals), not their sum."""

    def test_three_stage_overlap(self, tmp_path, monkeypatch):
        """Paired-run design so the real-work baseline cancels: both runs
        inject the SAME total sleep, once split across the decode, device
        and writer stages (overlappable — wall should absorb ≈ two thirds
        of it) and once entirely in the decode stage (a serial floor: one
        stage cannot overlap with itself). If the stage threads serialized
        anywhere, both walls would be equal."""
        from fixtures import make_video, make_wav
        from wav2lip_tpu.infer import LipSyncPipeline
        from wav2lip_tpu.io.video import (PreallocRawAVIWriter,
                                          VideoFrameReader)

        n = 48
        video = make_video(str(tmp_path / "v.mp4"), num_frames=n,
                           fps=25.0, w=128, h=128)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=n / 25.0)

        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            infer=dataclasses.replace(
                DEFAULT_CONFIG.infer,
                box=(20, 108, 20, 108),
                wav2lip_batch_size=16,
                transfer_streams=1,
            ),
        )
        # the generator is stubbed below — the weights tree is never used
        pipe = LipSyncPipeline(
            {"params": {"w": np.zeros((1,), np.float32)}}, config=cfg)

        costs = {"d": 0.0, "g": 0.0, "w": 0.0}
        calls = []

        real_read = VideoFrameReader.read

        def slow_read(self, dst=None):
            time.sleep(costs["d"])
            return real_read(self, dst=dst)

        monkeypatch.setattr(VideoFrameReader, "read", slow_read)

        real_commit = PreallocRawAVIWriter.commit

        def slow_commit(self, i):
            time.sleep(costs["w"])
            return real_commit(self, i)

        monkeypatch.setattr(PreallocRawAVIWriter, "commit", slow_commit)

        def stub_generate(variables, mel_dev, starts_dev, face_parts):
            b = sum(int(p.shape[0]) for p in face_parts)
            if b == 1:  # static-face broadcast: starts carry the batch
                b = int(starts_dev.shape[0])
            time.sleep(costs["g"])  # models device compute + fetch
            calls.append(b)
            return (np.zeros((b, pipe.img_size, pipe.img_size, 3),
                             np.uint8),)

        pipe._jit_generate = stub_generate

        out = os.path.join(str(tmp_path), "out.mp4")

        def timed_run():
            t0 = time.perf_counter()
            pipe.run(video, wav, out, temp_dir=str(tmp_path / "t"))
            return time.perf_counter() - t0

        timed_run()  # warm: mel jit, writer setup, page cache
        calls.clear()

        # run A: cost split over the three stages
        d_cost, g_cost, w_cost = 0.016, 0.25, 0.016
        costs.update(d=d_cost, g=g_cost, w=w_cost)
        wall_split = timed_run()
        n_batches = len(calls)
        injected = n * d_cost + n_batches * g_cost + n * w_cost

        # run B: the SAME total cost, all in the decode stage
        costs.update(d=injected / n, g=0.0, w=0.0)
        wall_serial = timed_run()

        # overlap must absorb a large fraction of the split-injected cost:
        # the serial-floor run pays all of it end to end, the split run at
        # most max(stage) plus fill — anything close to equal means the
        # stage threads serialized somewhere
        assert wall_serial - wall_split > 0.35 * injected, (
            wall_split, wall_serial, injected, n_batches)
