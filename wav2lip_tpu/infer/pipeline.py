"""Chunked streaming lip-sync inference pipeline.

The product path (reference: inference.py:181-277): decode video → mel
spectrogram → per-frame mel windows → face boxes (S3FD, fixed ``--box``, or
static first-frame) → batched generator forward → composite the generated
mouth patch back into each full frame → encode + mux audio.

TPU-first deltas from the reference (which runs every stage serially on the
host, inference.py:249-272):

* three-stage host/device pipeline — the host decode+prep loop, the device
  dispatch (upload → generator → fetch), and the composite+encode loop run in
  separate threads connected by bounded queues, so device transfers and
  compute hide behind host pixel work (and vice versa);
* fixed generator batch shape — the last partial batch is padded, not
  re-traced;
* crop/mask/normalize and the uint8 conversion fuse into the generator's XLA
  program; only uint8 face crops and mel windows cross the host↔device link
  (full frames never do — at 96×96 that is ~27 KB/frame instead of ~6 MB);
* bfloat16 generator compute by default (``infer.compute_dtype``) — TPU-native
  and invisible after the *255 uint8 quantization;
* static mode uploads the single face crop once and broadcasts on device;
* eager device dispatch: two batches in flight, so batch k+1 uploads and
  computes while batch k's output crosses back to the host;
* streaming decode: when boxes are known without random access (fixed
  ``--box`` on a long clip) frames are decoded as needed and freed after
  compositing instead of materializing the whole clip in RAM;
* decode runs in its own producer thread in every mode, and on a RAM-backed
  output target frames decode DIRECTLY into the preallocated raw-AVI
  container's mmap'd payload slots (io.video.PreallocRawAVIWriter) — the
  composite stage pastes the mouth patch in place and the encode and write
  stages cease to exist; detector-mode runs overlap decode with detection
  the same way (_AsyncDecode);
* composite AND per-frame JPEG encode fan out across a thread pool (both
  are frame-independent and release the GIL); only the ordered container
  writes stay serial. The intermediate defaults to a direct MJPG-AVI writer
  (io.video.MJPEGWriter) — compact enough to never outrun the disk;
  ``infer.codec="raw"`` gets lossless BGR24 (zero encode CPU, needs a
  ≥155 MB/s sink at 1080p25), ``"DIVX"`` bit-identical reference behavior.

Behavioral parity preserved: pads/box/static/resize_factor/rotate/crop/
nosmooth flags, bbox smoothing window of 5, mel NaN guard, frame truncation
to the chunk count, and cyclic frame reuse ``i % len(frames)``.
"""

from __future__ import annotations

import os
import queue
import threading
import warnings
from collections import deque
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.audio import load_wav, MelFrontend
from wav2lip_tpu.config import Config, DEFAULT_CONFIG
from wav2lip_tpu.data.windows import mel_chunk_starts, smooth_boxes
from wav2lip_tpu.detect import FaceDetectionPipeline
from wav2lip_tpu.io.video import (
    PreallocRawAVIWriter,
    VideoFrameReader,
    embed_wav_audio,
    extract_audio,
    has_ffmpeg,
    make_frame_writer,
    mux_audio,
)
from wav2lip_tpu.models import Wav2LipGenerator
from wav2lip_tpu.utils.cache import enable_compile_cache
from wav2lip_tpu.utils.dtypes import cast_floats_fused
from wav2lip_tpu.utils.profiling import StageTimer
from wav2lip_tpu.utils.transfer import (
    fetch_concat,
    fetch_mesh_batch,
    put_mesh_batch,
    put_sharded,
    put_tree,
    split_sizes,
)

IMAGE_EXTS = (".jpg", ".jpeg", ".png")

_QUEUE_DEPTH = 3          # batches in flight per pipeline stage
_QUEUE_POLL_S = 0.25      # poll interval so worker errors propagate promptly


class FaceNotDetectedError(ValueError):
    pass


class VideoTooShortError(ValueError):
    """Raised in ``skip_if_short`` mode when a video has fewer frames than
    mel chunks (the eval harness skips such videos,
    gen_videos_from_filelist.py:195-196)."""


@dataclass
class FrameCrop:
    """Per output frame: the source frame, its face box (y1, y2, x1, x2) and
    whether this output may paste into the source frame in place (it owns the
    last/only use)."""

    frame: Optional[np.ndarray]  # None = static mode (writer reuses a canvas)
    coords: Tuple[int, int, int, int]
    owns_frame: bool
    index: int = -1       # output frame index (sink slot for in-place writers)
    in_place: bool = False  # frame IS the sink's frame_view — paste only
    face96: Optional[np.ndarray] = None  # crop already resized to img_size
    # (produced in the decode thread when the box is known at decode time:
    # the prep loop then only memcpys into the batch, and the single-core
    # GIL ping-pong between the decode thread and the prep loop disappears)
    # in-place CYCLED output (audio longer than the clip, inference.py:121):
    # the source pixels live in already-composited sink slot ``cycle_of``.
    # Byte-identical to compositing the original frame: slot ``cycle_of``
    # differs from the original ONLY inside its paste rect, this output's
    # box is the same source-frame box, and the paste fully overwrites that
    # rect — so the writer copies the slot and re-pastes, while the
    # generator's face crop comes from the prep-time cache of the ORIGINAL
    # (pre-paste) 96² crop keyed by ``cache_key`` on the first pass.
    cycle_of: Optional[int] = None
    cache_key: Optional[int] = None  # prep stores this frame's 96² crop


class _ShortStreamRestart(Exception):
    """The container's frame-count hint overestimated during a SYNCHRONOUS
    decode-into-sink (skip_if_short / no-detector materialization, where
    the final count must be known up front) — run() catches it inline and
    falls back to RAM buffering before consumers start. The async detector
    path never raises this: its decoders run ``short_ok`` and cycled
    outputs reuse composited slots byte-identically (FrameCrop.cycle_of)."""


class _AsyncDecode:
    """Decode frames into the preallocated sink's mmap views in a producer
    thread, so detection (and everything behind it) starts on the first
    chunk while the container is still decoding — in detector mode the
    decode was previously a fully serial prefix of the run.

    ``frames`` is the live, growing list shared with the consumers; entries
    are views into the output file (composite is paste-only). Consumers
    gate on :meth:`wait_upto`, never on ``len(frames)``.

    ``view_of=None`` selects the plain BUFFERED variant: frames decode into
    fresh RAM buffers instead of sink views (used when cyclic reuse rules
    the in-file path out — output frames will alias source frames). Pair it
    with ``short_ok=True``: a stream that ends before ``num_out`` frames is
    then a normal outcome (the consumer cycles over what exists, reference
    inference.py:121) and :meth:`wait_upto` reports the available count
    instead of raising a restart.
    """

    def __init__(self, pipeline: "LipSyncPipeline", reader, first_frame,
                 view_of, num_out: int, short_ok: bool = False):
        self.pipe = pipeline
        self.reader = reader
        self.view_of = view_of
        self.num_out = num_out
        self.short_ok = short_ok
        self.frames: List[np.ndarray] = []
        self.short = False
        self.done = False
        self.stop = False  # error-path shutdown (run() cleanup)
        self.error: Optional[BaseException] = None
        self.cond = threading.Condition()
        # smallest frame count any waiter is currently blocked on — publish
        # wakes waiters only when it is reached. notify_all on EVERY frame
        # forces len(frames) context switches per consumer on a one-core
        # host (each waiter wakes, re-checks, sleeps), which measurably
        # slowed the decode thread itself
        self._want: Optional[int] = None
        self.first_frame = first_frame
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="w2l-decode-views")
        pipeline._register_producer(self.shutdown)
        self.thread.start()

    def shutdown(self) -> None:
        """Stop decoding and wait for the thread: cleanup paths must not
        close/truncate the sink while this thread writes into its views."""
        self.stop = True
        self.thread.join(timeout=10.0)

    def _publish(self, frame) -> None:
        with self.cond:
            self.frames.append(frame)
            if self._want is not None and len(self.frames) >= self._want:
                self._want = None  # unmet targets re-register on wake
                self.cond.notify_all()

    def _finish(self, short: bool, error=None) -> None:
        with self.cond:
            self.short = short
            self.error = error
            self.done = True
            self.cond.notify_all()

    def _view(self, i: int) -> np.ndarray:
        if self.view_of is not None:
            return self.view_of(i)
        return np.empty_like(self.first_frame)  # buffered variant

    def _run(self) -> None:
        try:
            v0 = self._view(0)
            np.copyto(v0, self.first_frame)
            self._publish(v0)
            while len(self.frames) < self.num_out and not self.stop:
                v = self._view(len(self.frames))
                with self.pipe.timings("decode"):
                    got = self.reader.read(dst=v)
                if got is None:
                    self._finish(short=True)
                    return
                if not np.shares_memory(got, v):
                    if got.shape != v.shape:
                        raise ValueError(
                            f"frame {len(self.frames)} shape {got.shape} "
                            f"!= {v.shape}"
                        )
                    np.copyto(v, got)
                    got = v
                self._publish(got)
            if self.stop and len(self.frames) < self.num_out:
                self._finish(short=False,
                             error=RuntimeError("decode aborted"))
            else:
                self._finish(short=False)
        except BaseException as e:  # noqa: BLE001 — re-raised in wait_upto
            self._finish(short=False, error=e)

    def wait_upto(self, n: int) -> int:
        """Block until ``min(n, num_out)`` frames are decoded; returns the
        decoded count available (>= the wait target, or the final count on
        a short stream with ``short_ok``). Raises the decoder's error, or
        :class:`_ShortStreamRestart` when the stream ended before ``n``
        frames and short streams are not tolerated (header hint lied while
        decoding straight into the output sink)."""
        n = min(n, self.num_out)
        with self.cond:
            while len(self.frames) < n and not self.done:
                if self._want is None or n < self._want:
                    self._want = n
                self.cond.wait(_QUEUE_POLL_S)
            if self.error is not None:
                raise self.error
            if len(self.frames) < n and not self.short_ok:  # done early
                raise _ShortStreamRestart(
                    f"decoded {len(self.frames)} < planned {n}"
                )
            return len(self.frames)


class _SeekUnsupported(Exception):
    """The decode backend cannot frame-accurately seek this container —
    parallel banded decode is impossible; callers fall back to the serial
    decoder."""


class _ParallelDecode:
    """N-way banded decode into the in-place sink's mmap views.

    The clip's source range [0, num_src) splits into ``workers`` contiguous
    bands; each band's worker owns a :class:`VideoFrameReader` seeked to the
    band start (band 0 continues the caller's already-open reader — frame 0
    is ``first_frame``) and decodes straight into each frame's
    ``view_of(i)`` slot. The preallocated container makes this
    embarrassingly parallel: every frame has a fixed byte range, so no two
    workers ever touch the same memory (VERDICT r3 task 3; the reference
    decodes the whole clip serially up front, inference.py:190-213).

    Interface-compatible with :class:`_AsyncDecode` (``frames`` /
    ``wait_upto`` / ``shutdown``) and always short-tolerant: ``frames``
    grows in CONTIGUOUS order as the decoded prefix advances, and
    ``wait_upto`` reports the prefix length. A band that hits end-of-stream
    early (lying header) caps the prefix at its break; consumers then cycle
    over the prefix exactly as with the serial short_ok decoder — later
    bands may have written pixels past the break, but those slots are
    unreachable as sources and are overwritten by the cycled composite.

    ``face_fn``: optional per-frame crop hook run in the worker right after
    the decode while the frame is cache-hot (the box path's 96² face crop);
    results land in ``faces[i]``. Requires frame-accurate ``seek`` — the
    caller probes one band seek before constructing this (and cv2's ffmpeg
    backend decodes forward from the preceding keyframe, frame-accurate for
    every container this package reads/writes).
    """

    def __init__(self, pipeline: "LipSyncPipeline", reader, first_frame,
                 view_of, num_out: int, num_src: int, workers: int,
                 reopen, face_fn=None):
        self.pipe = pipeline
        self.view_of = view_of
        self.num_out = min(num_out, num_src)  # wait targets cap at sources
        self.num_src = num_src
        self.frames: List[np.ndarray] = []
        self.faces: Optional[List] = (
            [None] * num_src if face_fn is not None else None
        )
        self._face_fn = face_fn
        self.done = False
        self.stop = False
        self.error: Optional[BaseException] = None
        self.cond = threading.Condition()
        self._want: Optional[int] = None
        self._decoded = np.zeros(num_src, bool)
        self._short_at = num_src  # min break index over all bands
        self._live = 0
        self.first_frame = first_frame

        per = -(-num_src // max(1, workers))
        bands = [(b * per, min(num_src, (b + 1) * per))
                 for b in range(workers) if b * per < num_src]
        # open + seek every non-zero band BEFORE any thread starts: a
        # backend without frame-accurate seek aborts cleanly here (the
        # caller falls back to the serial decoder; band 0's reader is
        # untouched, still positioned after frame 0)
        self._readers = []
        self.threads = []
        try:
            for k, (lo, hi) in enumerate(bands):
                rd = reader if k == 0 else reopen()
                if k > 0:
                    self._readers.append(rd)
                    if not rd.seek(lo):
                        raise _SeekUnsupported(f"cannot seek to frame {lo}")
                self.threads.append(threading.Thread(
                    target=self._band, args=(rd, lo, hi), daemon=True,
                    name=f"w2l-decode-band{k}",
                ))
        except _SeekUnsupported:
            for rd in self._readers:
                try:
                    rd.close()
                except Exception:
                    pass
            raise
        pipeline._register_producer(self.shutdown)
        self._live = len(self.threads)
        for t in self.threads:
            t.start()

    def shutdown(self) -> None:
        self.stop = True
        for t in self.threads:
            t.join(timeout=10.0)
        for rd in self._readers:
            try:
                rd.close()
            except Exception:
                pass

    def _band(self, rd, lo: int, hi: int) -> None:
        try:
            i = lo
            if lo == 0:
                v0 = self.view_of(0)
                np.copyto(v0, self.first_frame)
                if self._face_fn is not None:
                    self.faces[0] = self._face_fn(v0)
                self._publish(0)
                i = 1
            while i < hi and not self.stop:
                v = self.view_of(i)
                with self.pipe.timings("decode"):
                    got = rd.read(dst=v)
                if got is None:
                    with self.cond:
                        self._short_at = min(self._short_at, i)
                    break
                if not np.shares_memory(got, v):
                    if got.shape != v.shape:
                        raise ValueError(
                            f"frame {i} shape {got.shape} != {v.shape}"
                        )
                    np.copyto(v, got)
                if self._face_fn is not None:
                    self.faces[i] = self._face_fn(v)
                self._publish(i)
                i += 1
            self._retire(None)
        except BaseException as e:  # noqa: BLE001 — re-raised in wait_upto
            self._retire(e)
        finally:
            if lo != 0:  # band 0 borrows the caller's reader (run() closes)
                try:
                    rd.close()
                except Exception:
                    pass

    def _publish(self, i: int) -> None:
        with self.cond:
            self._decoded[i] = True
            p = len(self.frames)
            if i != p:
                return  # a hole remains; the band owning it will advance
            stop_at = min(self.num_src, self._short_at)
            while p < stop_at and self._decoded[p]:
                self.frames.append(self.view_of(p))
                p += 1
            if self._want is not None and p >= self._want:
                self._want = None
                self.cond.notify_all()

    def _retire(self, error) -> None:
        with self.cond:
            if error is not None and self.error is None:
                self.error = error
            self._live -= 1
            if self._live == 0 or error is not None:
                self.done = True
                self.cond.notify_all()

    def wait_upto(self, n: int) -> int:
        """Block until the contiguous decoded prefix reaches ``min(n,
        num_out)`` frames (or all bands finished); returns the prefix
        length. Raises the first band error, if any."""
        n = min(n, self.num_out)
        with self.cond:
            while len(self.frames) < n and not self.done:
                if self._want is None or n < self._want:
                    self._want = n
                self.cond.wait(_QUEUE_POLL_S)
            if self.error is not None:
                raise self.error
            return len(self.frames)


class _AsyncBoxes:
    """Face boxes computed in a background thread, published incrementally,
    so detection overlaps generation instead of serializing ahead of it
    (the reference detects every frame before generating any,
    inference.py:108-121 via datagen's face_detect call).

    Parity with the serial path: the reference's sequential smoothing
    (inference.py:59-66) equals ``mean(raw[i:i+T])`` for every ``i <= n-T``
    (those windows see only raw values), so that prefix is published as soon
    as ``raw[i+T-1]`` exists; the quirky tail — windows clamped to the last T
    entries, partially over already-smoothed values — is computed by the
    full ``smooth_boxes`` pass once detection finishes and matches it
    exactly on the prefix too.

    ``n``/``wait_upto``: when frames are still being decoded (by
    :class:`_AsyncDecode`), the frame list is live — ``n`` is the planned
    total and each chunk waits for its frames before detecting.
    """

    def __init__(self, pipeline: "LipSyncPipeline",
                 frames: Sequence[np.ndarray], chunk: int = 64,
                 n: Optional[int] = None, wait_upto=None):
        self.pipe = pipeline
        self.frames = frames
        self.n = len(frames) if n is None else n
        self.wait_upto = wait_upto
        self.chunk = chunk
        self.T = pipeline.cfg.infer.smooth_window
        self.nosmooth = pipeline.cfg.infer.nosmooth
        self.raw: List[np.ndarray] = []
        self.smoothed: List[Optional[Tuple[int, int, int, int]]] = (
            [None] * self.n
        )
        self.ready = 0
        self.error: Optional[BaseException] = None
        self.cond = threading.Condition()
        # one ROI tracker per video (no state leak across runs); None when
        # ROI-tracked detection is disabled in DetectConfig
        from wav2lip_tpu.detect import RoiTracker

        self.tracker = (
            RoiTracker()
            if pipeline.cfg.detect.roi_track else None
        )
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _publish(self, boxes: np.ndarray, upto: int) -> None:
        with self.cond:
            for i in range(self.ready, upto):
                x1, y1, x2, y2 = boxes[i]
                self.smoothed[i] = (int(y1), int(y2), int(x1), int(x2))
            self.ready = upto
            self.cond.notify_all()

    def _run(self) -> None:
        try:
            if self.tracker is not None:
                self._run_tracked()
            else:
                self._run_serial()
            if not self.nosmooth:
                full = smooth_boxes(np.asarray(self.raw), T=self.T)
                self._publish(full, self.n)
        except BaseException as e:  # noqa: BLE001 — re-raised in get()
            with self.cond:
                self.error = e
                self.cond.notify_all()

    def _plan_chunk(self, s: int) -> int:
        """Next chunk end for a chunk starting at ``s`` (blocking on the
        decoder): first chunk small — boxes for the opening frames publish
        after ~16 decodes instead of a full chunk, so prep/generation start
        while the clip is still decoding; later chunks grow to the
        configured size and beyond, to whatever is already decoded (one
        detection call per chunk costs ~one link round trip regardless of
        size, so bigger chunks mean fewer round trips). A short_ok decoder
        may report fewer frames than asked — the stream ended and the
        consumer will cycle over the frames that exist (inference.py:121),
        so ``self.n`` (and detection) shrinks to match."""
        hi = min(self.n, s + (16 if s == 0 else self.chunk))
        if self.wait_upto is not None:
            avail = self.wait_upto(hi)
            if avail < hi:
                hi = self.n = avail
            else:
                hi = min(self.n, max(hi, avail))
        return hi

    def _after_chunk(self, got) -> None:
        """Publish a chunk's padded raw boxes (smoothed prefix rules in the
        class docstring)."""
        self.raw.extend(got)
        if self.nosmooth:
            self._publish(np.asarray(self.raw), len(self.raw))
        else:
            arr = np.asarray(self.raw)
            safe = max(0, len(arr) - (self.T - 1))
            if safe > self.ready and len(arr) < self.n:
                # all-raw windows only; mean == reference smoothing
                win = np.stack([
                    arr[i : i + self.T].mean(axis=0)
                    for i in range(self.ready, safe)
                ])
                self._publish_window(win, safe)

    def _run_serial(self) -> None:
        s = 0
        while s < self.n:
            hi = self._plan_chunk(s)
            if hi <= s:
                break
            with self.pipe.timings("detect"):
                got = self.pipe._raw_padded_boxes(self.frames[s:hi])
            self._after_chunk(got)
            s = hi

    def _run_tracked(self) -> None:
        """ROI-tracked detection with one-chunk dispatch-ahead: chunk c+1's
        crops ship to the device while chunk c's results are still in
        flight, so consecutive chunks cost ~one link round trip total
        instead of one each, and the cold-tracker keyframe is
        pre-dispatched the moment frame 0 decodes — its round trip hides
        under the decode of the first chunk. Publishing stays in frame
        order (pendings resolve in dispatch order)."""
        det = self.pipe.detector
        tracker = self.tracker
        if self.n > 0 and (self.wait_upto is None or self.wait_upto(1) >= 1):
            with self.pipe.timings("detect"):
                det.begin_keyframe(self.frames[0], tracker)
        s = 0
        pending = None  # (s0, s1, begin_tracked dict)
        while s < self.n or pending is not None:
            hi = s
            if s < self.n:
                if pending is None:
                    hi = self._plan_chunk(s)
                else:
                    # a fetch is outstanding: dispatch ahead only over
                    # frames ALREADY decoded (wait_upto(0) probes without
                    # blocking) — waiting on the decoder here would delay
                    # publishing results that may already be back
                    hi = (self.n if self.wait_upto is None
                          else min(self.n, max(s, self.wait_upto(0))))
            dispatched = None
            if hi > s:
                with self.pipe.timings("detect"):
                    pend = det.begin_tracked(self.frames[s:hi], tracker)
                if pend is not None:
                    dispatched = (s, s + pend["taken"], pend)
                    s += pend["taken"]
            if pending is not None:
                s0, s1, pend0 = pending
                with self.pipe.timings("detect"):
                    raw = det.finish_tracked(self.frames[s0:s1], pend0,
                                             tracker)
                    got = self.pipe._pad_boxes(raw, self.frames[s0:s1])
                self._after_chunk(got)
                pending = dispatched
                continue
            pending = dispatched
            if dispatched is None and hi > s:
                # cold tracker or refresh boundary: synchronous tracked
                # call (keyframe + span in one)
                with self.pipe.timings("detect"):
                    got = self.pipe._raw_padded_boxes(self.frames[s:hi],
                                                      tracker=tracker)
                self._after_chunk(got)
                s = hi

    def _publish_window(self, win: np.ndarray, upto: int) -> None:
        with self.cond:
            for j, i in enumerate(range(self.ready, upto)):
                x1, y1, x2, y2 = win[j]
                self.smoothed[i] = (int(y1), int(y2), int(x1), int(x2))
            self.ready = upto
            self.cond.notify_all()

    def get(self, i: int) -> Tuple[int, int, int, int]:
        """Block until frame i's smoothed box is available."""
        with self.cond:
            while self.ready <= i and self.error is None:
                self.cond.wait(timeout=_QUEUE_POLL_S)
            if self.error is not None:
                raise self.error
            return self.smoothed[i]


class LipSyncPipeline:
    def __init__(
        self,
        generator_vars,
        detector: Optional[FaceDetectionPipeline] = None,
        config: Config = DEFAULT_CONFIG,
        batch_size: Optional[int] = None,
        mesh=None,
    ):
        """``mesh``: optional 1-D ``jax.sharding.Mesh`` for data-parallel
        generation — each batch is sharded over the ``data`` axis and the
        generator forward partitions across chips with ZERO collectives
        (batch-parallel convs; BN uses running stats at inference). Output
        frames are bit-identical to the single-device path. The batch size
        must be a multiple of the mesh size."""
        enable_compile_cache()
        self.cfg = config
        self.detector = detector
        self.batch_size = batch_size or config.infer.wav2lip_batch_size
        self.img_size = config.infer.img_size
        self.mel = MelFrontend(config.audio)
        self.model = Wav2LipGenerator()
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None
        if self.mesh is not None and self.batch_size % self.mesh.devices.size:
            raise ValueError(
                f"wav2lip_batch_size {self.batch_size} must be a multiple "
                f"of the {self.mesh.devices.size}-device mesh size"
            )
        self._streams = (1 if self.mesh is not None
                         else max(1, config.infer.transfer_streams))
        self.dtype = jnp.dtype(config.infer.compute_dtype)
        if self.dtype == jnp.float32:
            self.vars = generator_vars
        else:
            self.vars = cast_floats_fused(generator_vars, self.dtype)
        # weights go up ONCE as a fused transfer and are passed to the jitted
        # step as an ARGUMENT. Closing over them would embed them as program
        # constants: lowering then fetches every device-resident leaf back to
        # the host one at a time (minutes over a high-latency link) and bakes
        # ~70-145 MB into each compiled executable / compile-cache entry.
        self.vars = put_tree(self.vars, mesh=self.mesh)
        self._jit_generate = jax.jit(self._generate_fn)
        self.timings = StageTimer()  # per-stage wall time of the last run
        # (input shapes) -> dispatch count for every jitted generator call,
        # so FLOPs actually dispatched (incl. batch padding) are exactly
        # reconstructable for utilization accounting (bench.py MFU leg)
        self.dispatch_stats: dict = {}

    def reset_dispatch_stats(self) -> None:
        self.dispatch_stats = {}

    def dispatched_flops(self) -> float:
        """Analytic FLOPs of every generator program dispatched since the
        last ``reset_dispatch_stats``: XLA cost analysis of each distinct
        input-shape program times its call count (cache-hit lowers — the
        programs just ran)."""
        import numpy as _np

        total = 0.0
        for (face_shapes, mel_shape, starts_shape), count in (
                self.dispatch_stats.items()):
            mel = jax.ShapeDtypeStruct(mel_shape, _np.float32)
            starts = jax.ShapeDtypeStruct(starts_shape, _np.int32)
            faces = tuple(
                jax.ShapeDtypeStruct(s, _np.uint8) for s in face_shapes
            )
            ca = self._jit_generate.lower(
                self.vars, mel, starts, faces
            ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            total += float(ca["flops"]) * count
        return total

    # -- device step ---------------------------------------------------------

    def _generate_fn(self, variables, mel_all, starts, face_parts):
        """Whole-clip mel + per-frame window starts + batch-axis shards of
        (B or 1, 96, 96, 3) uint8 face crops → (B, 96, 96, 3) uint8
        generated crops. ``variables`` are a jit argument, not a closure
        constant (see __init__).

        ``mel_all`` (80, M_padded) is uploaded ONCE per run and the 16-wide
        per-frame windows (reference inference.py:231-240 slices them on the
        host per chunk) are gathered IN-GRAPH from ``starts`` — the mel
        windows overlap 80% (3.2-frame stride, 16-wide), so this removes
        ~5 KB/frame of redundant upload on a link where bandwidth is the
        e2e bottleneck. Masking the lower half, the 6-channel concat, /255
        normalization (inference.py:136-140) and the *255 output conversion
        all fuse into the generator's XLA program. A leading face dim of 1
        with B starts broadcasts the (static-mode) face on device so the
        crop is uploaded exactly once.
        """
        faces_u8 = (face_parts[0] if len(face_parts) == 1
                    else jnp.concatenate(face_parts, axis=0))
        win = self.cfg.model.mel_step_size
        idx = starts[:, None] + jnp.arange(win, dtype=starts.dtype)[None, :]
        mels = jnp.moveaxis(jnp.take(mel_all, idx, axis=1), 1, 0)  # (B,80,16)
        B = mels.shape[0]
        faces = faces_u8.astype(self.dtype) / 255.0
        if faces.shape[0] == 1 and B != 1:
            faces = jnp.broadcast_to(faces, (B,) + faces.shape[1:])
        h = self.img_size // 2
        masked = faces.at[:, h:, :, :].set(0.0)
        x = jnp.concatenate([masked, faces], axis=-1)
        mel_in = mels[..., None].astype(self.dtype)  # (B, 80, 16, 1)
        out = self.model.apply(variables, mel_in, x)
        out_u8 = jnp.clip(
            out.astype(jnp.float32) * 255.0, 0, 255
        ).astype(jnp.uint8)
        bounds = np.cumsum(split_sizes(B, self._streams))[:-1]
        return tuple(jnp.split(out_u8, bounds, axis=0))

    # -- face localization ----------------------------------------------------

    def _raw_padded_boxes(self, frames: Sequence[np.ndarray],
                          tracker=None) -> np.ndarray:
        """Detector + pads + face-not-found dump for a chunk of frames
        (reference inference.py:68-99); returns (N, 4) float (x1,y1,x2,y2)
        UN-smoothed boxes. ``tracker`` (detect.RoiTracker) enables the
        small-upload ROI-tracked detection mode across chunks.

        ``frames`` goes down as the sequence it is (possibly a list of
        mmap'd sink views): the detector batches/crops per sub-chunk itself,
        and stacking a whole 64-frame 720p chunk here would cost an extra
        ~180 MB host copy per chunk on the tracked path, which touches only
        small ROIs of a few frames."""
        raw = self.detector.first_face_boxes(frames, tracker=tracker)
        return self._pad_boxes(raw, frames)

    def _pad_boxes(self, raw, frames: Sequence[np.ndarray]) -> np.ndarray:
        """Pads + face-not-found handling over raw detector boxes
        (reference inference.py:88-99)."""
        icfg = self.cfg.infer
        pady1, pady2, padx1, padx2 = icfg.pads
        results = []
        for rect, image in zip(raw, frames):
            if rect is None:
                os.makedirs("temp", exist_ok=True)
                cv2.imwrite("temp/faulty_frame.jpg", image)
                raise FaceNotDetectedError(
                    "Face not detected! Ensure the video contains a face in "
                    "all the frames."
                )
            x1, y1, x2, y2 = rect
            results.append([
                max(0, x1 - padx1),
                max(0, y1 - pady1),
                min(image.shape[1], x2 + padx2),
                min(image.shape[0], y2 + pady2),
            ])
        return np.asarray(results, np.float64)

    def _face_boxes(
        self, frames: Sequence[np.ndarray], static: bool
    ) -> List[Tuple[int, int, int, int]]:
        """Per-frame (y1, y2, x1, x2) after pads and temporal smoothing
        (reference inference.py:68-106)."""
        icfg = self.cfg.infer
        if icfg.box[0] != -1:
            y1, y2, x1, x2 = icfg.box
            return [(y1, y2, x1, x2)] * len(frames)

        if self.detector is None:
            raise ValueError(
                "no face detector configured: pass --box or provide S3FD weights"
            )
        targets = frames[:1] if static else frames
        boxes = self._raw_padded_boxes(targets)
        if not icfg.nosmooth:
            boxes = smooth_boxes(boxes, T=icfg.smooth_window)
        return [
            (int(y1), int(y2), int(x1), int(x2)) for x1, y1, x2, y2 in boxes
        ]

    # -- main entry ------------------------------------------------------------

    def run(
        self,
        face_path: str,
        audio_path: str,
        outfile: str,
        fps: Optional[float] = None,
        temp_dir: str = "temp",
        tail: str = "right_align",
        skip_if_short: bool = False,
        _force_buffered: bool = False,
    ) -> str:
        """Lip-sync ``face_path`` to ``audio_path`` into ``outfile``.

        ``tail`` selects the final-mel-chunk policy: ``"right_align"`` is the
        product behavior (inference.py:236-237); ``"drop"`` is the eval
        harness's (gen_videos_from_filelist.py:178-183). ``skip_if_short``
        raises :class:`VideoTooShortError` when the clip has fewer frames
        than mel chunks instead of cycling frames (eval harness,
        gen_videos_from_filelist.py:195-196).
        """
        icfg = self.cfg.infer
        static = icfg.static
        self.timings = StageTimer()
        # per-run producer-thread shutdown hooks (decode threads writing
        # into the sink's mmap views): error cleanup must stop them BEFORE
        # touching the sink (see PreallocRawAVIWriter.abort)
        self._producer_stops: List = []
        os.makedirs(temp_dir, exist_ok=True)

        # 1. audio → mel (+ NaN guard for TTS audio, inference.py:228-229)
        with self.timings("audio"):
            wav_path = extract_audio(
                audio_path, os.path.join(temp_dir, "temp.wav"),
                self.cfg.audio.sample_rate,
            )
            wav = load_wav(wav_path, self.cfg.audio.sample_rate)
            mel = self.mel.melspectrogram(wav)
        if np.isnan(mel).any():
            raise ValueError(
                "Mel contains nan! Using a TTS voice? Add a small epsilon "
                "noise to the wav file and try again"
            )

        # 2. open the face source (reference inference.py:182-213)
        reader: Optional[VideoFrameReader] = None
        first_frame: np.ndarray
        if face_path.lower().endswith(IMAGE_EXTS):
            img = cv2.imread(face_path)
            if img is None:
                raise ValueError(f"could not read image: {face_path}")
            first_frame = img
            static = True
            video_fps = fps or icfg.fps
            hinted_count = 1
        else:
            reader = VideoFrameReader(
                face_path,
                resize_factor=icfg.resize_factor,
                rotate=icfg.rotate,
                crop=icfg.crop,
            )
            video_fps = fps if fps is not None else reader.fps
            hinted_count = reader.approx_frame_count
            with self.timings("decode"):
                head = reader.read()
            if head is None:
                reader.close()
                raise ValueError(f"no frames decoded from {face_path}")
            first_frame = head

        def _reopen():
            return VideoFrameReader(
                face_path,
                resize_factor=icfg.resize_factor,
                rotate=icfg.rotate,
                crop=icfg.crop,
            )

        # 3. chunk plan: one mel window per output frame. The windows stay
        # as (start) indices — the whole mel goes to the device once and the
        # overlapping 16-wide windows are gathered in-graph (_generate_fn)
        starts = mel_chunk_starts(
            mel.shape[1], video_fps, self.cfg.model.mel_step_size, tail=tail
        )
        num_out = len(starts)
        # clip-length bucketing: pad mel columns to a multiple of 512
        # (~6.4 s of audio) so arbitrary clip lengths hit a handful of
        # compiled graphs instead of one retrace per length
        M = mel.shape[1]
        Mp = ((M + 511) // 512) * 512
        mel_padded = np.zeros((mel.shape[0], Mp), np.float32)
        mel_padded[:, :M] = mel

        # 3b. output sink — created up front (frame count and size are now
        # known) so a preallocated in-place writer can hand its memory-mapped
        # frame views to the decoder: pixels then land directly in the output
        # file and the encode/write stages vanish (io.video.PreallocRawAVIWriter)
        mux = has_ffmpeg()
        # without ffmpeg the intermediate IS the deliverable: write it at the
        # final path and skip a whole-file copy
        tmp_video = os.path.join(temp_dir, "result.avi") if mux else outfile
        os.makedirs(os.path.dirname(os.path.abspath(tmp_video)), exist_ok=True)
        writer = make_frame_writer(
            tmp_video, video_fps, first_frame.shape[:2],
            codec=icfg.codec, jpeg_quality=icfg.jpeg_quality,
            n_frames_hint=num_out,
        )
        view_of = (writer.frame_view
                   if isinstance(writer, PreallocRawAVIWriter) else None)

        # 4. ingest strategy: stream (decode as needed, free after composite)
        #    when boxes need no random access and the clip is long enough;
        #    materialize otherwise — detection, static, cycling, skip-check
        #    and unreliable headers all need the full frame list (reference
        #    behavior, inference.py:190-213).
        needs_random_access = (
            reader is None
            or static
            or skip_if_short
            or icfg.box[0] == -1      # detector path
            or hinted_count <= 0      # header lied; cannot plan
            or num_out > hinted_count  # short clip: frames will cycle
        )

        try:
            if needs_random_access:
                frames = [first_frame]
                # materialize INTO the preallocated output file whenever the
                # sink and decoder support it: each frame decodes into its
                # own mmap'd payload slot, detection/prep read from the
                # views, and composite is paste-only (``in_place``) — one
                # full-frame copy per output vanishes. Cyclic reuse (audio
                # longer than the clip) is SAFE in-file on the async
                # detector path: a cycled output copies its already-
                # composited source slot and re-pastes over the same box
                # rect, which is byte-identical to compositing the original
                # frame (FrameCrop.cycle_of). The synchronous paths below
                # still need the no-cycling promise.
                infile_ok = (
                    view_of is not None and reader is not None
                    and not static and reader.reads_into_dst
                    and first_frame.shape == view_of(0).shape
                    and not _force_buffered
                )
                frames_in_file = infile_ok and hinted_count >= num_out
                # with the async detector downstream, decode runs in its
                # own producer thread and detection starts on chunk 0 while
                # later frames are still decoding (the decode was a serial
                # prefix of the run before). short_ok: a stream ending
                # before num_out frames (cycling clip, or a lying header)
                # is a normal outcome — consumers cycle over the frames
                # that exist (reference inference.py:121).
                # skip_if_short must know the final count up front, so it
                # keeps the synchronous decode.
                async_decode = None
                detector_path = (not skip_if_short and not static
                                 and reader is not None
                                 and self.detector is not None
                                 and icfg.box[0] == -1)
                if detector_path and infile_ok:
                    frames_in_file = True
                    workers = self._decode_workers()
                    if (workers > 1 and hinted_count >= num_out
                            and num_out >= 8 * workers):
                        try:
                            async_decode = _ParallelDecode(
                                self, reader, first_frame, view_of,
                                num_out, num_out, workers, _reopen,
                            )
                        except _SeekUnsupported:
                            pass
                    if async_decode is None:
                        async_decode = _AsyncDecode(
                            self, reader, first_frame, view_of, num_out,
                            short_ok=True,
                        )
                    frames = async_decode.frames
                elif detector_path and not _force_buffered:
                    # no in-place sink (encoded writer / shape mismatch):
                    # decode still overlaps detection via a producer
                    # thread, into RAM buffers instead of sink views
                    async_decode = _AsyncDecode(self, reader, first_frame,
                                                view_of=None,
                                                num_out=num_out,
                                                short_ok=True)
                    frames = async_decode.frames
                # static mode only ever touches frame 0 — skip the rest of
                # the decode (the reference decodes everything regardless,
                # inference.py:190-213)
                if reader is not None and not static and async_decode is None:
                    if frames_in_file:
                        # same decode-into-views protocol, waited to
                        # completion here (skip_if_short / no-detector paths
                        # need the final frame count up front)
                        sync_decode = _AsyncDecode(self, reader, first_frame,
                                                   view_of, num_out)
                        try:
                            sync_decode.wait_upto(num_out)
                            frames = sync_decode.frames
                        except _ShortStreamRestart:
                            # short stream → frames will cycle; views alias
                            # output slots, so fall back to RAM copies
                            frames = [np.array(f)
                                      for f in sync_decode.frames]
                            frames_in_file = False
                    else:
                        with self.timings("decode"):
                            frames.extend(reader)
                # buffered-async decode: the list is still growing; size the
                # warning from the plan (header hint capped at the output
                # count) instead of the racing live length
                n_planned = len(frames)
                if async_decode is not None and async_decode.view_of is None:
                    n_planned = (min(hinted_count, num_out)
                                 if hinted_count > 0 else num_out)
                est_gb = n_planned * first_frame.nbytes / 1e9
                if not frames_in_file and est_gb > icfg.max_buffer_gb:
                    warnings.warn(
                        f"buffering {est_gb:.1f} GB of frames (needs random "
                        f"access: detection/static/cycling); raise "
                        f"infer.max_buffer_gb to silence"
                    )
                if skip_if_short and not static and len(frames) < num_out:
                    raise VideoTooShortError(
                        f"{face_path}: {len(frames)} frames < {num_out} "
                        f"mel chunks"
                    )
                if not static and async_decode is None:
                    frames = frames[:num_out]  # live async list never sliced
                self._static_frame = frames[0] if static else None
                if (self.detector is not None and not static
                        and icfg.box[0] == -1):
                    # detection overlaps generation: boxes are produced by a
                    # background thread and consumed as the prep loop needs
                    # them (the reference detects ALL frames before
                    # generating any, inference.py:108-121)
                    box_of = _AsyncBoxes(
                        self, frames,
                        n=num_out if async_decode is not None else None,
                        wait_upto=(async_decode.wait_upto
                                   if async_decode is not None else None),
                    ).get
                else:
                    with self.timings("detect"):
                        boxes = self._face_boxes(frames, static)
                    box_of = (lambda i: boxes[0]) if static else (
                        lambda i: boxes[i]
                    )
                source = self._materialized_source(
                    frames, box_of, static, num_out,
                    in_place=frames_in_file,
                    n_frames=(num_out if async_decode is not None else None),
                    wait_avail=(async_decode.wait_upto
                                if async_decode is not None else None),
                )
            else:
                y1, y2, x1, x2 = icfg.box
                workers = self._decode_workers()
                size = self.img_size
                parallel = None
                if (workers > 1 and view_of is not None
                        and reader.reads_into_dst
                        and hinted_count >= num_out
                        and num_out >= 8 * workers
                        and first_frame.shape == view_of(0).shape):
                    # N-way banded decode straight into the sink, with the
                    # fixed-box 96² face crop computed in each band worker
                    # while the frame is cache-hot; the materialized source
                    # machinery (constant box) assembles outputs in order
                    # and handles a lying header by cycling (cycle_of)
                    try:
                        parallel = _ParallelDecode(
                            self, reader, first_frame, view_of, num_out,
                            num_out, workers, _reopen,
                            face_fn=lambda fr: cv2.resize(
                                fr[y1:y2, x1:x2], (size, size)),
                        )
                    except _SeekUnsupported:
                        parallel = None
                if parallel is not None:
                    source = self._materialized_source(
                        parallel.frames, lambda i: (y1, y2, x1, x2),
                        False, num_out, in_place=True, n_frames=num_out,
                        wait_avail=parallel.wait_upto,
                        faces=parallel.faces,
                    )
                else:
                    source = self._streaming_source(
                        reader, first_frame, (y1, y2, x1, x2), num_out,
                        _reopen,
                        view_of=view_of if reader.reads_into_dst else None,
                    )

            return self._execute(
                source, mel_padded, starts, num_out, static,
                video_fps, wav_path, outfile, writer, tmp_video, mux,
            )
        except BaseException as e:
            # a failed run must not leave a (possibly multi-GB preallocated)
            # partial container behind at the output path. Order matters:
            # stop decode producers FIRST (they write into the sink's mmap
            # views), then release the sink WITHOUT truncating (abort) —
            # shrinking a file under a live MAP_SHARED view SIGBUSes on the
            # next touch, while deleting an aborted file is safe
            for stop in self._producer_stops:
                try:
                    stop()
                except Exception:
                    pass
            try:
                getattr(writer, "abort", writer.close)()
            except Exception:
                pass
            if os.path.exists(tmp_video):
                try:
                    os.remove(tmp_video)
                except OSError:
                    pass
            raise
        finally:
            if reader is not None:
                reader.close()

    # -- frame sources ----------------------------------------------------------

    def _decode_workers(self) -> int:
        """Resolved ``infer.decode_workers``: 0 = auto (min(4, cores - 1),
        so one-core hosts keep the single threaded reader)."""
        w = int(getattr(self.cfg.infer, "decode_workers", 0) or 0)
        if w <= 0:
            w = min(4, max(1, (os.cpu_count() or 1) - 1))
        return w

    def _materialized_source(self, frames, box_of, static: bool,
                             num_out: int, in_place: bool = False,
                             n_frames: Optional[int] = None,
                             wait_avail=None, faces=None):
        """Yield FrameCrops from a materialized frame list (cyclic reuse
        ``i % len(frames)``, inference.py:121). ``box_of(idx)`` supplies the
        face box — possibly blocking on the async detector. In static mode
        the writer composites onto one canvas, so no frame is attached.
        ``in_place``: the frames ARE the output file's mmap'd payload slots
        (one per output — see run()'s ``frames_in_file``), so composite
        needs only the mouth paste. ``n_frames``: planned length of a
        still-growing (async-decoded) list — box_of(idx) is consulted
        FIRST and its readiness implies frames[idx] is decoded.
        ``wait_avail``: the live decoder's ``wait_upto``; the stream may
        end short of the plan and the source then cycles over the frames
        that exist. Buffered cycled outputs never own their (reusable)
        frame; in-place cycled outputs carry ``cycle_of`` instead of a
        frame — the writer copies the already-composited source slot and
        re-pastes (byte-identical, see FrameCrop), with the generator crop
        served from the prep-time cache (``cache_key``)."""
        def gen():
            n = len(frames) if n_frames is None else n_frames
            owns = num_out <= n  # every source frame used at most once
            for i in range(num_out):
                if static:
                    yield FrameCrop(None, box_of(0), False, index=i)
                    continue
                if wait_avail is not None:
                    avail = wait_avail(i + 1)
                    idx = i if i < avail else i % avail
                    owns_i = in_place  # async decode may come up short
                else:
                    idx = i % n
                    owns_i = owns
                box = box_of(idx)  # blocks until detect → decode caught up
                if in_place and idx != i:
                    yield FrameCrop(None, box, False, index=i,
                                    in_place=True, cycle_of=idx)
                    continue
                yield FrameCrop(
                    frames[idx], box, owns_i, index=i, in_place=in_place,
                    face96=(faces[idx] if faces is not None else None),
                    cache_key=(idx if in_place and wait_avail is not None
                               else None),
                )
        return gen()

    def _streaming_source(self, reader, first_frame, coords, num_out: int,
                          reopen=None, view_of=None):
        """Yield FrameCrops straight off the decoder; each frame is owned by
        its output and freed after compositing.

        ``view_of(i)``: optional in-place sink views (PreallocRawAVIWriter) —
        frame ``i`` is decoded DIRECTLY into its final location in the output
        file (the decoder's colorspace conversion is the write), and the
        FrameCrop is flagged ``in_place`` so the composite stage only pastes
        the mouth patch.

        If the container's frame-count hint overestimated and the stream ends
        early, the decoder is re-opened and decoding wraps to frame 0 —
        the same cyclic reuse (``i % n``, inference.py:121) the materialized
        path gives, at the cost of re-decoding instead of buffering. Output
        length always matches the audio."""
        in_place = [False]

        def read_next(idx):
            if view_of is None:
                in_place[0] = False
                return reader.read()
            v = view_of(idx)
            got = reader.read(dst=v)
            if (got is not None and not np.shares_memory(got, v)
                    and got.shape == v.shape):
                np.copyto(v, got)  # decoder refused the dst; salvage in-place
                got = v
            in_place[0] = got is not None and np.shares_memory(got, v)
            return got

        y1, y2, x1, x2 = coords
        size = self.img_size

        def gen():
            nonlocal reader
            frame = first_frame
            if view_of is not None and frame is not None:
                # frame 0 was decoded before the sink existed
                v = view_of(0)
                if frame.shape == v.shape:
                    np.copyto(v, frame)
                    frame = v
                    in_place[0] = True
            for i in range(num_out):
                if frame is None and reopen is not None:
                    warnings.warn(
                        f"video ended after {i} frames but {num_out} outputs "
                        f"were planned (container frame-count hint was "
                        f"wrong); re-decoding from the start to cycle frames"
                    )
                    reader.close()
                    reader = reopen()
                    with self.timings("decode"):
                        frame = read_next(i)
                if frame is None:
                    warnings.warn(
                        f"video ended after {i} frames but {num_out} outputs "
                        f"were planned; output truncated"
                    )
                    return
                # the box is fixed here, so the 96² face crop is produced
                # right after the decode while the frame is cache-hot — the
                # prep loop then only memcpys it into the device batch
                with self.timings("prep"):
                    face = cv2.resize(frame[y1:y2, x1:x2], (size, size))
                yield FrameCrop(frame, coords, True, index=i,
                                in_place=in_place[0], face96=face)
                if i + 1 < num_out:
                    with self.timings("decode"):
                        frame = read_next(i + 1)

        # decode runs in its own producer thread: on multi-core hosts the
        # container decode fully overlaps prep/generate/composite (it was
        # the single largest stage of the primary bench once encode/write
        # vanished), and cv2's decoder releases the GIL so even one core
        # gets partial overlap. In-place sinks decode straight into the
        # output file, so a deep lookahead costs no RAM; the buffered path
        # holds `depth` full frames, so it stays shallow.
        return self._threaded_source(gen(),
                                     depth=64 if view_of is not None else 8)

    def _register_producer(self, stop_fn) -> None:
        """Register a per-run producer-thread shutdown hook; run()'s error
        cleanup invokes them before releasing the output sink."""
        if not hasattr(self, "_producer_stops"):
            self._producer_stops = []
        self._producer_stops.append(stop_fn)

    def _threaded_source(self, inner, depth: int):
        """Run a frame-source generator in a producer thread behind a
        bounded queue. Exceptions cross to the consumer; a sentinel marks
        exhaustion. The consumer (prep loop) blocks at most on one frame."""
        q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        end = object()
        stop = [False]  # consumer gone — unblock and retire the producer

        def put(item) -> bool:
            while not stop[0]:
                try:
                    q.put(item, timeout=_QUEUE_POLL_S)
                    return True
                except queue.Full:
                    continue
            return False

        def run():
            try:
                for item in inner:
                    if not put(item):
                        return
                put(end)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(e)

        thread = threading.Thread(target=run, daemon=True,
                                  name="w2l-decode")

        def shutdown():
            stop[0] = True
            thread.join(timeout=10.0)

        self._register_producer(shutdown)
        thread.start()

        def gen():
            try:
                while True:
                    item = q.get()
                    if item is end:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop[0] = True  # runs on exhaustion AND on early close
        return gen()

    # -- pipelined execution -----------------------------------------------------

    def _execute(self, source, mel_padded, starts, num_out: int, static: bool,
                 video_fps, wav_path, outfile, writer, tmp_video,
                 mux: bool) -> str:
        icfg = self.cfg.infer
        size = self.img_size
        # clip-length-adaptive dispatch granularity: a short clip split into
        # one user-sized batch serializes the whole pipeline (generation
        # waits on the LAST box, composite waits on the whole batch), so the
        # dispatch batch shrinks until ≥4 batches flow through the stage
        # threads. Power-of-two buckets (min 16) keep the compiled-graph
        # count small; the user batch (reference --wav2lip_batch_size) stays
        # the cap, and mesh runs keep it exactly (shard divisibility).
        B = self.batch_size
        if self.mesh is None and num_out > 0:
            target = max(16, -(-num_out // 4))
            p = 16
            while p < target:
                p *= 2
            B = min(B, p)

        # whole-clip mel: ONE upload per run; batches carry only the int32
        # window starts (the 16-wide windows are gathered in-graph)
        with self.timings("generate"):
            if self.mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as _P

                mel_dev = jax.device_put(
                    mel_padded, NamedSharding(self.mesh, _P())
                )
            else:
                mel_dev = jax.device_put(mel_padded)

        prep_q: "queue.Queue" = queue.Queue(maxsize=_QUEUE_DEPTH)
        pred_q: "queue.Queue" = queue.Queue(maxsize=_QUEUE_DEPTH)
        errors: List[BaseException] = []
        written = [0]

        # static mode: upload the face crop once, reuse the device array
        static_face_dev = None
        static_canvas = None

        def _put(q, item):
            while not errors:
                try:
                    q.put(item, timeout=_QUEUE_POLL_S)
                    return True
                except queue.Full:
                    continue
            return False

        def _get(q):
            while not errors:
                try:
                    return q.get(timeout=_QUEUE_POLL_S)
                except queue.Empty:
                    continue
            return None

        def dispatch_batch(faces, starts_b):
            """Upload one batch and dispatch the generator; returns the
            un-fetched device output (jit dispatch is async)."""
            if self.mesh is not None:
                # data-parallel path: batch-axis sharded global arrays;
                # per-device slices move concurrently
                starts_dev = put_mesh_batch(starts_b, self.mesh)
                if isinstance(faces, np.ndarray):
                    face_parts = (put_mesh_batch(faces, self.mesh),)
                else:  # static: replicated (1,...) crop
                    face_parts = (faces,)
            else:
                # concurrent copy streams up, in-graph reassembly
                starts_dev = jax.device_put(starts_b)
                if isinstance(faces, np.ndarray):
                    face_parts = tuple(put_sharded(faces, self._streams))
                else:  # static: already-device (1,...) crop
                    face_parts = (faces,)
            key = (tuple(tuple(p.shape) for p in face_parts),
                   tuple(mel_dev.shape), tuple(starts_dev.shape))
            self.dispatch_stats[key] = self.dispatch_stats.get(key, 0) + 1
            out = self._jit_generate(self.vars, mel_dev, starts_dev,
                                     face_parts)
            # start the D2H copy NOW (it queues behind the compute): by the
            # time this batch is popped from the in-flight window the bytes
            # are host-side and the blocking fetch is a local memcpy instead
            # of a GIL-holding wait on the link
            for part in out:
                try:
                    part.copy_to_host_async()
                except AttributeError:
                    break
            return out

        def fetch_preds(pred_parts) -> np.ndarray:
            if self.mesh is not None:
                return fetch_mesh_batch(pred_parts[0])
            return fetch_concat(pred_parts)

        def device_worker():
            # eager dispatch with a multi-batch in-flight window: jit
            # dispatch and device_put are async, so batches k+1..k+K upload
            # and compute while batch k's output crosses back to the host —
            # the link runs both directions at once, round-trip latency
            # amortizes over K batches, and the device never idles
            inflight: "deque" = deque()  # (un-fetched device output, crops)
            K = max(1, icfg.inflight_batches)
            try:
                while True:
                    item = _get(prep_q)
                    if item is None:
                        break
                    faces, starts_b, crops = item
                    if not crops:  # sentinel: pass through without running
                        break
                    with self.timings("generate"):
                        inflight.append(
                            (dispatch_batch(faces, starts_b), crops)
                        )
                        if len(inflight) >= K:
                            out, pcrops = inflight.popleft()
                            preds = fetch_preds(out)
                            if not _put(pred_q, (preds, pcrops)):
                                return
                while inflight:
                    with self.timings("generate"):
                        out, pcrops = inflight.popleft()
                        preds = fetch_preds(out)
                    if not _put(pred_q, (preds, pcrops)):
                        return
                _put(pred_q, (None, []))
            except BaseException as e:  # noqa: BLE001 — repropagated in main
                errors.append(e)
                try:
                    pred_q.put_nowait((None, []))
                except queue.Full:
                    pass

        def writer_worker():
            try:
                if isinstance(writer, PreallocRawAVIWriter):
                    inplace_writer_loop()
                else:
                    encoded_writer_loop()
            except BaseException as e:  # noqa: BLE001 — repropagated in main
                errors.append(e)
            finally:
                try:
                    if errors:
                        # decode producers may still hold live views into
                        # the sink — abort releases without the truncate
                        # that would SIGBUS them; run() deletes the file
                        getattr(writer, "abort", writer.close)()
                    else:
                        writer.close()
                except BaseException as e:  # noqa: BLE001
                    if not errors:
                        errors.append(e)

        def inplace_writer_loop():
            """Composite straight into the memory-mapped output file. Frames
            decoded in place (``c.in_place``) need only the mouth paste;
            materialized/static frames are memcpy'd into their view first.
            No ordering constraint exists (each frame owns its file slot), no
            encode exists, and the per-frame work is ≤0.5 ms — so this stays
            a simple serial loop with no thread pool."""
            while True:
                item = _get(pred_q)
                if item is None:
                    return
                preds, crops = item
                if not crops:
                    return
                for j, c in enumerate(crops):
                    y1, y2, x1, x2 = c.coords
                    with self.timings("composite"):
                        if c.cycle_of is not None:
                            # cycled output: source slot is already
                            # composited AND committed (this loop is serial
                            # in output order and cycle_of < index); the
                            # paste below fully overwrites the one rect
                            # where it differs from the original frame
                            out = writer.frame_view(c.index)
                            np.copyto(out, writer.frame_view(c.cycle_of))
                        elif c.in_place:
                            out = c.frame
                        else:
                            out = writer.frame_view(c.index)
                            np.copyto(
                                out,
                                c.frame if c.frame is not None
                                else self._static_frame,
                            )
                        view = out[y1:y2, x1:x2]
                        res = cv2.resize(preds[j], (x2 - x1, y2 - y1),
                                         dst=view)
                        if not np.shares_memory(res, out):
                            view[:] = res
                    writer.commit(c.index)
                    written[0] += 1

        def encoded_writer_loop():
            nonlocal static_canvas
            from concurrent.futures import ThreadPoolExecutor

            def composite_encode_one(writer, pred, c):
                """Paste one predicted mouth patch into its frame and encode
                it to the writer's chunk payload (stateless per frame)."""
                y1, y2, x1, x2 = c.coords
                with self.timings("composite"):
                    out = c.frame if c.owns_frame else c.frame.copy()
                    # resize straight into the frame view — skips the
                    # intermediate patch buffer; cv2 honors a strided dst of
                    # matching shape (falls back to copy when it reallocates)
                    view = out[y1:y2, x1:x2]
                    res = cv2.resize(pred, (x2 - x1, y2 - y1), dst=view)
                    if not np.shares_memory(res, out):
                        view[:] = res
                with self.timings("encode"):
                    return writer.encode_frame(out)

            # composite AND per-frame encode are frame-independent (each
            # pastes into its own decoded frame; encode_frame is stateless)
            # and cv2 releases the GIL in both, so fan them out to a small
            # pool and keep only the ordered container WRITES serial. On a
            # one-core host this degenerates to the serial loop; on the
            # multi-core hosts the bench runs on it takes composite+encode
            # off the serial writer path entirely (the reference composites
            # and writes serially per frame, inference.py:267-272). Static
            # mode shares one canvas across outputs — inherently sequential
            # — and keeps the inline path.
            pool_workers = min(4, os.cpu_count() or 1)
            pool = ThreadPoolExecutor(
                max_workers=pool_workers,
                thread_name_prefix="w2l-composite",
            )
            try:
                while True:
                    item = _get(pred_q)
                    if item is None:
                        break
                    preds, crops = item
                    if not crops:
                        break
                    if crops[0].frame is None:  # static: one canvas
                        for j, c in enumerate(crops):
                            y1, y2, x1, x2 = c.coords
                            with self.timings("composite"):
                                if static_canvas is None:
                                    static_canvas = (
                                        self._static_frame.copy()
                                    )
                                view = static_canvas[y1:y2, x1:x2]
                                res = cv2.resize(
                                    preds[j], (x2 - x1, y2 - y1),
                                    dst=view,
                                )
                                if not np.shares_memory(res,
                                                        static_canvas):
                                    view[:] = res
                            with self.timings("encode"):
                                writer.write(static_canvas)
                            written[0] += 1
                        continue
                    # bounded in-flight window: submitting the whole
                    # batch would pin up to batch_size completed
                    # payloads (full frames under codec="raw", ~800 MB
                    # at 1080p x 128) while the serial writes drain
                    it = iter(range(len(crops)))
                    futs: "deque" = deque()
                    for j in it:
                        futs.append(pool.submit(
                            composite_encode_one, writer, preds[j],
                            crops[j]))
                        if len(futs) >= 2 * pool_workers:
                            break
                    while futs:
                        done = futs.popleft()
                        for j in it:
                            futs.append(pool.submit(
                                composite_encode_one, writer, preds[j],
                                crops[j]))
                            break
                        # .result() waits on the pool (composite/encode
                        # time, already counted); only the container
                        # append itself is the "write" stage
                        payload = done.result()
                        with self.timings("write"):
                            writer.write_encoded(payload)
                        written[0] += 1
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        dev_t = threading.Thread(target=device_worker, daemon=True)
        wri_t = threading.Thread(target=writer_worker, daemon=True)
        dev_t.start()
        wri_t.start()

        # main thread: decode (inside `source`) + crop/resize prep
        produced = 0
        src_iter = iter(source)
        stopped_early = False
        # source idx -> ORIGINAL (pre-paste) 96² face crop, filled on each
        # frame's first pass; in-place CYCLED outputs (cycle_of) read their
        # generator input here — the sink slot they reuse is composited
        face_cache: dict = {}
        try:
            while produced < num_out and not errors:
                n = min(B, num_out - produced)
                crops: List[FrameCrop] = []
                with self.timings("prep"):
                    face_batch = None
                    for j in range(n):
                        try:
                            c = next(src_iter)
                        except StopIteration:
                            stopped_early = True
                            break
                        crops.append(c)
                        if c.cycle_of is not None:
                            if face_batch is None:
                                face_batch = np.zeros(
                                    (B, size, size, 3), np.uint8
                                )
                            face_batch[j] = face_cache[c.cycle_of]
                        elif c.frame is not None:
                            if face_batch is None:
                                face_batch = np.zeros(
                                    (B, size, size, 3), np.uint8
                                )
                            if c.face96 is not None:
                                face_batch[j] = c.face96
                                if c.cache_key is not None:
                                    face_cache[c.cache_key] = c.face96
                            else:
                                y1, y2, x1, x2 = c.coords
                                f96 = cv2.resize(
                                    c.frame[y1:y2, x1:x2], (size, size)
                                )
                                face_batch[j] = f96
                                if c.cache_key is not None:
                                    face_cache[c.cache_key] = f96
                    if not crops:
                        break
                    if face_batch is None:  # static: single uploaded crop
                        if static_face_dev is None:
                            y1, y2, x1, x2 = crops[0].coords
                            face = cv2.resize(
                                self._static_frame[y1:y2, x1:x2], (size, size)
                            )
                            if self.mesh is not None:
                                from jax.sharding import NamedSharding
                                from jax.sharding import PartitionSpec as _P

                                static_face_dev = jax.device_put(
                                    face[None],
                                    NamedSharding(self.mesh, _P()),
                                )
                            else:
                                static_face_dev = jax.device_put(face[None])
                        faces_in = static_face_dev
                    else:
                        faces_in = face_batch
                    # padding rows gather window 0; discarded on the host
                    starts_b = np.zeros(B, np.int32)
                    starts_b[: len(crops)] = (
                        starts[produced : produced + len(crops)]
                    )
                if not _put(prep_q, (faces_in, starts_b, crops)):
                    break
                produced += len(crops)
                if stopped_early:
                    break
            # sentinel: empty crops flows through both workers
            _put(prep_q, (None, None, []))
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
        dev_t.join()
        wri_t.join()
        if errors:
            raise errors[0]
        assert written[0] == produced, (written[0], produced)

        # mux (reference inference.py:276-277). Without ffmpeg the container
        # at outfile already holds the frames (no-copy path); the wav is
        # embedded as a PCM stream in place — byte patches + an append, no
        # video byte moves (io.video.embed_wav_audio).
        with self.timings("mux"):
            if mux:
                return mux_audio(tmp_video, wav_path, outfile, move=True)
            if embed_wav_audio(outfile, wav_path):
                print(
                    f"[wav2lip_tpu] ffmpeg not found: embedded PCM audio "
                    f"into the AVI container at {outfile}"
                )
            else:
                print(
                    f"[wav2lip_tpu] ffmpeg not found: wrote video without "
                    f"audio track to {outfile}"
                )
            return outfile

    # _static_frame is set in run() before _execute for static mode
    _static_frame: Optional[np.ndarray] = None
