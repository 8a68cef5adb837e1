"""Batched face-detection pipeline.

TPU-native rework of the reference detection stack
(face_detection/api.py:46-78 → sfd_detector.py:41-47 → detect.py:58-94 →
bbox.py:44-64): one jitted graph runs preprocessing, the S3FD conv trunk,
softmax, anchor decode, static top-K candidate selection and masked NMS for a
whole batch of frames — no per-anchor host loop, no device→host round trip
until the final (B, max_out, 5) detections.

Semantics preserved from the reference: BGR inputs flipped to RGB before the
net (api.py:65), mean subtraction with (104, 117, 123) (detect.py:59),
candidate gate 0.05, NMS IoU 0.3, final keep threshold 0.5
(sfd_detector.py:44-46), first (highest-score) face per frame with
coordinates clipped non-negative and truncated to int (api.py:69-78).

Instead of the reference's OOM-halving retry ladder (inference.py:74-85),
batches are padded to a fixed ``batch_size`` so XLA sees one static shape per
input resolution.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.config import DetectConfig
from wav2lip_tpu.models.s3fd import S3FD

from wav2lip_tpu.ops.anchors import decode_all_scales
from wav2lip_tpu.ops.nms import batched_nms
from wav2lip_tpu.utils.cache import enable_compile_cache
from wav2lip_tpu.utils.dtypes import cast_floats_fused
from wav2lip_tpu.utils.transfer import put_mesh_batch, put_sharded, put_tree


class RoiTracker:
    """Mutable per-video state for ROI-tracked detection
    (:meth:`FaceDetectionPipeline.first_face_boxes_tracked`).

    ``last_box`` is the most recent (x1, y1, x2, y2) detection in source
    coordinates; ``since_refresh`` counts frames since the last full-frame
    keyframe detection. One tracker per video — callers create a fresh one
    per clip so state never leaks across inputs.
    """

    def __init__(self):
        self.last_box: Optional[Tuple[float, float, float, float]] = None
        self.since_refresh = 0
        #: frames dispatched ahead (begin_tracked) but not yet fetched —
        #: counts against the refresh budget so dispatch-ahead cannot sail
        #: past a keyframe boundary
        self.inflight = 0
        #: pre-dispatched cold-tracker keyframe (begin_keyframe):
        #: (device handles, scale_back) whose fetch is still in flight
        self.pending_keyframe = None


class FaceDetectionPipeline:
    """Runs S3FD over batches of BGR uint8 frames.

    One compiled executable per (batch_size, H, W); frames batches are padded
    up to ``batch_size`` on the host. Use ``detect_batch`` for raw detections
    or ``first_face_boxes`` for the reference's one-box-per-frame contract.
    """

    def __init__(
        self,
        variables,
        cfg: DetectConfig = DetectConfig(),
        batch_size: int = 16,
        dtype=None,
        transfer_streams: int = 4,
        mesh=None,
    ):
        """``mesh``: optional 1-D mesh — detection batches shard over the
        ``data`` axis and the whole detect graph (trunk, decode, top-K,
        masked NMS: all per-frame math) partitions with zero collectives.
        The TPU-native equivalent of the reference's one-detector-per-GPU
        preprocessing fan-out (preprocess.py:25,32-33,96-99) within one
        host; across hosts, shard the video list (cli/preprocess.py
        --shard/--num_shards).

        ``dtype``: S3FD trunk compute dtype; defaults to
        ``cfg.compute_dtype`` (bfloat16 — +37% detect throughput measured on
        one v5e). Anchor decode and NMS always run float32."""
        enable_compile_cache()
        self.cfg = cfg
        self.batch_size = batch_size
        self.dtype = jnp.dtype(dtype if dtype is not None
                               else getattr(cfg, "compute_dtype", "float32"))
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None
        if self.mesh is not None and batch_size % self.mesh.devices.size:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of the "
                f"{self.mesh.devices.size}-device mesh size"
            )
        self.streams = max(1, transfer_streams)
        self.model = S3FD()
        if self.dtype != jnp.float32:
            variables = cast_floats_fused(variables, self.dtype)
        # weights up ONCE as a fused transfer, passed to the jitted detect as
        # an argument — closure constants would be fetched leaf-by-leaf at
        # lowering time and baked into every cached executable
        self.variables = put_tree(variables, mesh=self.mesh)
        self._jit_detect = jax.jit(self._detect_fn, static_argnums=2)
        # un-monkeypatchable handle for dispatched_flops (bench.py swaps
        # _jit_detect for a synthetic-box wrapper; cost analysis must lower
        # the real program)
        self._jit_detect_impl = self._jit_detect
        # (input shapes, factor) -> dispatch count: every jitted detect call
        # records the program it ran, so FLOPs actually dispatched (ROI
        # crops + keyframes + fallbacks) are reconstructable afterwards —
        # the honest utilization number for ROI-tracked runs, where charging
        # full-frame trunk FLOPs per frame overstates device work ~30x
        self.dispatch_stats: dict = {}

    def reset_dispatch_stats(self) -> None:
        self.dispatch_stats = {}

    def _dispatch(self, parts, factor: int):
        """Single funnel for jitted detect calls: records the dispatch in
        ``dispatch_stats`` and starts the async D2H copy of the outputs."""
        key = (tuple(tuple(p.shape) for p in parts), int(factor))
        self.dispatch_stats[key] = self.dispatch_stats.get(key, 0) + 1
        out = self._jit_detect(self.variables, parts, factor)
        for part in out:
            try:
                part.copy_to_host_async()
            except AttributeError:
                break
        return out

    def dispatched_flops(self) -> float:
        """Analytic FLOPs of every detect program dispatched since the last
        ``reset_dispatch_stats`` — XLA cost analysis of each distinct
        (shapes, factor) program times its call count. Exact for these
        static-shape graphs; lowers hit the compile cache (the programs just
        ran)."""
        total = 0.0
        for (shapes, factor), count in self.dispatch_stats.items():
            parts = tuple(
                jax.ShapeDtypeStruct(s, jnp.uint8) for s in shapes
            )
            ca = self._jit_detect_impl.lower(
                self.variables, parts, factor
            ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            total += float(ca["flops"]) * count
        return total

    def _detect_fn(self, variables, image_parts, factor=1):
        """Batch-axis shards of (B, H, W, 3) uint8 BGR →
        (boxes (B,K,4), scores (B,K), num (B,)) at 1/``factor`` coordinates.

        Frames ship to the device as uint8 (4x less tunnel/PCIe traffic than
        the float32 the reference moves) over concurrent copy streams
        (utils.transfer); the reassembly, BGR→RGB flip, detection-resolution
        decimation, mean subtraction and float cast all run in-graph
        (detect.py:59 semantics). Decimation on device rather than the host:
        a ``factor``×``factor`` mean pool is numerically cv2 INTER_AREA for
        integer factors, and the host-side per-frame cv2.resize it replaces
        was 25 ms/frame of host time on a 1-core box — slower than shipping
        the full-res uint8 frames over the link (~1 GB/s measured) and
        pooling at HBM bandwidth."""
        cfg = self.cfg
        images_bgr = (image_parts[0] if len(image_parts) == 1
                      else jnp.concatenate(image_parts, axis=0))
        x = images_bgr[..., ::-1].astype(self.dtype)  # BGR → RGB (api.py:65)
        if factor > 1:
            b, h, w, c = x.shape
            hh, ww = (h // factor) * factor, (w // factor) * factor
            x = x[:, :hh, :ww].reshape(
                b, hh // factor, factor, ww // factor, factor, c
            ).mean(axis=(2, 4))
        mean = jnp.asarray(cfg.mean_bgr, self.dtype)
        x = x - mean

        heads = self.model.apply(variables, x)
        # trunk compute may be bfloat16; decode needs float32 (bf16 has ~3
        # decimal digits — ±8 px at 1280-px coordinates)
        heads = jax.tree.map(lambda h: h.astype(jnp.float32), heads)
        scores, boxes = decode_all_scales(heads, cfg.variances)

        k = min(cfg.max_candidates, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        valid = top_scores > cfg.candidate_threshold

        out_boxes, out_scores, _ = batched_nms(
            top_boxes.astype(jnp.float32),
            top_scores.astype(jnp.float32),
            valid,
            iou_threshold=cfg.nms_threshold,
            max_out=cfg.max_detections,
        )
        kept = out_scores > cfg.keep_threshold
        num = jnp.sum(kept, axis=1)
        return out_boxes, out_scores, num

    # -- host API -----------------------------------------------------------

    def downscale_factor(self, h: int, w: int) -> int:
        """Detection-resolution divisor for (h, w) frames per
        ``cfg.downscale`` (0 = auto: smallest integer factor bringing the
        long side under ``cfg.downscale_max_side``)."""
        d = int(self.cfg.downscale or 0)
        if d >= 1:
            return d
        side = max(int(h), int(w))
        return max(1, -(-side // int(self.cfg.downscale_max_side)))

    def detect_batch(
        self, frames_bgr: np.ndarray
    ) -> List[List[Tuple[float, float, float, float, float]]]:
        """(N, H, W, 3) uint8 BGR frames → per-frame [(x1,y1,x2,y2,score)]
        lists, score-descending (reference detect_from_batch contract).

        With ``cfg.downscale`` active, the jitted graph mean-pools frames
        1/f before the trunk (f^2 fewer trunk FLOPs) and the returned boxes
        are rescaled by f here.

        Sub-batches run with a small in-flight window: upload and dispatch
        are async, so batch k+1 crosses the link and computes while batch
        k's boxes come back — without the window each sub-batch paid a full
        upload→compute→fetch round trip (the round trip, not the compute,
        is the detection budget on a high-RTT device link).
        """
        from collections import deque

        n = len(frames_bgr)
        first = np.asarray(frames_bgr[0])
        f = self.downscale_factor(*first.shape[:2])
        results: List[List[Tuple]] = []
        inflight: "deque" = deque()  # (un-fetched device outs, valid_count)
        window = 3

        def drain_one():
            handles, valid = inflight.popleft()
            boxes, scores, num = map(np.asarray, handles)
            if f > 1:
                boxes = boxes * float(f)  # back to source coordinates
            for j in range(valid):
                k = int(num[j])
                results.append(
                    [tuple(boxes[j, m]) + (float(scores[j, m]),)
                     for m in range(k)]
                )

        for i in range(0, n, self.batch_size):
            chunk = np.asarray(frames_bgr[i : i + self.batch_size], np.uint8)
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)]
                )
            if self.mesh is not None:
                parts = (put_mesh_batch(chunk, self.mesh),)
            else:
                parts = tuple(put_sharded(chunk, self.streams))
            out = self._dispatch(parts, f)
            inflight.append((out, min(self.batch_size, n - i)))
            if len(inflight) >= window:
                drain_one()
        while inflight:
            drain_one()
        return results

    def first_face_boxes(
        self, frames_bgr, tracker: Optional[RoiTracker] = None
    ) -> List[Optional[Tuple[int, int, int, int]]]:
        """Per-frame first-face int bbox or None — the reference
        ``get_detections_for_batch`` contract (api.py:64-78).

        With ``cfg.roi_track`` and a ``tracker``, detection runs in ROI
        mode (:meth:`first_face_boxes_tracked`); without a tracker the
        reference-exact full-frame path runs for every frame."""
        if (tracker is not None
                and self.cfg.roi_track):
            return self.first_face_boxes_tracked(frames_bgr, tracker)
        out: List[Optional[Tuple[int, int, int, int]]] = []
        for dets in self.detect_batch(frames_bgr):
            if not dets:
                out.append(None)
                continue
            d = np.clip(np.asarray(dets[0][:4]), 0, None)
            x1, y1, x2, y2 = map(int, d)
            out.append((x1, y1, x2, y2))
        return out

    # -- ROI-tracked mode ---------------------------------------------------

    def _roi_window(self, box, h: int, w: int) -> Tuple[int, int, int]:
        """Square ROI (x0, y0, side) around ``box``, clamped in-frame.

        The side snaps to an integer multiple of ``roi_out`` — cv2's
        INTER_AREA has a fast path for integer shrink factors (measured
        3-4× cheaper per frame than the general kernel at these sizes), and
        ``side == roi_out`` skips the resize outright. The multiple chosen
        is the smallest with ``side ≥ roi_scale × face`` — the speculative
        span reuses ONE window for up to ``roi_refresh_every`` frames, so
        the margin around the face is the motion budget; snapping down to
        a barely-covering window (an earlier 1.1× rule) let a face walking
        ~2 px/frame clip the window edge mid-span. When the frame can't
        fit that multiple, the largest in-frame multiple still ≥1.1× the
        face is used; a face too large for any multiple keeps the exact
        clamped side — a window smaller than the face would shed every
        frame into the full-frame fallback, which costs far more than the
        slower resize."""
        x1, y1, x2, y2 = box
        size = max(x2 - x1, y2 - y1)
        m = min(h, w)
        side = int(min(max(self.cfg.roi_out, self.cfg.roi_scale * size), m))
        r = int(self.cfg.roi_out)
        f = min(-(-int(self.cfg.roi_scale * size) // r), m // r)
        if f >= 1 and f * r >= 1.1 * size:
            side = f * r
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        x0 = int(round(min(max(cx - side / 2.0, 0), w - side)))
        y0 = int(round(min(max(cy - side / 2.0, 0), h - side)))
        return x0, y0, side

    def _box_clips_roi(self, rb, x0: int, y0: int, side: int,
                       h: int, w: int, eps: float = 1.0) -> bool:
        """True when a crop-coordinate detection touches a window edge that
        is INTERIOR to the frame — the face likely extends past the stale
        speculative window (it moved since the window was placed), so the
        clipped box under-covers it and the caller re-detects full-frame.
        Window edges lying on the frame boundary are exempt: a face near
        the frame border always touches those, and the full frame could
        not see past them either."""
        r = float(self.cfg.roi_out)
        bx1, by1, bx2, by2 = (float(v) for v in rb[:4])
        return (
            (x0 > 0 and bx1 <= eps)
            or (y0 > 0 and by1 <= eps)
            or (x0 + side < w and bx2 >= r - eps)
            or (y0 + side < h and by2 >= r - eps)
        )

    def _detect_crops(self, crops: np.ndarray) -> List[Optional[np.ndarray]]:
        """Highest-score box per crop (crop coordinates; None = no face) in
        ONE padded jitted call + ONE fetch, regardless of len(crops).

        Separate from :meth:`detect_batch` (which sub-batches to
        ``batch_size``, costing one upload->compute->fetch round trip per
        sub-batch): on a high-latency device link the round trip dominates
        the actual transfer for these ~110 KB crops, so tracked detection
        amortizes it over up to ``cfg.roi_batch`` frames. Pad sizes are
        bucketed to powers-of-two multiples of ``batch_size`` so XLA sees a
        handful of shapes, not one per chunk length."""
        return self._fetch_crop_boxes(self._dispatch_crops(crops),
                                      len(crops))

    def _dispatch_crops(self, crops: np.ndarray):
        """Upload + dispatch the detector on padded crops; returns the
        UN-fetched device (boxes, scores, num) — both upload and jit
        dispatch are async, so back-to-back calls pipeline on the link."""
        n = len(crops)
        bucket = self.batch_size
        while bucket < n:
            bucket *= 2
        pad = bucket - n
        chunk = np.asarray(crops, np.uint8)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)]
            )
        if self.mesh is not None:
            parts = (put_mesh_batch(chunk, self.mesh),)
        else:
            parts = tuple(put_sharded(chunk, self.streams))
        return self._dispatch(parts, 1)

    def _fetch_crop_boxes(self, handles, n: int):
        boxes, scores, num = map(np.asarray, handles)
        return [
            boxes[i, 0] if num[i] > 0 else None for i in range(n)
        ]

    def _dispatch_fullframe_one(self, frame: np.ndarray):
        """Dispatch half of :meth:`_detect_fullframe_one`: upload + jit
        dispatch (both async) for ONE full frame; returns (device handles,
        scale_back) for :meth:`_fetch_fullframe_one`.

        The ``downscale`` decimation runs on the HOST here (cv2 integer-
        factor INTER_AREA — the same box mean the in-graph pool computes,
        modulo uint8 rounding): this path is ROI-mode-only (keyframes and
        fallbacks) and single-frame, so shrinking the upload f²× matters
        more than keeping the pool on device (the link moves ~40-65 MB/s
        per stream; a 720p frame is 2.8 MB, its half-res pool 0.7 MB)."""
        import cv2

        frame = np.ascontiguousarray(frame, np.uint8)
        f = self.downscale_factor(*frame.shape[:2])
        if f > 1:
            h0, w0 = frame.shape[:2]
            frame = cv2.resize(
                frame[: h0 // f * f, : w0 // f * f],
                (w0 // f, h0 // f),
                interpolation=cv2.INTER_AREA,
            )
            scale_back = float(f)
            f = 1
        else:
            scale_back = 1.0
        if self.mesh is not None:
            # mesh-homed weights need a mesh-placed input; a single frame
            # cannot batch-shard, so pad to one frame per device
            n = self.mesh.devices.size
            batch = np.broadcast_to(frame, (n,) + frame.shape)
            parts = (put_mesh_batch(np.ascontiguousarray(batch), self.mesh),)
        else:
            parts = tuple(put_sharded(frame[None], 1))
        return self._dispatch(parts, f), scale_back

    def _fetch_fullframe_one(self, handles, scale_back: float):
        boxes, scores, num = handles
        boxes, num = np.asarray(boxes), np.asarray(num)
        if int(num[0]) < 1:
            return None
        return boxes[0, 0] * scale_back

    def _detect_fullframe_one(self, frame: np.ndarray):
        """Full-frame first-face box for ONE frame through a dedicated
        (1, H, W, 3) graph — keyframes/fallbacks would otherwise pad to
        ``batch_size`` and upload batch_size x the frame bytes for a single
        result."""
        return self._fetch_fullframe_one(*self._dispatch_fullframe_one(frame))

    def begin_keyframe(self, frame: np.ndarray, tracker: RoiTracker) -> None:
        """Pre-dispatch the cold-tracker keyframe detection for ``frame``
        — which must be the FIRST frame the next tracked call will process
        — without blocking on the result: the keyframe's link round trip
        overlaps whatever the caller does next (the infer pipeline calls
        this the moment frame 0 decodes, hiding the fetch under the decode
        of the first detect chunk). No-op on a warm tracker or when a
        keyframe is already in flight; a pre-dispatch that never gets
        consumed (e.g. the caller errors out) is merely a wasted ~0.7 MB
        upload."""
        if tracker.last_box is not None or tracker.pending_keyframe is not None:
            return
        tracker.pending_keyframe = self._dispatch_fullframe_one(
            np.asarray(frame))

    def begin_tracked(self, frames_bgr, tracker: RoiTracker):
        """Dispatch phase of ROI-tracked detection for a chunk of frames:
        place ONE speculative window from the tracker's current box and
        ship the crops WITHOUT fetching results. The caller may dispatch
        further chunks before resolving this one with
        :meth:`finish_tracked`, so N consecutive chunks cost ~one link
        round trip of latency total instead of one each (the round trip,
        not the compute, is the detection budget on a high-RTT device
        link).

        Returns an opaque pending dict whose ``"taken"`` is the number of
        leading frames consumed (bounded by the refresh budget net of
        frames already in flight), or None when the tracker has no box yet
        or the budget is exhausted — the caller then runs the synchronous
        keyframe path (:meth:`first_face_boxes_tracked`). A dispatch-ahead
        window may be one chunk stale; that is within the speculative-span
        staleness the interior-edge-clip fallback in the fetch phase
        already covers."""
        import cv2

        refresh = max(1, int(self.cfg.roi_refresh_every))
        if tracker.last_box is None or tracker.pending_keyframe is not None:
            return None
        budget = refresh - tracker.since_refresh - tracker.inflight
        if budget <= 0 or not len(frames_bgr):
            return None
        take = min(len(frames_bgr), budget)
        frame0 = np.asarray(frames_bgr[0])
        h, w = frame0.shape[:2]
        roi_out = int(self.cfg.roi_out)
        roi_batch = int(self.cfg.roi_batch)
        x0, y0, side = self._roi_window(tracker.last_box, h, w)
        chunks = []  # (k0, k1, un-fetched device outs), k relative
        for k0 in range(0, take, roi_batch):
            k1 = min(take, k0 + roi_batch)
            if side == roi_out:  # snapped to identity: crop is the input
                crops = np.stack([
                    np.asarray(frames_bgr[k])[y0 : y0 + side,
                                              x0 : x0 + side]
                    for k in range(k0, k1)
                ])
            else:
                crops = np.stack([
                    cv2.resize(
                        np.asarray(frames_bgr[k])[y0 : y0 + side,
                                                  x0 : x0 + side],
                        (roi_out, roi_out),
                        interpolation=cv2.INTER_AREA,
                    )
                    for k in range(k0, k1)
                ])
            chunks.append((k0, k1, self._dispatch_crops(crops)))
        tracker.inflight += take
        return {
            "x0": x0, "y0": y0, "side": side, "h": h, "w": w,
            "scale": side / float(roi_out), "chunks": chunks, "taken": take,
        }

    def finish_tracked(
        self, frames_bgr, pending, tracker: RoiTracker
    ) -> List[Optional[Tuple[int, int, int, int]]]:
        """Fetch phase of :meth:`begin_tracked`: resolve the dispatched
        crops, apply the interior-edge-clip check and the ROI-miss
        full-frame fallback per frame, and advance the tracker.
        ``frames_bgr`` must be the same ``pending["taken"]``-frame chunk
        the dispatch consumed (fallbacks re-detect from it). Pendings must
        be finished in dispatch order."""
        x0, y0, side = pending["x0"], pending["y0"], pending["side"]
        h, w, scale = pending["h"], pending["w"], pending["scale"]
        take = pending["taken"]
        tracker.inflight -= take
        out: List[Optional[Tuple[int, int, int, int]]] = [None] * take
        for k0, k1, handles in pending["chunks"]:
            roi_boxes = self._fetch_crop_boxes(handles, k1 - k0)
            for k, rb in zip(range(k0, k1), roi_boxes):
                if rb is not None and self._box_clips_roi(
                        rb, x0, y0, side, h, w):
                    # detection clamped at a stale window's interior
                    # edge: the face moved partly out — the clipped box
                    # under-covers it, so re-detect this frame
                    # full-frame (and re-anchor the track)
                    rb = None
                if rb is None:
                    # lost in ROI — full-frame fallback for this frame
                    fb = self._detect_fullframe_one(
                        np.asarray(frames_bgr[k]))
                    if fb is None:
                        out[k] = None
                        tracker.last_box = None
                        tracker.since_refresh = 0
                        continue
                    rb_full = np.clip(fb, 0, None)
                else:
                    rb_full = np.clip(
                        np.asarray(rb) * scale
                        + np.asarray([x0, y0, x0, y0], np.float64),
                        0, None,
                    )
                out[k] = tuple(int(v) for v in rb_full)
                tracker.last_box = tuple(float(v) for v in rb_full)
                tracker.since_refresh += 1
        return out

    def first_face_boxes_tracked(
        self, frames_bgr, tracker: RoiTracker
    ) -> List[Optional[Tuple[int, int, int, int]]]:
        """ROI-tracked first-face detection (synchronous form).

        Frame 0 of a fresh tracker (and every ``roi_refresh_every`` frames)
        is detected FULL-frame through the standard (downscaled) graph —
        consuming a :meth:`begin_keyframe` pre-dispatch when one is in
        flight; in between, frames run as speculative spans: ONE window
        (from the last fetched box) covers every frame to the next
        keyframe, sub-chunks dispatch back-to-back without waiting on each
        other (:meth:`begin_tracked`) and fetch in a second phase
        (:meth:`finish_tracked`), so a whole span costs ~one round trip.
        A frame whose ROI yields no face falls back to full-frame detection
        of that frame; only a full-frame miss reports None (same contract
        as the untracked path). Box drift vs full-frame detection is
        sub-pixel-to-low-single-digit px, consumed by pads + 5-frame
        smoothing + the 96² crop resize (inference.py:59-66,121-154).
        Staleness is safe: the window is ~2.2x the face and a face that
        outruns it within a span lands in the full-frame fallback."""
        n = len(frames_bgr)
        out: List[Optional[Tuple[int, int, int, int]]] = [None] * n
        refresh = max(1, int(self.cfg.roi_refresh_every))
        i = 0
        while i < n:
            frame = np.asarray(frames_bgr[i])
            if (tracker.last_box is None
                    or tracker.since_refresh >= refresh):
                # keyframe: full-frame detection of this single frame
                pk, tracker.pending_keyframe = tracker.pending_keyframe, None
                if pk is not None and i == 0:
                    kb = self._fetch_fullframe_one(*pk)  # pre-dispatched
                else:
                    kb = self._detect_fullframe_one(frame)
                if kb is None:
                    out[i] = None
                    tracker.last_box = None
                    tracker.since_refresh = 0
                    i += 1
                    continue
                box = np.clip(kb, 0, None)
                out[i] = tuple(int(v) for v in box)
                tracker.last_box = tuple(float(v) for v in box)
                tracker.since_refresh = 0
                i += 1
                continue
            pending = self.begin_tracked(frames_bgr[i:n], tracker)
            take = pending["taken"]
            out[i : i + take] = self.finish_tracked(
                frames_bgr[i : i + take], pending, tracker
            )
            i += take
        return out
