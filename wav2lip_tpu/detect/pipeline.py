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
from wav2lip_tpu.utils.dtypes import cast_floats
from wav2lip_tpu.utils.transfer import put_mesh_batch, put_sharded, put_tree


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
            variables = cast_floats(variables, self.dtype)
        # weights up ONCE as a fused transfer, passed to the jitted detect as
        # an argument — closure constants would be fetched leaf-by-leaf at
        # lowering time and baked into every cached executable
        self.variables = put_tree(variables, mesh=self.mesh)
        self._jit_detect = jax.jit(self._detect_fn)

    def _detect_fn(self, variables, image_parts):
        """Batch-axis shards of (B, H, W, 3) uint8 BGR →
        (boxes (B,K,4), scores (B,K), num (B,)).

        Frames ship to the device as uint8 (4x less tunnel/PCIe traffic than
        the float32 the reference moves) over concurrent copy streams
        (utils.transfer); the reassembly, BGR→RGB flip, mean subtraction and
        float cast run in-graph (detect.py:59 semantics)."""
        cfg = self.cfg
        images_bgr = (image_parts[0] if len(image_parts) == 1
                      else jnp.concatenate(image_parts, axis=0))
        x = images_bgr[..., ::-1].astype(self.dtype)  # BGR → RGB (api.py:65)
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
        d = int(getattr(self.cfg, "downscale", 1) or 0)
        if d >= 1:
            return d
        side = max(int(h), int(w))
        return max(1, -(-side // int(self.cfg.downscale_max_side)))

    def detect_batch(
        self, frames_bgr: np.ndarray
    ) -> List[List[Tuple[float, float, float, float, float]]]:
        """(N, H, W, 3) uint8 BGR frames → per-frame [(x1,y1,x2,y2,score)]
        lists, score-descending (reference detect_from_batch contract).

        With ``cfg.downscale`` active, frames are resized 1/f on the host
        BEFORE upload (cv2 INTER_AREA, ~1 ms/frame — f^2 less link traffic
        and f^2 fewer trunk FLOPs) and the returned boxes are rescaled by f.
        """
        import cv2

        n = len(frames_bgr)
        first = np.asarray(frames_bgr[0])
        f = self.downscale_factor(*first.shape[:2])
        results: List[List[Tuple]] = []
        for i in range(0, n, self.batch_size):
            chunk = np.asarray(frames_bgr[i : i + self.batch_size], np.uint8)
            if f > 1:
                dh, dw = chunk.shape[1] // f, chunk.shape[2] // f
                chunk = np.stack([
                    cv2.resize(fr, (dw, dh), interpolation=cv2.INTER_AREA)
                    for fr in chunk
                ])
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)]
                )
            if self.mesh is not None:
                parts = (put_mesh_batch(chunk, self.mesh),)
            else:
                parts = tuple(put_sharded(chunk, self.streams))
            boxes, scores, num = self._jit_detect(self.variables, parts)
            boxes, scores, num = map(np.asarray, (boxes, scores, num))
            if f > 1:
                boxes = boxes * float(f)  # back to source-frame coordinates
            for j in range(min(self.batch_size, n - i)):
                k = int(num[j])
                results.append(
                    [tuple(boxes[j, m]) + (float(scores[j, m]),) for m in range(k)]
                )
        return results

    def first_face_boxes(
        self, frames_bgr: np.ndarray
    ) -> List[Optional[Tuple[int, int, int, int]]]:
        """Per-frame first-face int bbox or None — the reference
        ``get_detections_for_batch`` contract (api.py:64-78)."""
        out: List[Optional[Tuple[int, int, int, int]]] = []
        for dets in self.detect_batch(frames_bgr):
            if not dets:
                out.append(None)
                continue
            d = np.clip(np.asarray(dets[0][:4]), 0, None)
            x1, y1, x2, y2 = map(int, d)
            out.append((x1, y1, x2, y2))
        return out
