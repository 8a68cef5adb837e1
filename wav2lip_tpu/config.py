"""Configuration tree for wav2lip_tpu.

The reference keeps a single mutable ``HParams`` singleton (hparams.py:32-95)
that is mutated mid-training by the sync-loss curriculum trigger
(wav2lip_train.py:254). Here the configuration is a tree of frozen dataclasses;
anything that changes during a run (e.g. the curriculum weight) is *runtime
state*, threaded through jitted step functions as an argument, never global
mutable config.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class AudioConfig:
    """Mel-spectrogram frontend constants (reference: hparams.py:33-73).

    With the defaults, mel frames advance at sample_rate/hop_size = 80 frames
    per second, i.e. exactly 3.2 mel frames per video frame at 25 fps — the
    alignment every window computation in the framework relies on.
    """

    num_mels: int = 80
    n_fft: int = 800
    hop_size: int = 200
    win_size: int = 800
    sample_rate: int = 16000
    preemphasize: bool = True
    preemphasis: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    fmin: float = 55.0
    fmax: float = 7600.0
    signal_normalization: bool = True
    allow_clipping_in_normalization: bool = True
    symmetric_mels: bool = True
    max_abs_value: float = 4.0
    # Audio rescaling prior to preprocessing (reference: hparams.py:35-36).
    rescale: bool = True
    rescaling_max: float = 0.9

    @property
    def mel_frames_per_second(self) -> float:
        return self.sample_rate / self.hop_size


@dataclass(frozen=True)
class ModelConfig:
    """Shapes shared by all three nets (reference: hparams.py:76-77 and the
    constants duplicated across the train scripts: syncnet_T=5,
    syncnet_mel_step_size=16 — wav2lip_train.py:37-38)."""

    img_size: int = 96
    fps: float = 25.0
    syncnet_T: int = 5
    mel_step_size: int = 16


@dataclass(frozen=True)
class TrainConfig:
    """Training schedule constants (reference: hparams.py:79-94)."""

    batch_size: int = 16
    initial_learning_rate: float = 1e-4
    num_workers: int = 16
    checkpoint_interval: int = 3000
    eval_interval: int = 3000
    save_optimizer_state: bool = True
    # train-step compute dtype. "float32" = reference parity (default).
    # "bfloat16" = mixed precision: forward/backward on the MXU in bf16 with
    # float32 master params / optimizer state / stored BN stats and float32
    # loss reductions (no loss scaling needed — bf16 keeps f32's exponent).
    compute_dtype: str = "float32"
    # rematerialize model forwards in the backward pass (jax.checkpoint):
    # ~1/3 more FLOPs for far less activation memory — enables larger
    # per-chip batches. Numerics identical; off by default.
    remat: bool = False

    # Adaptive curriculum: syncnet_wt starts at 0 and flips to 0.01 (plain) or
    # 0.03 (GAN) once eval sync loss dips below sync_loss_curriculum_threshold
    # (reference: wav2lip_train.py:253-254, hq_wav2lip_train.py:289-290).
    syncnet_wt: float = 0.0
    syncnet_wt_after_trigger: float = 0.01
    sync_loss_curriculum_threshold: float = 0.75

    syncnet_batch_size: int = 64
    syncnet_lr: float = 1e-4
    syncnet_eval_interval: int = 10000
    syncnet_checkpoint_interval: int = 10000

    disc_wt: float = 0.07
    disc_initial_learning_rate: float = 1e-4
    # GAN variant uses Adam betas (0.5, 0.999) for BOTH optimizers
    # (reference: hq_wav2lip_train.py:421-424); the plain trainer uses torch
    # defaults (0.9, 0.999).
    gan_adam_b1: float = 0.5
    adam_b1: float = 0.9
    adam_b2: float = 0.999

    eval_steps_syncnet: int = 1400
    eval_steps_wav2lip: int = 700
    eval_steps_gan: int = 300


@dataclass(frozen=True)
class InferConfig:
    """Inference pipeline knobs (reference: inference.py:11-54 argparse)."""

    static: bool = False
    fps: float = 25.0
    pads: Tuple[int, int, int, int] = (0, 10, 0, 0)  # top, bottom, left, right
    face_det_batch_size: int = 16
    wav2lip_batch_size: int = 128
    resize_factor: int = 1
    crop: Tuple[int, int, int, int] = (0, -1, 0, -1)  # top, bottom, left, right
    box: Tuple[int, int, int, int] = (-1, -1, -1, -1)  # top, bottom, left, right
    rotate: bool = False
    nosmooth: bool = False
    smooth_window: int = 5  # bbox temporal smoothing T (inference.py:102)
    img_size: int = 96
    # -- TPU-native performance knobs (no reference equivalent) --
    # intermediate video codec: "auto" = memory-mapped lossless BGR24 AVI
    # when the sink filesystem is RAM-backed with headroom (decode and
    # composite write pixels straight into the output file; encode and write
    # stages vanish), falling back to "mjpeg" otherwise; "mjpeg" = direct
    # MJPG-AVI writer (compact; the ~5 ms/frame JPEG fans out across the
    # composite thread pool, and ~0.3 MB/frame never outruns the disk);
    # "raw" = uncompressed BGR24 AVI (zero encode CPU but 6 MB/frame —
    # 1080p25 needs a ≥155 MB/s sink or writes block on disk writeback); or
    # any cv2 fourcc ("DIVX" for reference parity, "mp4v", ...)
    codec: str = "auto"
    jpeg_quality: int = 90
    # generator compute dtype on device; bfloat16 is TPU-native and visually
    # indistinguishable after the *255 uint8 quantization ("float32" opts out)
    compute_dtype: str = "bfloat16"
    # concurrent host<->device copy streams per batch: the link is per-stream
    # windowed (1 stream ~25 MB/s here, 4 streams >1 GB/s aggregate)
    transfer_streams: int = 4
    # generator batches in flight on the device at once: dispatch and
    # device_put are async, so K batches upload/compute while batch k-K's
    # output downloads — round-trip latency (~70 ms on the tunnel measured
    # here) amortizes over K and the link runs both directions at once
    inflight_batches: int = 3
    # frames are buffered in RAM only while the clip fits this budget (and
    # always when detection/static/cycling needs random access); above it the
    # pipeline streams the decode and frees frames after compositing
    max_buffer_gb: float = 4.0
    # N-way banded decode into the preallocated in-place sink: the clip
    # splits into N contiguous frame ranges, each decoded by its own
    # seeked VideoFrameReader straight into its band of mmap'd output
    # slots (no two workers share a byte — the container preallocates
    # every frame's offset). 0 = auto: min(4, cpu_count - 1), so a
    # one-core host keeps the single threaded reader; 1 = always serial.
    # Engages only when the container header is trusted (hint >= outputs)
    # and the backend seeks frame-accurately (probed per band at open).
    decode_workers: int = 0


@dataclass(frozen=True)
class DetectConfig:
    """S3FD postprocessing constants (reference: sfd_detector.py:41-47,
    detect.py:58-94)."""

    candidate_threshold: float = 0.05  # per-anchor gather gate
    nms_threshold: float = 0.3
    keep_threshold: float = 0.5
    variances: Tuple[float, float] = (0.1, 0.2)
    max_candidates: int = 256  # fixed top-K replacing the dynamic gather
    max_detections: int = 16   # boxes returned per image after NMS
    mean_bgr: Tuple[float, float, float] = (104.0, 117.0, 123.0)
    # S3FD trunk compute dtype: bfloat16 is TPU-native (+37% detect f/s
    # measured); anchor decode and NMS stay float32 regardless. Pixel-exact
    # reference comparisons should set "float32".
    compute_dtype: str = "bfloat16"
    # detection-resolution downscale: frames are host-resized 1/f before the
    # trunk and boxes rescaled f after — f^2 fewer trunk FLOPs and f^2 less
    # upload on the host->device link. 0 = auto (smallest integer f with
    # max(H, W)/f <= downscale_max_side), 1 = off (reference-exact), k>1 =
    # fixed factor. Accuracy-neutral for the product path: boxes are padded,
    # 5-frame smoothed and only consumed as a 96x96 crop window
    # (inference.py:59-66,121-154), so sub-pixel box shifts vanish; keep 1
    # for pixel-exact reference comparisons.
    downscale: int = 0
    downscale_max_side: int = 640
    # ROI-tracked detection (product inference path): after a full-frame
    # keyframe detection, subsequent frames run S3FD on a small square crop
    # around the last box (side = roi_scale x face size, resized to
    # roi_out^2 on the host) instead of the full frame — per-frame
    # host->device traffic drops from megabytes to ~110 KB, which is what
    # keeps detection fast on hosts where the device link degrades to tens
    # of MB/s under bidirectional traffic (measured on the axon tunnel: one
    # device->host fetch permanently drops upload bandwidth 1.4 GB/s ->
    # ~30 MB/s, so full-frame per-frame uploads are unshippable). A
    # full-frame detection re-runs every roi_refresh_every frames and
    # whenever the ROI loses the face. MULTI-FACE SEMANTICS DELTA: the
    # reference re-picks the highest-score face on EVERY frame
    # (face_detection/api.py:69-78); the tracked path follows the
    # previously chosen face between keyframes, so when another face
    # overtakes it in score mid-span the output diverges for at most
    # roi_refresh_every frames and re-anchors to the reference's choice at
    # the next keyframe (tests/test_detect.py::
    # test_two_face_score_flip_reanchors_at_keyframe). False =
    # reference-exact full-frame detection for every frame (eval +
    # preprocess pin this).
    roi_track: bool = True
    # ROI crop resolution: 128 measured best end-to-end on the axon tunnel
    # (A/B on the 720p detect leg, best-of-4: 192² 96.2 f/s, 128² 138.7,
    # 96² 112.1 — upload bytes shrink (192²=110 KB/frame → 128²=48 KB) but
    # 96² pays more host INTER_AREA time than it saves on the link). Box
    # coordinates quantize at the ROI scale (≤6 px at 720p); consumed by
    # the pads + 5-frame smoothing + 96² crop resize downstream
    # (inference.py:59-66,121-154). Faces in the window stay ≥ roi_out /
    # roi_scale ≈ 58 px — far above S3FD's smallest anchor stride.
    roi_out: int = 128
    roi_scale: float = 2.2
    roi_refresh_every: int = 120
    # frames per dispatched ROI sub-chunk. Tracked detection is speculative:
    # ONE window (from the last fetched box) covers the whole span to the
    # next keyframe, sub-chunks of roi_batch crops dispatch back-to-back
    # with no fetch between them, and results fetch in a second phase — the
    # span costs ~one link round trip total, which is the budget that
    # matters on a high-RTT device link (upload->compute->fetch cycles cost
    # hundreds of ms there once the link carries bidirectional traffic). A
    # face that outruns the stale window lands in the per-frame full-frame
    # fallback.
    roi_batch: int = 128


@dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    infer: InferConfig = dataclasses.field(default_factory=InferConfig)
    detect: DetectConfig = dataclasses.field(default_factory=DetectConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = Config()
DEFAULT_AUDIO = DEFAULT_CONFIG.audio
