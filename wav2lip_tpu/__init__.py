"""wav2lip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) lip-sync framework.

A ground-up rebuild of the capabilities of Rudrabha/Wav2Lip ("A Lip Sync Expert
Is All You Need", ACM MM 2020): given talking-head video (or a still image) and
arbitrary audio, re-render the lower half of the face so the lips match the
audio.  Three neural nets (generator U-Net, SyncNet lip-sync expert, visual
quality discriminator) plus an S3FD face detector, a mel-spectrogram audio
frontend, streaming video I/O, three training pipelines and an LSE-D/LSE-C
evaluation harness — all designed TPU-first: NHWC layouts, static XLA shapes,
host/device pipelining, and `jax.sharding` data parallelism.

Subpackages:
  config    — frozen dataclass configuration tree (reference: hparams.py)
  audio     — mel-spectrogram frontend (reference: audio.py)
  data      — window/mel alignment arithmetic + host input pipeline
  models    — Flax model zoo (reference: models/, face_detection/.../net_s3fd.py)
  ops       — jittable ops: NMS, anchor decode, image ops
  detect    — batched face-detection pipeline (reference: face_detection/)
  parallel  — mesh construction and sharding rules
  train     — losses, train states, jitted steps, checkpointing
  infer     — chunked streaming inference pipeline (reference: inference.py)
  eval      — LSE-D / LSE-C scoring harness (reference: evaluation/)
  io        — host-side media I/O (ffmpeg/cv2/wav)
  convert   — PyTorch ``.pth`` checkpoint importer
"""

__version__ = "0.1.0"
