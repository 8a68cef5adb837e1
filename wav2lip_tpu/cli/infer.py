"""Lip-sync inference CLI.

Flag-for-flag parity with the reference entry point (inference.py:11-53):

    python -m wav2lip_tpu.cli.infer --checkpoint_path ckpt --face video.mp4 \
        --audio speech.wav --outfile results/result_voice.mp4 \
        [--static] [--fps 25] [--pads 0 10 0 0] [--wav2lip_batch_size 128] \
        [--resize_factor 1] [--crop 0 -1 0 -1] [--box -1 -1 -1 -1] \
        [--rotate] [--nosmooth] [--face_det_batch_size 16] \
        [--s3fd_checkpoint path]

``--checkpoint_path`` accepts an Orbax checkpoint directory or a reference
torch ``.pth``. ``--s3fd_checkpoint`` supplies detector weights; with
``--box`` the detector is never loaded (the CPU-runnable minimum slice).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Lip-sync videos in the wild with the TPU-native Wav2Lip"
    )
    p.add_argument("--checkpoint_path", required=True,
                   help="generator weights: Orbax dir or torch .pth")
    p.add_argument("--face", required=True,
                   help="video/image containing the face")
    p.add_argument("--audio", required=True,
                   help="audio source (wav, or any media if ffmpeg is present)")
    p.add_argument("--outfile", default="results/result_voice.mp4")
    p.add_argument("--static", action="store_true", default=False,
                   help="use only the first frame")
    p.add_argument("--fps", type=float, default=25.0,
                   help="fps when --face is a still image")
    p.add_argument("--pads", nargs=4, type=int, default=[0, 10, 0, 0],
                   metavar=("T", "B", "L", "R"),
                   help="bbox padding; include the chin at least")
    p.add_argument("--face_det_batch_size", type=int, default=16)
    p.add_argument("--wav2lip_batch_size", type=int, default=128)
    p.add_argument("--resize_factor", type=int, default=1)
    p.add_argument("--crop", nargs=4, type=int, default=[0, -1, 0, -1],
                   metavar=("T", "B", "L", "R"),
                   help="crop video region; -1 auto-infers the extent")
    p.add_argument("--box", nargs=4, type=int, default=[-1, -1, -1, -1],
                   metavar=("T", "B", "L", "R"),
                   help="fixed face bbox, bypassing detection")
    p.add_argument("--rotate", action="store_true", default=False)
    p.add_argument("--nosmooth", action="store_true", default=False)
    p.add_argument("--s3fd_checkpoint", default=None,
                   help="S3FD detector weights (Orbax dir or torch .pth)")
    p.add_argument("--temp_dir", default="temp")
    p.add_argument("--detect_downscale", type=int, default=0,
                   help="run S3FD at 1/f resolution and rescale boxes "
                        "(f^2 fewer trunk FLOPs/transfers; boxes feed a "
                        "smoothed 96x96 crop so quality is unaffected). "
                        "0 = auto (long side <= 640), 1 = full resolution")
    p.add_argument("--detect_roi", type=int, default=1, choices=(0, 1),
                   help="ROI-tracked detection: after a keyframe, detect on "
                        "a small crop around the last face box (tiny "
                        "host->device transfers; full-frame keyframe every "
                        "120 frames + automatic full-frame fallback when "
                        "the ROI loses the face). 0 = full-frame detection "
                        "for every frame (reference-exact)")
    p.add_argument("--decode_workers", type=int, default=0,
                   help="decode the input container with N parallel "
                        "frame-banded readers (needs a seekable backend "
                        "and a RAM-backed in-place output). 0 = auto "
                        "(min(4, cores-1); serial on 1-core hosts), "
                        "1 = force the single threaded reader")
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler device trace here")
    p.add_argument("--data_parallel", action="store_true", default=False,
                   help="shard generation batches over ALL visible devices "
                        "(1-D data mesh; wav2lip_batch_size must be a "
                        "multiple of the device count)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.convert import import_generator, import_s3fd
    from wav2lip_tpu.detect import FaceDetectionPipeline
    from wav2lip_tpu.infer import LipSyncPipeline
    from wav2lip_tpu.train.checkpoint import load_model_variables

    cfg = DEFAULT_CONFIG
    cfg = dataclasses.replace(
        cfg,
        infer=dataclasses.replace(
            cfg.infer,
            static=args.static,
            fps=args.fps,
            pads=tuple(args.pads),
            face_det_batch_size=args.face_det_batch_size,
            wav2lip_batch_size=args.wav2lip_batch_size,
            resize_factor=args.resize_factor,
            crop=tuple(args.crop),
            box=tuple(args.box),
            rotate=args.rotate,
            nosmooth=args.nosmooth,
            decode_workers=args.decode_workers,
        ),
        detect=dataclasses.replace(
            cfg.detect, downscale=args.detect_downscale,
            roi_track=bool(args.detect_roi),
        ),
    )

    try:
        gen_vars = load_model_variables(args.checkpoint_path, import_generator)
    except FileNotFoundError as e:
        print(f"error: generator checkpoint not found: {e}", file=sys.stderr)
        return 2

    detector = None
    if args.box[0] == -1:
        # reference parity: fall back to the model-zoo download when no
        # local weights exist (sfd_detector.py:11-24)
        from wav2lip_tpu.convert.fetch import resolve_s3fd_checkpoint

        try:
            s3fd_path = resolve_s3fd_checkpoint(args.s3fd_checkpoint)
        except (FileNotFoundError, RuntimeError) as e:
            print(f"error: {e}\n(face detection needs S3FD weights; or "
                  f"pass a fixed --box)", file=sys.stderr)
            return 2
        det_vars = load_model_variables(s3fd_path, import_s3fd)
        detector = FaceDetectionPipeline(
            det_vars, cfg.detect, batch_size=args.face_det_batch_size
        )
    else:
        print("Using the specified bounding box instead of face detection...")

    from wav2lip_tpu.utils.profiling import device_trace

    from wav2lip_tpu.parallel import maybe_data_parallel_mesh

    mesh = maybe_data_parallel_mesh(args.data_parallel, "generation")
    pipeline = LipSyncPipeline(gen_vars, detector=detector, config=cfg,
                               mesh=mesh)
    with device_trace(args.trace_dir):
        out = pipeline.run(
            args.face, args.audio, args.outfile,
            # --fps applies only to still images; a video keeps its own fps
            # even in --static mode (reference inference.py:186-196)
            fps=args.fps if args.face.lower().endswith(
                (".jpg", ".jpeg", ".png")) else None,
            temp_dir=args.temp_dir,
        )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
