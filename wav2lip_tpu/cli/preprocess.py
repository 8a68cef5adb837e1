"""Dataset preprocessing CLI (reference: preprocess.py).

Turns an LRS2-style tree of ``data_root/*/*.mp4`` into the training layout:
per-video directories of face-crop JPEGs named by frame index (undetected
frames are *skipped*, leaving index gaps exactly like preprocess.py:61-67)
plus a 16 kHz ``audio.wav`` per video (ffmpeg; skipped with a warning when
ffmpeg is unavailable).

TPU-native parallelism: instead of one detector per GPU with a thread pool
(preprocess.py:25-33,96-99), detection runs as one batched device pipeline;
multi-host fan-out is ``--shard i --num_shards n``, giving each host a
disjoint slice of the video list.

    python -m wav2lip_tpu.cli.preprocess --data_root lrs2 \
        --preprocessed_root lrs2_preprocessed \
        --s3fd_checkpoint s3fd.pth [--batch_size 32] [--shard 0 --num_shards 1]
"""

from __future__ import annotations

import argparse
import os
import traceback
from glob import glob
from os.path import basename, join

import cv2
import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--preprocessed_root", required=True)
    p.add_argument("--s3fd_checkpoint", default=None,
                   help="S3FD weights; falls back to checkpoints/ or "
                        "the model-zoo download (sfd_detector.py:11-24)")
    p.add_argument("--batch_size", type=int, default=32,
                   help="face detection batch size")
    p.add_argument("--data_parallel", action="store_true", default=False,
                   help="shard detection batches over ALL visible chips "
                        "(single-host multi-chip; across hosts use "
                        "--shard/--num_shards)")
    p.add_argument("--shard", type=int, default=0,
                   help="this host's shard index")
    p.add_argument("--num_shards", type=int, default=1,
                   help="total preprocessing hosts")
    p.add_argument("--detect_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="S3FD compute dtype. float32 (default) reproduces "
                        "the reference's training-data crops exactly; "
                        "bfloat16 is ~2x faster with ~±1 px box shifts")
    return p


def out_dir_for(vfile: str, preprocessed_root: str) -> str:
    vidname = basename(vfile).split(".")[0]
    dirname = vfile.split("/")[-2]
    return join(preprocessed_root, dirname, vidname)


def process_video(vfile: str, detector, preprocessed_root: str,
                  batch_size: int) -> int:
    """Detect + crop every frame; returns number of crops written."""
    cap = cv2.VideoCapture(vfile)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            cap.release()
            break
        frames.append(frame)
    fulldir = out_dir_for(vfile, preprocessed_root)
    os.makedirs(fulldir, exist_ok=True)

    written = 0
    i = -1
    for lo in range(0, len(frames), batch_size):
        fb = frames[lo : lo + batch_size]
        preds = detector.first_face_boxes(np.asarray(fb))
        for j, f in enumerate(preds):
            i += 1
            if f is None:
                continue  # leave an index gap (preprocess.py:63-64)
            x1, y1, x2, y2 = f
            cv2.imwrite(join(fulldir, f"{i}.jpg"), fb[j][y1:y2, x1:x2])
            written += 1
    return written


def process_audio(vfile: str, preprocessed_root: str) -> bool:
    from wav2lip_tpu.io.video import extract_audio, has_ffmpeg

    if not has_ffmpeg():
        return False
    fulldir = out_dir_for(vfile, preprocessed_root)
    os.makedirs(fulldir, exist_ok=True)
    extract_audio(vfile, join(fulldir, "audio.wav"))
    return True


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.convert import import_s3fd
    from wav2lip_tpu.detect import FaceDetectionPipeline
    from wav2lip_tpu.io.video import has_ffmpeg
    from wav2lip_tpu.train.checkpoint import load_model_variables

    filelist = sorted(glob(join(args.data_root, "*/*.mp4")))
    filelist = filelist[args.shard :: args.num_shards]
    print(f"processing {len(filelist)} videos "
          f"(shard {args.shard}/{args.num_shards})")

    from wav2lip_tpu.convert.fetch import resolve_s3fd_checkpoint

    det_vars = load_model_variables(
        resolve_s3fd_checkpoint(args.s3fd_checkpoint), import_s3fd
    )
    from wav2lip_tpu.parallel import maybe_data_parallel_mesh

    mesh = maybe_data_parallel_mesh(args.data_parallel, "detection")
    import dataclasses

    # dataset reproduction path: float32 by default so the emitted crops
    # match reference preprocessing bit-for-box (DetectConfig defaults to
    # bfloat16, which shifts boxes ~±1 px — fine for inference, not for
    # regenerating training data)
    det_cfg = dataclasses.replace(
        DEFAULT_CONFIG.detect, compute_dtype=args.detect_dtype, downscale=1,
        roi_track=False
    )
    detector = FaceDetectionPipeline(
        det_vars, det_cfg, batch_size=args.batch_size,
        mesh=mesh,
    )

    for vfile in filelist:
        try:
            n = process_video(vfile, detector, args.preprocessed_root,
                              args.batch_size)
            print(f"{vfile}: {n} crops")
        except KeyboardInterrupt:
            return 1
        except Exception:
            traceback.print_exc()

    if not has_ffmpeg():
        print("warning: ffmpeg not found — audio.wav extraction skipped; "
              "provide per-video audio.wav files before training")
        return 0
    print("Dumping audios...")
    for vfile in filelist:
        try:
            process_audio(vfile, args.preprocessed_root)
        except KeyboardInterrupt:
            return 1
        except Exception:
            traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
