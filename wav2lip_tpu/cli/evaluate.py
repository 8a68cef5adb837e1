"""Evaluation harness CLI (reference: evaluation/).

Two subcommands:

``generate`` — batch lip-sync generation over a benchmark filelist of
"audio_source video" pairs (reference gen_videos_from_filelist.py), with that
harness's deltas from plain inference: pads default to (0, 0, 0, 0)
(gen_videos_from_filelist.py:24), detector/model loaded once and reused
(:126,150), videos skipped — not fatal — when frames are fewer than mel
chunks (:195-196) or a face is missing (:200-203), and the final partial mel
chunk *dropped* instead of right-aligned (:178-183).

``score`` — LSE-D/LSE-C scoring of generated videos with this framework's
self-contained SyncNet scorer (see wav2lip_tpu/eval/lse.py; the reference
instead copies scripts into an external syncnet_python clone,
evaluation/README.md:10-29). Appends per-video lines to ``all_scores.txt``
like calculate_scores_real_videos.sh:7 and prints corpus averages like
calculate_scores_LRS.py:43-50.

    python -m wav2lip_tpu.cli.evaluate generate --filelist pairs.txt \
        --data_root d --results_dir out --checkpoint_path g \
        [--s3fd_checkpoint s]
    python -m wav2lip_tpu.cli.evaluate score --videos_dir out \
        --syncnet_checkpoint expert [--audio_root d]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback
from glob import glob
from os.path import basename, join


def build_parser():
    p = argparse.ArgumentParser(description="Wav2Lip evaluation harness")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="render videos for a pair filelist")
    g.add_argument("--filelist", required=True,
                   help='lines of "audio_id video_id" (test_filelists format)')
    g.add_argument("--data_root", required=True)
    g.add_argument("--results_dir", required=True)
    g.add_argument("--checkpoint_path", required=True)
    g.add_argument("--s3fd_checkpoint", default=None)
    g.add_argument("--box", nargs=4, type=int, default=[-1, -1, -1, -1])
    g.add_argument("--pads", nargs=4, type=int, default=[0, 0, 0, 0])
    g.add_argument("--wav2lip_batch_size", type=int, default=128)
    g.add_argument("--face_det_batch_size", type=int, default=16)
    g.add_argument("--ext", default=".mp4", help="media extension under data_root")
    g.add_argument("--data_parallel", action="store_true", default=False,
                   help="shard generation/detection batches over ALL "
                        "visible chips")

    r = sub.add_parser("real", help="ReSyncED real-video inference "
                                    "(real_videos_inference.py modes)")
    r.add_argument("--mode", choices=["dubbed", "random", "tts"],
                   required=True)
    r.add_argument("--filelist", required=True,
                   help='lines of "video_file audio_file" (ReSyncED pairs)')
    r.add_argument("--data_root", required=True)
    r.add_argument("--results_dir", required=True)
    r.add_argument("--checkpoint_path", required=True)
    r.add_argument("--s3fd_checkpoint", default=None)
    r.add_argument("--face_res", type=int, default=180)
    r.add_argument("--wav2lip_batch_size", type=int, default=128)
    r.add_argument("--face_det_batch_size", type=int, default=16)

    f = sub.add_parser("fid", help="FID between generated and real videos "
                                   "(reference evaluation/README.md:52-53 "
                                   "uses external pytorch-fid)")
    f.add_argument("--generated_dir", required=True)
    f.add_argument("--real_dir", required=True)
    f.add_argument("--inception_checkpoint", required=True,
                   help="pytorch-fid pt_inception-2015-12-05 .pth")
    f.add_argument("--max_frames_per_video", type=int, default=None)
    f.add_argument("--batch_size", type=int, default=32)

    s = sub.add_parser("score", help="LSE-D/LSE-C over generated videos")
    s.add_argument("--videos_dir", required=True)
    s.add_argument("--protocol", choices=["native", "syncnet_python"],
                   default="native",
                   help="native = this framework's SyncNet (self-contained, "
                        "ranking-consistent); syncnet_python = the external "
                        "pretrained SyncNet protocol the published numbers "
                        "use (needs --syncnet_python_model)")
    s.add_argument("--syncnet_checkpoint", default=None,
                   help="expert SyncNet checkpoint (native protocol)")
    s.add_argument("--syncnet_python_model", default=None,
                   help="syncnet_python .model checkpoint (syncnet_python "
                        "protocol, e.g. syncnet_v2.model)")
    s.add_argument("--audio_root", default=None,
                   help="directory of wavs named like the videos (required "
                        "without ffmpeg)")
    s.add_argument("--out_file", default="all_scores.txt")
    s.add_argument("--vshift", type=int, default=15)
    s.add_argument("--track", action="store_true", default=False,
                   help="run the protocol's face-track/crop front end "
                        "(syncnet_python run_pipeline equivalent) before "
                        "scoring — required for full-scene videos where "
                        "the face is a small region (ReSyncED). Needs S3FD "
                        "weights (--s3fd_checkpoint or checkpoints/)")
    s.add_argument("--s3fd_checkpoint", default=None,
                   help="S3FD weights for --track")
    return p


def cmd_generate(args) -> int:
    import dataclasses

    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.convert import import_generator, import_s3fd
    from wav2lip_tpu.detect import FaceDetectionPipeline
    from wav2lip_tpu.infer import LipSyncPipeline
    from wav2lip_tpu.train.checkpoint import load_model_variables

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        infer=dataclasses.replace(
            DEFAULT_CONFIG.infer,
            pads=tuple(args.pads),
            box=tuple(args.box),
            wav2lip_batch_size=args.wav2lip_batch_size,
            # eval-harness videos are scored for LSE/FID: keep the full
            # float32 path so numbers are bit-comparable to the reference's
            # (bfloat16 stays the product-inference default)
            compute_dtype="float32",
        ),
        # detection too: bf16 S3FD shifts borderline boxes by ~a pixel,
        # which changes every crop the scored output is built from; full-res
        # detection (downscale=1) for the same reason
        detect=dataclasses.replace(
            DEFAULT_CONFIG.detect, compute_dtype="float32", downscale=1,
            roi_track=False
        ),
    )
    gen_vars = load_model_variables(args.checkpoint_path, import_generator)
    from wav2lip_tpu.parallel import maybe_data_parallel_mesh

    mesh = maybe_data_parallel_mesh(
        getattr(args, "data_parallel", False), "generation"
    )
    detector = None
    if args.box[0] == -1:
        from wav2lip_tpu.convert.fetch import resolve_s3fd_checkpoint

        try:
            s3fd_path = resolve_s3fd_checkpoint(args.s3fd_checkpoint)
        except (FileNotFoundError, RuntimeError) as e:
            print(f"error: {e} (or pass --box)", file=sys.stderr)
            return 2
        detector = FaceDetectionPipeline(
            load_model_variables(s3fd_path, import_s3fd),
            cfg.detect, batch_size=args.face_det_batch_size, mesh=mesh,
        )
    pipeline = LipSyncPipeline(gen_vars, detector=detector, config=cfg,
                               mesh=mesh)

    os.makedirs(args.results_dir, exist_ok=True)
    with open(args.filelist) as f:
        raw = [ln.split() for ln in f if ln.strip()]
    pairs = [p for p in raw if len(p) == 2]
    if len(pairs) != len(raw):
        print(f"warning: skipped {len(raw) - len(pairs)} malformed filelist "
              f"line(s) (expected 'audio_id video_id')")
    ok = skipped = 0
    for idx, (audio_id, video_id) in enumerate(pairs):
        out = join(args.results_dir, f"{idx}.mp4")
        # audio normally comes out of the source video via ffmpeg
        # (gen_videos_from_filelist.py:167); a precomputed sibling .wav is
        # preferred when present (and required without ffmpeg)
        apath = join(args.data_root, audio_id + args.ext)
        wav_alt = join(args.data_root, audio_id + ".wav")
        if os.path.exists(wav_alt):
            apath = wav_alt
        try:
            # eval-harness chunking deltas: drop the tail chunk + skip short
            # videos (gen_videos_from_filelist.py:178-183,195-196)
            pipeline.run(
                join(args.data_root, video_id + args.ext),
                apath,
                out, temp_dir=join(args.results_dir, "temp"),
                tail="drop", skip_if_short=True,
            )
            ok += 1
        except KeyboardInterrupt:
            return 1
        except Exception:
            # per-video resilience (gen_videos_from_filelist.py:200-203)
            traceback.print_exc()
            skipped += 1
    print(f"generated {ok} videos, skipped {skipped}")
    return 0


def cmd_score(args) -> int:
    if args.protocol == "syncnet_python":
        from wav2lip_tpu.eval.syncnet_protocol import SyncNetPythonScorer

        if not args.syncnet_python_model:
            print("error: --protocol syncnet_python needs "
                  "--syncnet_python_model", file=sys.stderr)
            return 2
        scorer = SyncNetPythonScorer.from_checkpoint(
            args.syncnet_python_model, vshift=args.vshift
        )
    else:
        from wav2lip_tpu.convert import import_syncnet
        from wav2lip_tpu.eval import LSEScorer
        from wav2lip_tpu.train.checkpoint import load_model_variables

        if not args.syncnet_checkpoint:
            print("error: --protocol native needs --syncnet_checkpoint",
                  file=sys.stderr)
            return 2
        sync_vars = load_model_variables(args.syncnet_checkpoint,
                                         import_syncnet)
        scorer = LSEScorer(sync_vars, vshift=args.vshift)

    detector = None
    if args.track:
        import dataclasses

        from wav2lip_tpu.config import DEFAULT_CONFIG
        from wav2lip_tpu.convert import import_s3fd
        from wav2lip_tpu.convert.fetch import resolve_s3fd_checkpoint
        from wav2lip_tpu.detect import FaceDetectionPipeline
        from wav2lip_tpu.train.checkpoint import load_model_variables

        try:
            s3fd_path = resolve_s3fd_checkpoint(args.s3fd_checkpoint)
        except (FileNotFoundError, RuntimeError) as e:
            print(f"error: --track needs S3FD weights: {e}", file=sys.stderr)
            return 2
        detector = FaceDetectionPipeline(
            load_model_variables(s3fd_path, import_s3fd),
            # full-res f32: the tracker applies the protocol's own 0.25
            # detection scale; scored outputs stay reference-faithful
            dataclasses.replace(DEFAULT_CONFIG.detect,
                                compute_dtype="float32", downscale=1,
            roi_track=False),
        )

    videos = sorted(
        glob(join(args.videos_dir, "*.mp4")) + glob(join(args.videos_dir, "*.avi"))
    )
    if not videos:
        print(f"no videos in {args.videos_dir}", file=sys.stderr)
        return 2
    results = []
    with open(args.out_file, "a") as f:
        for v in videos:
            wav = None
            if args.audio_root:
                wav = join(args.audio_root,
                           basename(v).rsplit(".", 1)[0] + ".wav")
            try:
                if detector is not None:
                    r = scorer.score_video_tracked(v, detector, wav)
                else:
                    r = scorer.score_video(v, wav)
            except Exception:
                traceback.print_exc()
                continue
            results.append(r)
            f.write(f"{r.lse_d:.4f} {r.lse_c:.4f} {basename(v)}\n")
            print(f"{basename(v)}: LSE-D {r.lse_d:.4f}  LSE-C {r.lse_c:.4f}  "
                  f"offset {r.av_offset}")
    if results:
        import numpy as np

        print(f"Average LSE-D {np.mean([r.lse_d for r in results]):.4f}  "
              f"LSE-C {np.mean([r.lse_c for r in results]):.4f} "
              f"over {len(results)} videos")
    return 0


def cmd_real(args) -> int:
    """Real-video modes: dubbed = straight lip-sync; random/tts first rescale
    so the face is ≈``--face_res`` px (real_videos_inference.py:51-70); tts
    additionally stretches the video to the audio length by duplicating
    frames (:149-167). Preprocessing happens into temp clips, then the
    standard pipeline runs."""
    import dataclasses

    import cv2

    from wav2lip_tpu.audio import load_wav
    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.convert import import_generator, import_s3fd
    from wav2lip_tpu.detect import FaceDetectionPipeline
    from wav2lip_tpu.eval.real_videos import (
        increase_frames,
        rescale_frames,
        target_scale_for_face,
    )
    from wav2lip_tpu.infer import LipSyncPipeline
    from wav2lip_tpu.io.video import VideoFrameWriter, read_video_frames
    from wav2lip_tpu.train.checkpoint import load_model_variables

    import numpy as np

    from wav2lip_tpu.convert.fetch import resolve_s3fd_checkpoint

    try:
        s3fd_path = resolve_s3fd_checkpoint(args.s3fd_checkpoint)
    except (FileNotFoundError, RuntimeError) as e:
        print(f"error: real-video modes need S3FD weights: {e}",
              file=sys.stderr)
        return 2
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        infer=dataclasses.replace(
            DEFAULT_CONFIG.infer,
            pads=(0, 0, 0, 0),
            wav2lip_batch_size=args.wav2lip_batch_size,
            compute_dtype="float32",  # scored output: match reference path
        ),
        detect=dataclasses.replace(
            DEFAULT_CONFIG.detect, compute_dtype="float32", downscale=1,
            roi_track=False
        ),
    )
    gen_vars = load_model_variables(args.checkpoint_path, import_generator)
    detector = FaceDetectionPipeline(
        load_model_variables(s3fd_path, import_s3fd),
        cfg.detect, batch_size=args.face_det_batch_size,
    )
    pipeline = LipSyncPipeline(gen_vars, detector=detector, config=cfg)

    os.makedirs(args.results_dir, exist_ok=True)
    temp = join(args.results_dir, "temp")
    os.makedirs(temp, exist_ok=True)
    with open(args.filelist) as f:
        raw = [ln.split() for ln in f if ln.strip()]
    pairs = [p for p in raw if len(p) == 2]
    if len(pairs) != len(raw):
        print(f"warning: skipped {len(raw) - len(pairs)} malformed filelist "
              f"line(s) (expected 'video_id audio_id' — ReSyncED pairs are "
              f"video-first)")
    for idx, (video_id, audio_id) in enumerate(pairs):
        try:
            vpath = join(args.data_root, video_id)
            apath = join(args.data_root, audio_id)
            frames, fps = read_video_frames(vpath)
            orig_frames = frames
            if args.mode in ("random", "tts"):
                boxes = detector.first_face_boxes(np.asarray(frames[:1]))
                if boxes[0] is not None:
                    scale = target_scale_for_face(
                        boxes[0], frames[0].shape[:2], args.face_res
                    )
                    frames = rescale_frames(frames, scale)
            if args.mode == "tts":
                wav = load_wav(apath, cfg.audio.sample_rate)
                needed = int(len(wav) / cfg.audio.sample_rate * fps) + 1
                frames = increase_frames(frames, needed)
            if frames is orig_frames or len(frames) == len(orig_frames) and \
                    frames[0] is orig_frames[0]:
                # untouched (dubbed mode, or no face/rescale needed): feed
                # the source file directly — the DIVX re-encode would add a
                # lossy generation to frames that get LSE-scored
                src = vpath
            else:
                src = join(temp, f"prepped_{idx}.avi")
                with VideoFrameWriter(src, fps, frames[0].shape[:2],
                                      fourcc="DIVX") as w:
                    for fr in frames:
                        w.write(fr)
            pipeline.run(src, apath, join(args.results_dir, f"{idx}.mp4"),
                         temp_dir=temp)
        except KeyboardInterrupt:
            return 1
        except Exception:
            traceback.print_exc()
    return 0


def cmd_fid(args) -> int:
    from wav2lip_tpu.convert.torch_import import load_torch_state_dict
    from wav2lip_tpu.eval.fid import FIDScorer, import_inception

    def videos_in(d):
        vids = sorted(glob(join(d, "*.mp4")) + glob(join(d, "*.avi")))
        if not vids:
            print(f"no videos in {d}", file=sys.stderr)
        return vids

    gen_videos = videos_in(args.generated_dir)
    real_videos = videos_in(args.real_dir)
    if not gen_videos or not real_videos:
        return 2
    variables = import_inception(
        load_torch_state_dict(args.inception_checkpoint)
    )
    scorer = FIDScorer(variables, batch_size=args.batch_size)
    fid = scorer.score_video_sets(gen_videos, real_videos,
                                  args.max_frames_per_video)
    print(f"FID: {fid:.4f} ({len(gen_videos)} generated vs "
          f"{len(real_videos)} real videos)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "generate":
        return cmd_generate(args)
    if args.cmd == "real":
        return cmd_real(args)
    if args.cmd == "fid":
        return cmd_fid(args)
    return cmd_score(args)


if __name__ == "__main__":
    raise SystemExit(main())
