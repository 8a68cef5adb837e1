"""Generator training CLI — plain (reference: wav2lip_train.py) and GAN
(reference: hq_wav2lip_train.py) variants in one entry point.

    python -m wav2lip_tpu.cli.train_wav2lip --data_root preprocessed \
        --checkpoint_dir ckpts --syncnet_checkpoint_path expert_ckpt \
        [--gan] [--checkpoint_path resume] [--disc_checkpoint_path resume] \
        [--max_steps N]

``--syncnet_checkpoint_path`` accepts an Orbax checkpoint or a reference
``.pth``; it is loaded frozen with reset-optimizer semantics
(wav2lip_train.py:365).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Train the Wav2Lip generator")
    p.add_argument("--data_root", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--syncnet_checkpoint_path", required=True,
                   help="pretrained frozen expert")
    p.add_argument("--checkpoint_path", default=None,
                   help="resume generator from")
    p.add_argument("--disc_checkpoint_path", default=None,
                   help="resume discriminator from (GAN mode)")
    p.add_argument("--gan", action="store_true",
                   help="train with the visual-quality discriminator "
                        "(hq_wav2lip_train.py)")
    p.add_argument("--filelists_dir", default="filelists")
    p.add_argument("--max_steps", type=int, default=10_000_000)
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="train-step compute dtype: bfloat16 = mixed precision (f32 master params)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize forwards in the backward pass "
                        "(less activation memory, larger batches)")
    p.add_argument("--dump_samples", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="write ref/input/generated/gt collages at every "
                        "checkpoint (--no-dump_samples disables)")
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler device trace here")
    # multi-host (pod slice) wiring; also settable via W2L_COORDINATOR etc.
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from wav2lip_tpu.parallel import (
        local_batch_size,
        maybe_initialize_distributed,
    )

    # must precede any jax device use (no-op single-host)
    maybe_initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )

    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.convert import import_syncnet
    from wav2lip_tpu.data.dataset import (
        PrefetchLoader,
        WindowSampler,
        get_video_list,
    )
    from wav2lip_tpu.train.checkpoint import load_model_variables
    from wav2lip_tpu.train.trainers import Wav2LipTrainer
    from wav2lip_tpu.utils.profiling import device_trace

    cfg = DEFAULT_CONFIG
    if args.compute_dtype:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, compute_dtype=args.compute_dtype))
    if args.remat:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, remat=True))
    workers = (cfg.train.num_workers if args.num_workers is None
               else args.num_workers)  # 0 is a valid request

    sync_vars = load_model_variables(
        args.syncnet_checkpoint_path, import_syncnet
    )

    import jax

    # per-process slice of the global batch; samplers de-correlate by
    # process index (DCN input sharding)
    local_bs = local_batch_size(cfg.train.batch_size)
    pidx = jax.process_index()

    train_videos = get_video_list(args.data_root, "train", args.filelists_dir)
    train_sampler = WindowSampler(
        train_videos,
        cfg.audio, cfg.model, seed=args.seed + 1000 * pidx,
    )
    val_sampler = WindowSampler(
        get_video_list(args.data_root, "val", args.filelists_dir),
        cfg.audio, cfg.model, seed=args.seed + 1 + 1000 * pidx,
    )
    train_loader = PrefetchLoader(
        train_sampler.sample_wav2lip, local_bs,
        num_workers=workers,
    )
    val_loader = PrefetchLoader(
        val_sampler.sample_wav2lip, local_bs,
        num_workers=max(workers // 4, 1),
    )

    trainer = Wav2LipTrainer(sync_vars, cfg, gan=args.gan, rng_seed=args.seed)
    if args.checkpoint_path:
        trainer.load(args.checkpoint_path)
    if args.gan and args.disc_checkpoint_path:
        trainer.load_disc(args.disc_checkpoint_path)
    # one 'epoch' = one pass over the video list (wav2lip_train.py:203)
    steps_per_epoch = max(1, len(train_videos) // cfg.train.batch_size)
    try:
        with device_trace(args.trace_dir):
            trainer.fit(iter(train_loader), iter(val_loader),
                        args.checkpoint_dir, max_steps=args.max_steps,
                        dump_samples=args.dump_samples,
                        steps_per_epoch=steps_per_epoch)
    finally:
        train_loader.close()
        val_loader.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
