"""SyncNet expert pretraining CLI (reference: color_syncnet_train.py).

    python -m wav2lip_tpu.cli.train_syncnet --data_root preprocessed \
        --checkpoint_dir ckpts [--checkpoint_path resume] \
        [--filelists_dir filelists] [--max_steps N]
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(
        description="Train the SyncNet expert lip-sync discriminator"
    )
    p.add_argument("--data_root", required=True,
                   help="root of the preprocessed dataset")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_path", default=None, help="resume from")
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
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler device trace here")
    # multi-host (pod slice) wiring; also settable via W2L_COORDINATOR etc.
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from wav2lip_tpu.config import DEFAULT_CONFIG
    from wav2lip_tpu.data.dataset import (
        PrefetchLoader,
        WindowSampler,
        get_video_list,
    )
    from wav2lip_tpu.parallel import (
        local_batch_size,
        maybe_initialize_distributed,
    )
    from wav2lip_tpu.train.trainers import SyncNetTrainer
    from wav2lip_tpu.utils.profiling import device_trace

    # must precede any jax device use (no-op single-host)
    maybe_initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    import jax

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
    local_bs = local_batch_size(cfg.train.syncnet_batch_size)
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
        train_sampler.sample_syncnet, local_bs,
        num_workers=workers,
    )
    val_loader = PrefetchLoader(
        val_sampler.sample_syncnet, local_bs,
        num_workers=max(workers // 4, 1),
    )

    trainer = SyncNetTrainer(cfg, rng_seed=args.seed)
    if args.checkpoint_path:
        trainer.load(args.checkpoint_path)
    # one 'epoch' = one pass over the video list (wav2lip_train.py:203)
    steps_per_epoch = max(
        1, len(train_videos) // cfg.train.syncnet_batch_size
    )
    try:
        with device_trace(args.trace_dir):
            trainer.fit(iter(train_loader), iter(val_loader),
                        args.checkpoint_dir, max_steps=args.max_steps,
                        steps_per_epoch=steps_per_epoch)
    finally:
        train_loader.close()
        val_loader.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
