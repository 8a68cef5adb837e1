"""In-sandbox product-loop proof (round-4 verdict Weak #3): the full
train-to-LSE chain on a synthetic-but-learnable talking-head task.

The chain mirrors the reference's product loop end to end:

1. *preprocess*: raw talking-head mp4s (mouth openness tracks a syllabic
   audio envelope — fixtures.make_talking_video) run through the
   preprocess pipeline's ``process_video`` (cli/preprocess.py, reference
   preprocess.py:38-67) with the bright-pixel stub detector, producing the
   training layout of face-crop JPEGs; the paired wavs stand in for the
   ffmpeg audio extraction this sandbox cannot run (the reference has the
   same hard ffmpeg dependency, preprocess.py:76-79).
2. *expert training*: SyncNet trains on those crops until its eval
   cosine-BCE is WELL below ln 2 ≈ 0.693 (chance) — the reference's
   convergence anchor is ~0.25 (README.md:99).
3. *generator training*: Wav2LipTrainer with the frozen trained expert,
   syncnet_wt starting at 0.0, until the eval-driven curriculum trigger
   fires FOR REAL (eval sync < 0.75 → syncnet_wt 0.01,
   wav2lip_train.py:249-254) — not a stubbed eval.
4. *inference + LSE*: the trained checkpoint lip-syncs a HELD-OUT clip to
   a MISMATCHED audio track; the trained expert scores LSE-D/LSE-C
   (evaluation/scores_LSE semantics). The dub must score better than both
   (a) the same pipeline with a random-init generator and (b) the
   un-dubbed original video against that audio.

Chip-recorded numbers for the same chain live in docs/DESIGN.md
("Product-loop proof" section). This CPU variant is adaptive
(train-until-threshold with hard caps) and bounded: measured ~50 min on
the 1-core CI host with a warm .test_cache (first run adds the one-off
train-step compiles).
"""

import dataclasses
import glob
import os
import shutil
import sys
import time
from os.path import join

import numpy as np
import pytest

from fixtures import (
    make_talking_dataset,
    make_talking_video,
    pixel_stub_detector,
)
from wav2lip_tpu.config import DEFAULT_CONFIG

pytestmark = pytest.mark.slow

# Step budgets are ADAPTIVE train-until-threshold with hard caps: the legs
# stop as soon as they certify (typically well under the caps), so the test
# stays bounded without baking in one host's step rate. Reference anchors
# from the chip-recorded run of the same chain (docs/DESIGN.md): expert
# eval 0.283 by 800 steps @ b32, generator trigger at its FIRST eval (50
# steps @ b16), final gen eval sync 0.167.
#
# Both trainers run on a SINGLE-device mesh: that matches the chip-recorded
# chain (full-batch BatchNorm); the conftest's default 8-virtual-device
# mesh would normalize every shard by its own 2-4-sample BN statistics —
# measured to stall the expert on the cos≈0.5 plateau (eval ~0.74 after
# 800 steps) where full-batch BN at the same sample budget reaches <0.5 —
# and pays the 1-core collective-rendezvous tax on every step. Mesh
# semantics have their own coverage (tests/test_train.py, test_distributed).
SYNC_BATCH = 32            # chip-calibrated; b16 halves BN's averaging too
SYNC_LR = 1e-3
SYNC_ROUND = 100           # expert steps between eval checks
SYNC_CAP = 600             # hard step cap for the expert leg
SYNC_TARGET = 0.5          # "well below ln 2": chance is 0.693
GEN_LR = 3e-4
GEN_ROUND = 50             # generator steps between trigger checks
GEN_CAP = 300              # hard step cap for the generator leg
GEN_POST = 50              # post-trigger steps under the blended objective


def _expert_config(lr):
    return dataclasses.replace(
        DEFAULT_CONFIG,
        train=dataclasses.replace(
            DEFAULT_CONFIG.train,
            syncnet_lr=lr,
            syncnet_eval_interval=10**9,  # driven explicitly below
            syncnet_checkpoint_interval=10**9,
        ),
    )


def _gen_config(lr, eval_interval):
    return dataclasses.replace(
        DEFAULT_CONFIG,
        train=dataclasses.replace(
            DEFAULT_CONFIG.train,
            initial_learning_rate=lr,
            eval_interval=eval_interval,
            checkpoint_interval=10**9,
        ),
    )


class TestProductLoop:
    def test_train_to_lse_chain(self, tmp_path):
        from wav2lip_tpu.cli.preprocess import out_dir_for, process_video
        from wav2lip_tpu.data.dataset import PrefetchLoader, WindowSampler
        from wav2lip_tpu.detect import FaceDetectionPipeline
        from wav2lip_tpu.eval.lse import LSEScorer
        from wav2lip_tpu.infer import LipSyncPipeline
        from wav2lip_tpu.train.trainers import SyncNetTrainer, Wav2LipTrainer

        t_start = time.time()
        rpt = {}

        # ---- stage 1: preprocess raw clips into the training layout ------
        raw_root = tmp_path / "raw" / "spk0"
        os.makedirs(raw_root)
        wavs = {}
        for v in range(2):
            wavs[v] = make_talking_video(
                str(raw_root / f"vid{v}.mp4"), num_frames=120, fps=25.0,
                w=128, h=128, seed=100 + v, face_scale=0.6)
        det = FaceDetectionPipeline(
            {"params": {"w": np.zeros((1,), np.float32)}}, batch_size=8)
        det._jit_detect = pixel_stub_detector
        pre_root = str(tmp_path / "pre")
        for v in range(2):
            vfile = str(raw_root / f"vid{v}.mp4")
            written = process_video(vfile, det, pre_root, batch_size=8)
            assert written == 120  # the synthetic face is always detectable
            # ffmpeg is absent here, so the preprocess CLI skips audio.wav
            # with a warning (cli/preprocess.py) — the paired source wav IS
            # that audio; place it like the reference's extraction would
            shutil.copy(wavs[v], join(out_dir_for(vfile, pre_root),
                                      "audio.wav"))
        pre_dirs = sorted(glob.glob(join(pre_root, "spk0", "vid*")))
        assert len(pre_dirs) == 2
        # crops exist, named by frame index, with the mouth region inside
        assert len(glob.glob(join(pre_dirs[0], "*.jpg"))) == 120

        # ---- stage 1b: widen the corpus with pre-cropped talking dirs ----
        # (same generator as the preprocessed clips; keeps the preprocess
        # stage honest while giving the trainers enough variety cheaply)
        extra = make_talking_dataset(str(tmp_path / "data"), num_videos=8,
                                     frames_per_video=120, seed=0)
        train_dirs = pre_dirs + extra[:6]
        val_dirs = extra[6:]

        import jax

        from wav2lip_tpu.parallel import make_mesh

        mesh1 = make_mesh(jax.devices()[:1])  # full-batch BN, see header
        cfg = _expert_config(lr=SYNC_LR)
        ts = WindowSampler(train_dirs, cfg.audio, cfg.model, seed=0)
        vs = WindowSampler(val_dirs, cfg.audio, cfg.model, seed=1)

        # ---- stage 2: the expert learns to discriminate sync -------------
        tl = PrefetchLoader(ts.sample_syncnet, batch_size=SYNC_BATCH,
                            num_workers=2)
        vl = PrefetchLoader(vs.sample_syncnet, batch_size=SYNC_BATCH,
                            num_workers=2)
        expert = SyncNetTrainer(config=cfg, rng_seed=0, mesh=mesh1,
                                log_fn=lambda *a, **k: None)
        sync_dir = str(tmp_path / "sync_ckpt")
        ev = {"loss": float("inf")}
        while expert.global_step < SYNC_CAP and ev["loss"] >= SYNC_TARGET:
            expert.fit(iter(tl), None, sync_dir,
                       max_steps=expert.global_step + SYNC_ROUND)
            ev = expert.evaluate(iter(vl), num_batches=6)
        tl.close(); vl.close()
        rpt["expert_eval"] = (ev["loss"], expert.global_step)
        # chance is ln 2 ≈ 0.693; the reference's convergence anchor ~0.25
        assert ev["loss"] < SYNC_TARGET, (ev, expert.global_step)

        sync_vars = {"params": expert.state.params,
                     "batch_stats": expert.state.batch_stats}

        # ---- stage 3: generator trains until the trigger fires -----------
        gcfg = _gen_config(lr=GEN_LR, eval_interval=GEN_ROUND)
        tl = PrefetchLoader(ts.sample_wav2lip, batch_size=8, num_workers=2)
        vl = PrefetchLoader(vs.sample_wav2lip, batch_size=8, num_workers=2)
        gen = Wav2LipTrainer(sync_vars, config=gcfg, rng_seed=0,
                             mesh=mesh1, log_fn=lambda *a, **k: None)
        assert gen.syncnet_wt == 0.0  # reference hparams.py:87
        last = {}
        while gen.global_step < GEN_CAP and gen.syncnet_wt == 0.0:
            # fit() itself runs the eval cadence and the trigger check —
            # the loop only stops early once the trigger has fired
            last = gen.fit(iter(tl), iter(vl), str(tmp_path / "gen_ckpt"),
                           max_steps=gen.global_step + GEN_ROUND,
                           eval_batches=4)
        # the REAL eval-driven curriculum trigger fired
        # (wav2lip_train.py:249-254: eval sync < 0.75 → syncnet_wt 0.01)
        assert last["sync"] < 0.75, (last, gen.global_step)
        assert gen.syncnet_wt == 0.01
        trigger_step = gen.global_step
        # one more round under the POST-trigger blended objective
        # (0.01·sync + 0.99·l1, wav2lip_train.py:229) — the reference's
        # steady state after the curriculum flips, and the extra steps buy
        # the dub a clear LSE margin below
        last = gen.fit(iter(tl), iter(vl), str(tmp_path / "gen_ckpt"),
                       max_steps=gen.global_step + GEN_POST,
                       eval_batches=4)
        tl.close(); vl.close()
        rpt["gen_eval"] = (dict(last), trigger_step, gen.global_step)

        trained_vars = {"params": gen.state.params,
                        "batch_stats": gen.state.batch_stats}

        # ---- stage 4: infer a held-out clip with MISMATCHED audio --------
        # face fills the frame so whole-frame LSE windows match the
        # expert's training distribution (eval/lse.py input-framing caveat)
        infer_clip = str(tmp_path / "eval_vid.mp4")
        make_talking_video(infer_clip, num_frames=80, fps=25.0, w=128,
                           h=128, seed=500, face_scale=0.94)
        dub_wav = str(tmp_path / "dub.wav")
        shutil.copy(
            make_talking_video(str(tmp_path / "dub_src.mp4"), num_frames=80,
                               fps=25.0, w=128, h=128, seed=777,
                               face_scale=0.94),
            dub_wav)
        size = int(128 * 0.94)
        y0 = x0 = (128 - size) // 2
        icfg = dataclasses.replace(
            DEFAULT_CONFIG,
            infer=dataclasses.replace(DEFAULT_CONFIG.infer,
                                      box=(y0, y0 + size, x0, x0 + size),
                                      wav2lip_batch_size=16))

        outs = {}
        for tag, variables in (("trained", trained_vars), ("random", None)):
            if variables is None:
                from wav2lip_tpu.models import Wav2LipGenerator

                variables = jax.jit(Wav2LipGenerator().init)(
                    jax.random.key(3),
                    np.zeros((1, 80, 16, 1), np.float32),
                    np.zeros((1, 96, 96, 6), np.float32),
                )
            pipe = LipSyncPipeline(variables, config=icfg)
            out = str(tmp_path / f"dub_{tag}.avi")
            pipe.run(infer_clip, dub_wav, out,
                     temp_dir=str(tmp_path / f"t_{tag}"))
            outs[tag] = out

        # ---- stage 5: LSE with the trained expert ------------------------
        scorer = LSEScorer(sync_vars, batch_size=16)
        scores = {tag: scorer.score_video(path, dub_wav)
                  for tag, path in outs.items()}
        scores["original"] = scorer.score_video(infer_clip, dub_wav)
        rpt["lse"] = {k: (round(v.lse_d, 4), round(v.lse_c, 4))
                      for k, v in scores.items()}
        rpt["wall_s"] = round(time.time() - t_start, 1)
        print(f"\n[product-loop] {rpt}", file=sys.stderr)

        # the trained dub must out-sync the random-init dub decisively and
        # beat the un-dubbed original against the same (mismatched) audio
        assert scores["trained"].lse_d < scores["random"].lse_d - 0.05
        assert scores["trained"].lse_d < scores["original"].lse_d
        assert scores["trained"].lse_c > scores["random"].lse_c

