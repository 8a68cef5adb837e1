"""Host-side training loops for the three pipelines.

One generic loop drives the jitted steps from :mod:`wav2lip_tpu.train.steps`,
reproducing each reference trainer's cadence: checkpoint/eval intervals
(hparams.py:83-91), fixed-size eval passes (1400 / 700 / 300 batches), the
sync-loss curriculum trigger (eval sync < 0.75 → syncnet_wt 0.01 or 0.03,
wav2lip_train.py:249-254, hq_wav2lip_train.py:285-290), sample-image collages
at checkpoints (wav2lip_train.py:166-177), and dual gen/``disc_``-prefixed
checkpoints for the GAN run (hq_wav2lip_train.py:279-282).

Unlike the reference's three copy-pasted scripts, the deltas live in three
small trainer classes over one base; all device work stays inside the jitted
steps and batches are placed with batch-axis sharding over the mesh.
"""

from __future__ import annotations

import os
import time
from os.path import join
from typing import Callable, Dict, Iterator, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from wav2lip_tpu.config import Config, DEFAULT_CONFIG
from wav2lip_tpu.utils.cache import enable_compile_cache
from wav2lip_tpu.utils.logging import MetricsLogger
from wav2lip_tpu.models import Wav2LipGenerator, SyncNet, QualityDiscriminator
from wav2lip_tpu.parallel import (
    global_batch_from_local,
    make_mesh,
)
from wav2lip_tpu.train import checkpoint as ckpt_lib
from wav2lip_tpu.train.state import TrainState
from wav2lip_tpu.train.steps import (
    make_gan_steps,
    make_syncnet_steps,
    make_wav2lip_steps,
)


def _local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array.

    ``batch["x"]``/``batch["gt"]`` in the sample dump are the process-LOCAL
    host batch, but the generated ``g`` comes back as a global array sharded
    over every process's devices — ``np.asarray`` on it raises on multi-host
    (process 0 cannot address the other hosts' shards). The addressable
    shards are exactly the outputs for this process's local inputs;
    fetch_mesh_batch copies them concurrently and reassembles in order."""
    from wav2lip_tpu.utils.transfer import fetch_mesh_batch

    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        return fetch_mesh_batch(arr)
    return np.asarray(arr)


def save_sample_images(x, g, gt, step: int, checkpoint_dir: str):
    """Dump ref/input/generated/gt collages (reference
    wav2lip_train.py:166-177). Inputs are NHWC float [0,1] batches:
    x (B,T,96,96,6), g/gt (B,T,96,96,3)."""
    def to_u8(a):
        a = np.asarray(a)
        if a.dtype == np.uint8:  # pixels already ship as uint8 from the loader
            return a
        return np.clip(a * 255.0, 0, 255).astype(np.uint8)
    x, g, gt = to_u8(x), to_u8(g), to_u8(gt)
    refs, inps = x[..., 3:], x[..., :3]
    folder = join(checkpoint_dir, f"samples_step{step:09d}")
    os.makedirs(folder, exist_ok=True)
    collage = np.concatenate((refs, inps, g, gt), axis=-2)  # widthwise
    for bi, c in enumerate(collage):
        for t in range(len(c)):
            cv2.imwrite(f"{folder}/{bi}_{t}.jpg", c[t])


class _BaseTrainer:
    def __init__(self, config: Config = DEFAULT_CONFIG, mesh=None,
                 log_fn: Callable[[str], None] = print,
                 metrics_logger: Optional[MetricsLogger] = None,
                 log_every: int = 100):
        enable_compile_cache()
        self.cfg = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.log = log_fn
        self.metrics_logger = metrics_logger
        self.log_every = log_every
        self.global_step = 0
        self.global_epoch = 0

    @staticmethod
    def _compute_dtype(tcfg):
        """None for the float32 reference-parity default; a jnp dtype for
        the opt-in mixed-precision mode (train.compute_dtype)."""
        dt = getattr(tcfg, "compute_dtype", "float32")
        return None if dt in (None, "float32") else jnp.dtype(dt)

    def _shard(self, batch):
        """Single host: fused multi-stream upload with batch-axis sharding
        (utils/transfer.put_batch — bandwidth-bound, one latency window for
        the whole batch). Multi-host: each process contributes its local
        slice of the global batch (DCN input sharding, SURVEY.md §2
        parallelism table)."""
        if jax.process_count() > 1:
            return global_batch_from_local(self.mesh, batch)
        from wav2lip_tpu.utils.transfer import put_batch

        return put_batch(batch, self.mesh)

    def _feed(self, host_iter, transform=None):
        """Double-buffered device feeder for the fit loops: a background
        thread ships batch k+1 over the sharded transfer streams while step
        k runs, so the host→device upload leaves the critical path (the
        reference keeps 16 DataLoader workers busy for the same reason but
        still pays a blocking ``.to(device)`` per step,
        hq_wav2lip_train.py:404-410 / wav2lip_train.py:215-218)."""
        from wav2lip_tpu.utils.transfer import DevicePrefetcher

        put = (self._shard if transform is None
               else lambda b: self._shard(transform(b)))
        return DevicePrefetcher(host_iter, put=put)

    @property
    def _is_primary(self) -> bool:
        """Multi-host: only process 0 writes checkpoints, metrics, and
        sample dumps — N processes appending to one path on a shared
        filesystem corrupt both (params are replicated, so process 0 has
        everything)."""
        return jax.process_index() == 0

    def _open_metrics(self, checkpoint_dir: str) -> MetricsLogger:
        """Train/eval metrics go to ``{checkpoint_dir}/train_log.jsonl``
        unless a logger was injected (the reference only has tqdm postfix
        strings — SURVEY.md §5 metrics/logging). Non-primary processes get a
        disabled logger."""
        if self.metrics_logger is None:
            self.metrics_logger = MetricsLogger(
                join(checkpoint_dir, "train_log.jsonl"),
                enabled=self._is_primary,
            )
        return self.metrics_logger

    def _log_train(self, metrics) -> None:
        if (self.metrics_logger is not None
                and (self.global_step == 1
                     or self.global_step % self.log_every == 0)):
            self.metrics_logger.log(self.global_step, metrics, prefix="train")

    # console heartbeat interval; tests shrink it to beat every step
    heartbeat_s: float = 30.0

    def _heartbeat_reset(self, tag: str, max_steps: int) -> None:
        """Announce fit entry on the console. The reference shows a live
        tqdm bar with running losses (wav2lip_train.py:209,256-257); our
        full series goes to train_log.jsonl, but a silent console makes a
        step-1 stall (cold compile, wedged device link, starved loader)
        undiagnosable — so fit() prints where it starts and then beats."""
        self._hb_tag = tag
        self._hb_t = time.time()
        self._hb_step = self._hb_start_step = self.global_step
        self.log(f"[{tag}] fit: step {self.global_step} -> {max_steps} "
                 f"(next line after the first step completes)")

    def _heartbeat(self, metrics) -> None:
        """Rate-limited progress line. Blocks on the device loss scalars at
        most once per ``heartbeat_s`` — and right after the first step of
        this fit, so cold-compile/warmup time is visible — keeping the
        per-step loop free of host syncs (async dispatch stays intact)."""
        now = time.time()
        first = self.global_step == self._hb_start_step + 1
        if not first and now - self._hb_t < self.heartbeat_s:
            return
        rate = (self.global_step - self._hb_step) / max(now - self._hb_t,
                                                        1e-9)
        vals = " ".join(f"{k}={float(v):.4f}"
                        for k, v in sorted(metrics.items()))
        note = " (first step: compile + warmup)" if first else ""
        self.log(f"[{self._hb_tag}] step {self.global_step} "
                 f"{rate:.2f} steps/s {vals}{note}")
        self._hb_t, self._hb_step = now, self.global_step

    def _tick_epoch(self, steps_per_epoch: Optional[int]) -> None:
        """One reference 'epoch' = one pass over the dataset; with infinite
        samplers that is ``len(dataset) // batch`` steps
        (wav2lip_train.py:203,258: global_epoch += 1 per DataLoader pass)."""
        if steps_per_epoch and self.global_step % steps_per_epoch == 0:
            self.global_epoch += 1

    def _restore(self, path: str, state: TrainState,
                 reset_optimizer: bool) -> Dict:
        """Restore a trainer checkpoint against the live state's structure.

        Without a template Orbax returns optax namedtuples as plain dicts and
        the next ``tx.update`` crashes; restoring with ``item=`` re-builds the
        exact opt_state pytree. With ``reset_optimizer`` the raw restore is
        used (params/batch_stats are plain dicts, no template needed) so
        checkpoints from a different optimizer still load. Model-only
        checkpoints (saved without optimizer state, e.g. eval/export
        snapshots) are probed for and restored template-free, falling back
        to fresh optimizer state.
        """
        if reset_optimizer or not ckpt_lib.checkpoint_has_opt_state(path):
            return ckpt_lib.load_orbax(path)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "global_step": 0,
            "global_epoch": 0,
        }
        return ckpt_lib.load_orbax(path, item=template)


class SyncNetTrainer(_BaseTrainer):
    """Expert discriminator pretraining (reference color_syncnet_train.py)."""

    def __init__(self, config: Config = DEFAULT_CONFIG, mesh=None,
                 log_fn=print, rng_seed: int = 0):
        super().__init__(config, mesh, log_fn)
        tcfg = config.train
        self.tx = optax.adam(tcfg.syncnet_lr, b1=tcfg.adam_b1, b2=tcfg.adam_b2)
        self.train_step, self.eval_step = make_syncnet_steps(
            self.tx, mesh=self.mesh, compute_dtype=self._compute_dtype(tcfg),
            remat=getattr(tcfg, "remat", False),
            # the trainer owns self.state and always rebinds it, so the
            # consumed state's buffers can be donated to the update
            donate=True,
        )
        model = SyncNet()
        variables = jax.jit(model.init)(
            jax.random.key(rng_seed),
            np.zeros((1, 80, 16, 1), np.float32),
            np.zeros((1, config.model.img_size // 2, config.model.img_size,
                      3 * config.model.syncnet_T), np.float32),
        )
        self.state = TrainState.create(variables, self.tx)

    def fit(self, train_iter: Iterator, val_iter: Optional[Iterator],
            checkpoint_dir: str, max_steps: int,
            eval_batches: Optional[int] = None,
            steps_per_epoch: Optional[int] = None) -> Dict[str, float]:
        tcfg = self.cfg.train
        eval_batches = eval_batches or tcfg.eval_steps_syncnet
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._open_metrics(checkpoint_dir)
        self._heartbeat_reset("syncnet", max_steps)
        running, seen = 0.0, 0
        last = {}
        # the sampler yields (faces, mel, y); the step takes (mel, faces, y)
        feed = self._feed(train_iter, transform=lambda b: (b[1], b[0], b[2]))
        try:
            while self.global_step < max_steps:
                sharded = next(feed)
                self.state, metrics = self.train_step(self.state, *sharded)
                self.global_step += 1
                self._tick_epoch(steps_per_epoch)
                self._log_train(metrics)
                self._heartbeat(metrics)
                # accumulate the DEVICE scalar: float() here would block the
                # host every step and defeat async dispatch
                running = running + metrics["loss"]; seen += 1
                if (self.global_step == 1
                        or self.global_step % tcfg.syncnet_checkpoint_interval
                        == 0
                        or self.global_step == max_steps):
                    self.save(checkpoint_dir)
                if (val_iter is not None
                        and self.global_step % tcfg.syncnet_eval_interval
                        == 0):
                    last = self.evaluate(val_iter, eval_batches)
                    self.metrics_logger.log(self.global_step, last,
                                            prefix="eval")
        finally:
            feed.close()
        avg = float(running) / max(seen, 1)
        self.log(f"[syncnet] avg train loss {avg:.4f}")
        return last or {"loss": avg}

    def evaluate(self, val_iter: Iterator, num_batches: int):
        losses = []
        for _ in range(num_batches):
            faces, mel, y = next(val_iter)
            m = self.eval_step(self.state, *self._shard((mel, faces, y)))
            losses.append(float(m["loss"]))
        return {"loss": float(np.mean(losses))}

    def save(self, checkpoint_dir: str):
        if not self._is_primary:
            return
        ckpt_lib.save_checkpoint(
            checkpoint_dir, self.global_step,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "global_step": self.global_step,
                "global_epoch": self.global_epoch,
            },
        )

    def load(self, path: str, reset_optimizer: bool = False,
             overwrite_global_states: bool = True):
        restored = self._restore(path, self.state, reset_optimizer)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        if not reset_optimizer and restored.get("opt_state") is not None:
            self.state = self.state.replace(opt_state=restored["opt_state"])
        if overwrite_global_states:
            # model-only snapshots may lack counters; keep the live ones then
            self.global_step = int(restored.get("global_step",
                                                self.global_step) or 0)
            self.global_epoch = int(restored.get("global_epoch",
                                                 self.global_epoch) or 0)


class Wav2LipTrainer(_BaseTrainer):
    """Generator training with the frozen expert (reference wav2lip_train.py).

    ``sync_vars``: frozen SyncNet variables (from an Orbax checkpoint or an
    imported ``.pth``), loaded with reset-optimizer semantics
    (wav2lip_train.py:365).
    """

    def __init__(self, sync_vars, config: Config = DEFAULT_CONFIG, mesh=None,
                 log_fn=print, rng_seed: int = 0, gan: bool = False):
        super().__init__(config, mesh, log_fn)
        tcfg = config.train
        self.gan = gan
        b1 = tcfg.gan_adam_b1 if gan else tcfg.adam_b1
        self.tx = optax.adam(tcfg.initial_learning_rate, b1=b1, b2=tcfg.adam_b2)
        gen = Wav2LipGenerator()
        T, S = config.model.syncnet_T, config.model.img_size
        variables = jax.jit(gen.init)(
            jax.random.key(rng_seed),
            np.zeros((1, T, 80, 16, 1), np.float32),
            np.zeros((1, T, S, S, 6), np.float32),
        )
        self.state = TrainState.create(variables, self.tx)
        self.sync_vars = sync_vars
        self.syncnet_wt = tcfg.syncnet_wt
        if gan:
            self.disc_tx = optax.adam(tcfg.disc_initial_learning_rate,
                                      b1=tcfg.gan_adam_b1, b2=tcfg.adam_b2)
            disc = QualityDiscriminator()
            dvars = jax.jit(disc.init)(
                jax.random.key(rng_seed + 1),
                np.zeros((1, T, S, S, 3), np.float32),
            )
            self.disc_state = TrainState.create(dvars, self.disc_tx)
            self.disc_wt = tcfg.disc_wt
            self.train_step, self.eval_step = make_gan_steps(
                self.tx, self.disc_tx, mesh=self.mesh,
                compute_dtype=self._compute_dtype(tcfg),
                remat=getattr(tcfg, "remat", False),
                donate=True,  # trainer rebinds both states every step
            )
            self.wt_after_trigger = 0.03  # hq_wav2lip_train.py:290
        else:
            self.train_step, self.eval_step = make_wav2lip_steps(
                self.tx, mesh=self.mesh,
                compute_dtype=self._compute_dtype(tcfg),
                remat=getattr(tcfg, "remat", False),
                donate=True,  # trainer rebinds self.state every step
            )
            self.wt_after_trigger = tcfg.syncnet_wt_after_trigger  # 0.01

    def _step(self, sharded):
        """One update on an already device-placed batch (the fit loop's
        prefetcher uploads it while the previous step runs)."""
        wt = np.float32(self.syncnet_wt)
        if self.gan:
            # drive the two exposed programs directly so the generated
            # batch is available for the sample-image dumps (the combined
            # wrapper drops it; hq_wav2lip_train.py:279-282 dumps collages
            # at every checkpoint)
            self.state, gmetrics, g = self.train_step.gen_step(
                self.state, self.disc_state.params, self.sync_vars, sharded,
                wt, np.float32(self.disc_wt), use_sync=self.syncnet_wt > 0.0,
            )
            self.disc_state, dmetrics = self.train_step.disc_step(
                self.disc_state, sharded["gt"], g
            )
            return {**gmetrics, **dmetrics}, g
        self.state, metrics, g = self.train_step(
            self.state, self.sync_vars, sharded, wt,
            use_sync=self.syncnet_wt > 0.0,
        )
        return metrics, g

    def fit(self, train_iter: Iterator, val_iter: Optional[Iterator],
            checkpoint_dir: str, max_steps: int,
            eval_batches: Optional[int] = None,
            dump_samples: bool = False,
            steps_per_epoch: Optional[int] = None) -> Dict[str, float]:
        tcfg = self.cfg.train
        if eval_batches is None:
            eval_batches = (tcfg.eval_steps_gan if self.gan
                            else tcfg.eval_steps_wav2lip)
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._open_metrics(checkpoint_dir)
        self._heartbeat_reset("gan" if self.gan else "wav2lip", max_steps)
        last = {}
        t0 = time.time()
        feed = self._feed(train_iter)
        try:
            while self.global_step < max_steps:
                batch = next(feed)  # device-resident (prefetched upload)
                metrics, g = self._step(batch)
                self.global_step += 1
                self._tick_epoch(steps_per_epoch)
                self._log_train(metrics)
                self._heartbeat(metrics)
                if (self.global_step == 1
                        or self.global_step % tcfg.checkpoint_interval == 0
                        or self.global_step == max_steps):
                    if dump_samples and g is not None and self._is_primary:
                        save_sample_images(_local_rows(batch["x"]),
                                           _local_rows(g),
                                           _local_rows(batch["gt"]),
                                           self.global_step, checkpoint_dir)
                    self.save(checkpoint_dir)
                if (val_iter is not None
                        and self.global_step % tcfg.eval_interval == 0):
                    last = self.evaluate(val_iter, eval_batches)
                    self.metrics_logger.log(self.global_step, last,
                                            prefix="eval")
                    # curriculum trigger (wav2lip_train.py:249-254)
                    if last["sync"] < tcfg.sync_loss_curriculum_threshold:
                        self.syncnet_wt = self.wt_after_trigger
        finally:
            feed.close()
        dt = time.time() - t0
        self.log(
            f"[train] {self.global_step} steps in {dt:.1f}s "
            f"({self.global_step / max(dt, 1e-9):.2f} steps/s), last {last}"
        )
        return last

    def evaluate(self, val_iter: Iterator, num_batches: int):
        sums: Dict[str, float] = {}
        for _ in range(num_batches):
            batch = self._shard(next(val_iter))
            if self.gan:
                m = self.eval_step(self.state, self.disc_state,
                                   self.sync_vars, batch)
            else:
                m = self.eval_step(self.state, self.sync_vars, batch)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return {k: v / num_batches for k, v in sums.items()}

    def save(self, checkpoint_dir: str):
        if not self._is_primary:
            return
        ckpt_lib.save_checkpoint(
            checkpoint_dir, self.global_step,
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "global_step": self.global_step,
                "global_epoch": self.global_epoch,
            },
        )
        if self.gan:
            ckpt_lib.save_checkpoint(
                checkpoint_dir, self.global_step,
                {
                    "params": self.disc_state.params,
                    "batch_stats": None,
                    "opt_state": self.disc_state.opt_state,
                    "global_step": self.global_step,
                    "global_epoch": self.global_epoch,
                },
                prefix="disc_",  # hq_wav2lip_train.py:354-356
            )

    def load(self, path: str, reset_optimizer: bool = False,
             overwrite_global_states: bool = True):
        restored = self._restore(path, self.state, reset_optimizer)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        if not reset_optimizer and restored.get("opt_state") is not None:
            self.state = self.state.replace(opt_state=restored["opt_state"])
        if overwrite_global_states:
            # model-only snapshots may lack counters; keep the live ones then
            self.global_step = int(restored.get("global_step",
                                                self.global_step) or 0)
            self.global_epoch = int(restored.get("global_epoch",
                                                 self.global_epoch) or 0)

    def load_disc(self, path: str, reset_optimizer: bool = False):
        restored = self._restore(path, self.disc_state, reset_optimizer)
        self.disc_state = self.disc_state.replace(params=restored["params"])
        if not reset_optimizer and restored.get("opt_state") is not None:
            self.disc_state = self.disc_state.replace(
                opt_state=restored["opt_state"]
            )
