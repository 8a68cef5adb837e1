"""Jitted training/eval step builders for the three pipelines.

Each builder returns pure functions closed over the model definitions; data
parallelism comes from input sharding — batches are placed with a batch-axis
``NamedSharding`` over the mesh (wav2lip_tpu.parallel) and XLA's SPMD
partitioner inserts the gradient all-reduce over ICI. The same compiled step
runs on one chip or a pod slice.

Loss compositions and update orders match the reference exactly:
* SyncNet: BCE-on-cosine (color_syncnet_train.py:134-161);
* Wav2Lip: ``wt·sync + (1-wt)·L1``, sync via the frozen expert on generated
  lower halves (wav2lip_train.py:192-229);
* GAN: generator update with ``s·sync + d·perceptual + (1-s-d)·L1``, then a
  discriminator update on real and detached fake with accumulated gradients
  (hq_wav2lip_train.py:221-256).

Reference quirk preserved: the frozen SyncNet is never put in eval mode by
the reference trainers, so its BatchNorm normalizes with *batch* statistics
during sync-loss computation; we do the same (discarding stat updates).
``syncnet_wt``/``disc_wt`` arrive as runtime scalars — the curriculum trigger
(wav2lip_train.py:253-254) flips them host-side without recompilation; a
static ``use_sync`` flag selects the cheaper no-expert graph while the weight
is exactly zero.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from wav2lip_tpu.models import Wav2LipGenerator, SyncNet, QualityDiscriminator
from wav2lip_tpu.train.losses import (
    bce,
    cosine_bce_loss,
    l1_loss,
    fold_lower_half_for_syncnet,
)
from wav2lip_tpu.train.state import TrainState


def _apply_train(model, params, batch_stats, *args):
    """model.apply in train mode, returning (out, new_batch_stats)."""
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    out, mut = model.apply(
        variables, *args, train=True, mutable=["batch_stats"]
    )
    return out, mut.get("batch_stats")


def _sync_loss(sync_model, sync_vars, mel, g):
    """Frozen-expert sync loss; train-mode BN (see module docstring), stat
    updates discarded."""
    v_in = fold_lower_half_for_syncnet(g)
    (a, v), _ = sync_model.apply(
        sync_vars, mel, v_in, train=True, mutable=["batch_stats"]
    )
    y = jnp.ones((a.shape[0], 1), a.dtype)
    return cosine_bce_loss(a, v, y)


# ---------------------------------------------------------------------------
# SyncNet expert pretraining
# ---------------------------------------------------------------------------


def make_syncnet_steps(tx: optax.GradientTransformation):
    model = SyncNet()

    @jax.jit
    def train_step(state: TrainState, mel, faces, y):
        def loss_fn(params):
            (a, v), new_bs = _apply_train(model, params, state.batch_stats,
                                          mel, faces)
            return cosine_bce_loss(a, v, y), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        ), {"loss": loss}

    @jax.jit
    def eval_step(state: TrainState, mel, faces, y):
        a, v = model.apply(state.variables(), mel, faces, train=False)
        return {"loss": cosine_bce_loss(a, v, y)}

    return train_step, eval_step


# ---------------------------------------------------------------------------
# Wav2Lip generator training (frozen expert)
# ---------------------------------------------------------------------------


def make_wav2lip_steps(tx: optax.GradientTransformation):
    gen = Wav2LipGenerator()
    sync = SyncNet()

    @functools.partial(jax.jit, static_argnames=("use_sync",))
    def train_step(state: TrainState, sync_vars, batch: Dict[str, jax.Array],
                   syncnet_wt, use_sync: bool):
        def loss_fn(params):
            g, new_bs = _apply_train(gen, params, state.batch_stats,
                                     batch["indiv_mels"], batch["x"])
            l1 = l1_loss(g, batch["gt"])
            if use_sync:
                s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g)
            else:
                s = jnp.zeros((), g.dtype)
            loss = syncnet_wt * s + (1.0 - syncnet_wt) * l1
            return loss, (new_bs, l1, s, g)

        (loss, (new_bs, l1, s, g)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return state, {"loss": loss, "l1": l1, "sync": s}, g

    @jax.jit
    def eval_step(state: TrainState, sync_vars, batch):
        g = gen.apply(state.variables(), batch["indiv_mels"], batch["x"],
                      train=False)
        l1 = l1_loss(g, batch["gt"])
        s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g)
        return {"l1": l1, "sync": s}

    return train_step, eval_step


# ---------------------------------------------------------------------------
# HQ (GAN) training
# ---------------------------------------------------------------------------


def make_gan_steps(gen_tx: optax.GradientTransformation,
                   disc_tx: optax.GradientTransformation):
    """The generator update and the discriminator update are two separately
    jitted programs chained by a host-side wrapper: the reference also runs
    them as two sequential optimizer steps (hq_wav2lip_train.py:221-256), the
    generated batch ``g`` stays on device between the two, and two half-size
    XLA programs compile far faster than one monolith (the round-1 single
    program took >10 minutes of cold XLA:CPU compile and timed out the
    multi-chip dryrun)."""
    gen = Wav2LipGenerator()
    sync = SyncNet()
    disc = QualityDiscriminator()

    @functools.partial(jax.jit, static_argnames=("use_sync",))
    def gen_step(gen_state: TrainState, disc_params, sync_vars, batch,
                 syncnet_wt, disc_wt, use_sync: bool):
        # generator update (hq_wav2lip_train.py:221-243)
        def gen_loss_fn(params):
            g, new_bs = _apply_train(gen, params, gen_state.batch_stats,
                                     batch["indiv_mels"], batch["x"])
            l1 = l1_loss(g, batch["gt"])
            if use_sync:
                s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g)
            else:
                s = jnp.zeros((), g.dtype)
            # perceptual term: BCE(disc(g), 1) (models/wav2lip.py:163-174)
            pred = disc.apply({"params": disc_params}, g)
            percep = bce(pred, jnp.ones_like(pred))
            loss = (syncnet_wt * s + disc_wt * percep
                    + (1.0 - syncnet_wt - disc_wt) * l1)
            return loss, (new_bs, l1, s, percep, g)

        (gloss, (new_bs, l1, s, percep, g)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(gen_state.params)
        updates, opt_state = gen_tx.update(grads, gen_state.opt_state,
                                           gen_state.params)
        gen_state = gen_state.replace(
            params=optax.apply_updates(gen_state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
            step=gen_state.step + 1,
        )
        metrics = {"gen_loss": gloss, "l1": l1, "sync": s, "percep": percep}
        return gen_state, metrics, jax.lax.stop_gradient(g)

    @jax.jit
    def disc_step(disc_state: TrainState, gt, g_detached):
        # discriminator update on real + detached fake
        # (hq_wav2lip_train.py:245-256: two backwards, one step)
        def disc_loss_fn(params):
            pred_real = disc.apply({"params": params}, gt)
            real_loss = bce(pred_real, jnp.ones_like(pred_real))
            pred_fake = disc.apply({"params": params}, g_detached)
            fake_loss = bce(pred_fake, jnp.zeros_like(pred_fake))
            return real_loss + fake_loss, (real_loss, fake_loss)

        (_, (real_loss, fake_loss)), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(disc_state.params)
        dupdates, dopt_state = disc_tx.update(dgrads, disc_state.opt_state,
                                              disc_state.params)
        disc_state = disc_state.replace(
            params=optax.apply_updates(disc_state.params, dupdates),
            opt_state=dopt_state,
            step=disc_state.step + 1,
        )
        return disc_state, {"disc_real": real_loss, "disc_fake": fake_loss}

    def train_step(gen_state: TrainState, disc_state: TrainState, sync_vars,
                   batch, syncnet_wt, disc_wt, use_sync: bool):
        gen_state, gmetrics, g = gen_step(
            gen_state, disc_state.params, sync_vars, batch,
            syncnet_wt, disc_wt, use_sync=use_sync,
        )
        disc_state, dmetrics = disc_step(disc_state, batch["gt"], g)
        return gen_state, disc_state, {**gmetrics, **dmetrics}

    # expose the two underlying programs so callers (the multi-chip dryrun)
    # can AOT-compile them in parallel threads and log compile progress
    train_step.gen_step = gen_step
    train_step.disc_step = disc_step

    @jax.jit
    def eval_step(gen_state: TrainState, disc_state: TrainState, sync_vars,
                  batch):
        g = gen.apply(gen_state.variables(), batch["indiv_mels"], batch["x"],
                      train=False)
        l1 = l1_loss(g, batch["gt"])
        s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g)
        pred_real = disc.apply({"params": disc_state.params}, batch["gt"])
        pred_fake = disc.apply({"params": disc_state.params}, g)
        return {
            "l1": l1,
            "sync": s,
            "disc_real": bce(pred_real, jnp.ones_like(pred_real)),
            "disc_fake": bce(pred_fake, jnp.zeros_like(pred_fake)),
            "percep": bce(pred_fake, jnp.ones_like(pred_fake)),
        }

    return train_step, eval_step
