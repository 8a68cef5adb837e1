"""Jitted training/eval step builders for the three pipelines.

Each builder returns pure functions closed over the model definitions and
comes in two flavours selected by the ``mesh`` argument:

* ``mesh=None`` — a plain ``jax.jit`` program. Data parallelism, if any,
  comes from input sharding: batches placed with a batch-axis
  ``NamedSharding`` make XLA's SPMD partitioner insert the collectives.
  Right for a single chip (no collectives at all).
* ``mesh=Mesh(...)`` — an explicit ``jax.shard_map`` program over the 1-D
  ``data`` axis. Each device computes gradients on its local batch shard,
  and ALL cross-device communication is fused into ONE ``pmean`` of a single
  flat vector (gradients ⊕ BatchNorm running stats ⊕ metrics — the classic
  DDP flat-bucket layout). The SPMD-partitioner alternative emits one
  collective per gradient tensor plus two per BatchNorm layer in the forward
  (global-batch statistics): hundreds of small collectives per step, each
  paying a rendezvous, which is measurable on ICI and catastrophic on
  hosts with few cores (the driver's virtual-device dryrun). One fused
  all-reduce rides ICI at full bandwidth instead.

BatchNorm semantics on the mesh path are **per-replica** (statistics over the
local shard, running stats averaged across devices after the step). This
matches the reference checkpoints more closely than global-batch statistics:
they were trained with ``torch.nn.DataParallel`` (inference.py:174-175),
whose replicas also normalize per-GPU sub-batch. At mesh size 1 both paths
are bit-identical.

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
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree
from jax.sharding import PartitionSpec as P

from wav2lip_tpu.models import Wav2LipGenerator, SyncNet, QualityDiscriminator
from wav2lip_tpu.parallel.mesh import DATA_AXIS
from wav2lip_tpu.train.losses import (
    bce,
    cosine_bce_loss,
    l1_loss,
    fold_lower_half_for_syncnet,
)
from wav2lip_tpu.train.state import TrainState
from wav2lip_tpu.utils.dtypes import cast_floats as _cast_floats

_REP = P()           # replicated: parameters, optimizer state, scalars
_BATCH = P(DATA_AXIS)  # leading-axis sharded: batches, generated frames


def _as_unit(a):
    """uint8 pixel tensors → float32 in [0, 1]; float tensors pass through.

    The host input pipeline ships pixels as uint8 — 4x fewer bytes over the
    host→device hop, which is the end-to-end trainer's wall on thin links
    (bench ``train_e2e_stages``) — and this cast runs on device, fused by XLA
    into the first convolution. uint8→f32 conversion is exact; the /255 is
    compiled to a multiply-by-reciprocal that lands within 1 ulp of the
    reference's host-side IEEE division (``img / 255.``,
    wav2lip_train.py:141) — measured: 126/256 byte values off by exactly
    1 ulp, the rest exact (tests/test_train.py::TestUint8Batches). A ≤6e-8
    input perturbation in [0,1], orders below the JPEG quantization noise
    the pixels already carry.
    """
    if a.dtype == jnp.uint8:
        return a.astype(jnp.float32) / 255.0
    return a


def _unit_batch(batch):
    """``_as_unit`` over the pixel entries of a wav2lip batch dict."""
    out = dict(batch)
    for k in ("x", "gt"):
        if k in out:
            out[k] = _as_unit(out[k])
    return out


def _identity_reduce(*trees):
    """mesh=None: XLA's partitioner owns any cross-device reduction."""
    return trees if len(trees) > 1 else trees[0]


def _fused_pmean(*trees):
    """Average pytrees across the data axis in ONE collective: ravel every
    tree into a single flat vector, ``pmean`` it, unravel."""
    flats, unravels = [], []
    for t in trees:
        f, u = ravel_pytree(t)
        flats.append(f)
        unravels.append(u)
    sizes = [f.size for f in flats]
    # optimization barriers pin the single-buffer layout: without them XLA's
    # simplifier rewrites AR(concat(xs)) back into concat(AR(xs)) — one
    # collective per leaf (127 for SyncNet), re-creating the per-tensor
    # rendezvous storm this fusion exists to avoid
    combined = jax.lax.optimization_barrier(jnp.concatenate(flats))
    combined = jax.lax.optimization_barrier(
        jax.lax.pmean(combined, DATA_AXIS)
    )
    parts = (jnp.split(combined, list(np.cumsum(sizes))[:-1])
             if len(sizes) > 1 else [combined])
    out = tuple(u(p) for u, p in zip(unravels, parts))
    return out if len(out) > 1 else out[0]


def _wrap(mesh, body: Callable, in_specs, out_specs,
          static_argnames: Tuple[str, ...] = (),
          donate_argnums: Tuple[int, ...] = ()):
    """jit(body) when mesh is None, else jit(shard_map(body)).

    ``body`` must accept a ``reduce`` kwarg — ``_fused_pmean`` on the mesh
    path (local grads/stats/metrics, one collective), identity otherwise
    (XLA SPMD reduces from the input shardings).

    ``donate_argnums``: with ``donate=True`` on a step builder, the train
    step donates its consumed TrainState (the caller rebinds ``state =
    step(state, ...)``) so XLA writes the updated params/opt_state into the
    input buffers instead of allocating a second full copy — lower HBM
    high-water. OPT-IN because donation invalidates the passed-in state AND
    any aliases of its leaves (e.g. the ``variables`` tree the state was
    created from — ``TrainState.create`` does not copy); the trainers own
    their states and enable it.
    """
    if mesh is None:
        fn = functools.partial(body, reduce=_identity_reduce)
        return jax.jit(fn, static_argnames=static_argnames,
                       donate_argnums=donate_argnums)

    # check_vma=False: with the check on, JAX's replication tracking makes
    # the autodiff transpose of every replicated parameter insert its own
    # per-tensor psum (125 extra all-reduces for SyncNet — the exact storm
    # the fused reduce avoids). Off, gradients come out per-device partial
    # and ``_fused_pmean`` is the one true collective.
    if static_argnames:
        def stepped(*args, **static_kw):
            inner = functools.partial(body, reduce=_fused_pmean, **static_kw)
            inner.__name__ = body.__name__  # stable jit/cache-entry name
            return jax.shard_map(
                inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )(*args)
        stepped.__name__ = body.__name__
        return jax.jit(stepped, static_argnames=static_argnames,
                       donate_argnums=donate_argnums)

    inner = functools.partial(body, reduce=_fused_pmean)
    inner.__name__ = body.__name__
    return jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ), donate_argnums=donate_argnums)


def _apply_train(model, params, batch_stats, *args, compute_dtype=None):
    """model.apply in train mode, returning (out, new_batch_stats).

    ``compute_dtype``: optional mixed-precision mode — parameters and inputs
    cast to it (bfloat16: ~2x MXU throughput, half the activation HBM
    traffic) while the master params, optimizer state and the STORED
    BatchNorm running stats stay float32; outputs return as float32 so every
    loss reduces at full precision. bf16's f32-sized exponent needs no loss
    scaling. Off (None) by default — reference parity is float32
    (train.compute_dtype flips it).
    """
    variables = {"params": _cast_floats(params, compute_dtype)}
    if batch_stats is not None:
        # NOT cast: train-mode BN normalizes with batch statistics, so the
        # running stats do no MXU work here — casting them would only
        # quantize the stored f32 mean/var to bf16 every step and erase
        # momentum updates smaller than ~0.4% of the value
        variables["batch_stats"] = batch_stats
    out, mut = model.apply(
        variables, *_cast_floats(tuple(args), compute_dtype),
        train=True, mutable=["batch_stats"]
    )
    new_bs = mut.get("batch_stats")
    if compute_dtype is not None:
        out = _cast_floats(out, jnp.float32)
        new_bs = _cast_floats(new_bs, jnp.float32)
    return out, new_bs


def _forward(model, compute_dtype, remat):
    """A (params, batch_stats, *inputs) → (out, new_bs) train-mode forward,
    optionally wrapped in ``jax.checkpoint``: with remat the backward pass
    recomputes activations instead of keeping every conv feature map live,
    trading ~1/3 more FLOPs for activation memory — the lever for larger
    per-chip batches (train.remat)."""
    def fwd(params, batch_stats, *inputs):
        return _apply_train(model, params, batch_stats, *inputs,
                            compute_dtype=compute_dtype)

    return jax.checkpoint(fwd) if remat else fwd


def _sync_loss(sync_model, sync_vars, mel, g, compute_dtype=None):
    """Frozen-expert sync loss; train-mode BN (see module docstring), stat
    updates discarded."""
    v_in = fold_lower_half_for_syncnet(g)
    (a, v), _ = sync_model.apply(
        _cast_floats(sync_vars, compute_dtype),
        _cast_floats(mel, compute_dtype),
        _cast_floats(v_in, compute_dtype),
        train=True, mutable=["batch_stats"],
    )
    a, v = a.astype(jnp.float32), v.astype(jnp.float32)
    y = jnp.ones((a.shape[0], 1), a.dtype)
    return cosine_bce_loss(a, v, y)


# ---------------------------------------------------------------------------
# SyncNet expert pretraining
# ---------------------------------------------------------------------------


def make_syncnet_steps(tx: optax.GradientTransformation, mesh=None,
                       compute_dtype=None, remat: bool = False,
                       donate: bool = False):
    model = SyncNet()
    forward = _forward(model, compute_dtype, remat)

    def train_body(state: TrainState, mel, faces, y, *, reduce):
        if mel.ndim == 3:  # (B, 80, 16) from the data pipeline → NHWC
            mel = mel[..., None]
        faces = _as_unit(faces)

        def loss_fn(params):
            (a, v), new_bs = forward(params, state.batch_stats, mel, faces)
            a, v = a.astype(jnp.float32), v.astype(jnp.float32)
            return cosine_bce_loss(a, v, y), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads, new_bs, metrics = reduce(grads, new_bs, {"loss": loss})
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        ), metrics

    def eval_body(state: TrainState, mel, faces, y, *, reduce):
        if mel.ndim == 3:  # (B, 80, 16) from the data pipeline → NHWC
            mel = mel[..., None]
        a, v = model.apply(state.variables(), mel, _as_unit(faces),
                           train=False)
        return reduce({"loss": cosine_bce_loss(a, v, y)})

    data3 = (_REP, _BATCH, _BATCH, _BATCH)
    train_step = _wrap(mesh, train_body, data3, (_REP, _REP),
                       donate_argnums=(0,) if donate else ())
    eval_step = _wrap(mesh, eval_body, data3, _REP)
    return train_step, eval_step


# ---------------------------------------------------------------------------
# Wav2Lip generator training (frozen expert)
# ---------------------------------------------------------------------------


def make_wav2lip_steps(tx: optax.GradientTransformation, mesh=None,
                       compute_dtype=None, remat: bool = False,
                       donate: bool = False):
    gen = Wav2LipGenerator()
    sync = SyncNet()
    gen_forward = _forward(gen, compute_dtype, remat)

    def train_body(state: TrainState, sync_vars, batch: Dict[str, jax.Array],
                   syncnet_wt, *, use_sync: bool, reduce):
        batch = _unit_batch(batch)

        def loss_fn(params):
            g, new_bs = gen_forward(params, state.batch_stats,
                                    batch["indiv_mels"], batch["x"])
            l1 = l1_loss(g, batch["gt"])
            if use_sync:
                s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g,
                               compute_dtype=compute_dtype)
            else:
                s = jnp.zeros((), g.dtype)
            loss = syncnet_wt * s + (1.0 - syncnet_wt) * l1
            return loss, (new_bs, l1, s, g)

        (loss, (new_bs, l1, s, g)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads, new_bs, metrics = reduce(
            grads, new_bs, {"loss": loss, "l1": l1, "sync": s}
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return state, metrics, g

    def eval_body(state: TrainState, sync_vars, batch, *, reduce):
        batch = _unit_batch(batch)
        g = gen.apply(state.variables(), batch["indiv_mels"], batch["x"],
                      train=False)
        l1 = l1_loss(g, batch["gt"])
        s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g)
        return reduce({"l1": l1, "sync": s})

    train_step = _wrap(mesh, train_body, (_REP, _REP, _BATCH, _REP),
                       (_REP, _REP, _BATCH),
                       static_argnames=("use_sync",),
                       donate_argnums=(0,) if donate else ())
    eval_step = _wrap(mesh, eval_body, (_REP, _REP, _BATCH), _REP)
    return train_step, eval_step


# ---------------------------------------------------------------------------
# HQ (GAN) training
# ---------------------------------------------------------------------------


def make_gan_steps(gen_tx: optax.GradientTransformation,
                   disc_tx: optax.GradientTransformation, mesh=None,
                   compute_dtype=None, remat: bool = False,
                   donate: bool = False):
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
    gen_forward = _forward(gen, compute_dtype, remat)

    def gen_body(gen_state: TrainState, disc_params, sync_vars, batch,
                 syncnet_wt, disc_wt, *, use_sync: bool, reduce):
        batch = _unit_batch(batch)

        # generator update (hq_wav2lip_train.py:221-243)
        def gen_loss_fn(params):
            g, new_bs = gen_forward(params, gen_state.batch_stats,
                                    batch["indiv_mels"], batch["x"])
            l1 = l1_loss(g, batch["gt"])
            if use_sync:
                s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g,
                               compute_dtype=compute_dtype)
            else:
                s = jnp.zeros((), g.dtype)
            # perceptual term: BCE(disc(g), 1) (models/wav2lip.py:163-174)
            pred = disc.apply(
                {"params": _cast_floats(disc_params, compute_dtype)},
                _cast_floats(g, compute_dtype),
            ).astype(jnp.float32)
            percep = bce(pred, jnp.ones_like(pred))
            loss = (syncnet_wt * s + disc_wt * percep
                    + (1.0 - syncnet_wt - disc_wt) * l1)
            return loss, (new_bs, l1, s, percep, g)

        (gloss, (new_bs, l1, s, percep, g)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(gen_state.params)
        grads, new_bs, metrics = reduce(
            grads, new_bs,
            {"gen_loss": gloss, "l1": l1, "sync": s, "percep": percep},
        )
        updates, opt_state = gen_tx.update(grads, gen_state.opt_state,
                                           gen_state.params)
        gen_state = gen_state.replace(
            params=optax.apply_updates(gen_state.params, updates),
            batch_stats=new_bs,
            opt_state=opt_state,
            step=gen_state.step + 1,
        )
        return gen_state, metrics, jax.lax.stop_gradient(g)

    def disc_body(disc_state: TrainState, gt, g_detached, *, reduce):
        gt = _as_unit(gt)

        # discriminator update on real + detached fake
        # (hq_wav2lip_train.py:245-256: two backwards, one step)
        def disc_loss_fn(params):
            params_c = _cast_floats(params, compute_dtype)
            pred_real = disc.apply(
                {"params": params_c}, _cast_floats(gt, compute_dtype)
            ).astype(jnp.float32)
            real_loss = bce(pred_real, jnp.ones_like(pred_real))
            pred_fake = disc.apply(
                {"params": params_c}, _cast_floats(g_detached, compute_dtype)
            ).astype(jnp.float32)
            fake_loss = bce(pred_fake, jnp.zeros_like(pred_fake))
            return real_loss + fake_loss, (real_loss, fake_loss)

        (_, (real_loss, fake_loss)), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(disc_state.params)
        dgrads, metrics = reduce(
            dgrads, {"disc_real": real_loss, "disc_fake": fake_loss}
        )
        dupdates, dopt_state = disc_tx.update(dgrads, disc_state.opt_state,
                                              disc_state.params)
        disc_state = disc_state.replace(
            params=optax.apply_updates(disc_state.params, dupdates),
            opt_state=dopt_state,
            step=disc_state.step + 1,
        )
        return disc_state, metrics

    gen_step = _wrap(mesh, gen_body,
                     (_REP, _REP, _REP, _BATCH, _REP, _REP),
                     (_REP, _REP, _BATCH),
                     static_argnames=("use_sync",),
                     donate_argnums=(0,) if donate else ())
    disc_step = _wrap(mesh, disc_body, (_REP, _BATCH, _BATCH), (_REP, _REP),
                      donate_argnums=(0,) if donate else ())

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

    def eval_body(gen_state: TrainState, disc_state: TrainState, sync_vars,
                  batch, *, reduce):
        batch = _unit_batch(batch)
        g = gen.apply(gen_state.variables(), batch["indiv_mels"], batch["x"],
                      train=False)
        l1 = l1_loss(g, batch["gt"])
        s = _sync_loss(sync, sync_vars, batch["mel"][..., None], g)
        pred_real = disc.apply({"params": disc_state.params}, batch["gt"])
        pred_fake = disc.apply({"params": disc_state.params}, g)
        return reduce({
            "l1": l1,
            "sync": s,
            "disc_real": bce(pred_real, jnp.ones_like(pred_real)),
            "disc_fake": bce(pred_fake, jnp.zeros_like(pred_fake)),
            "percep": bce(pred_fake, jnp.ones_like(pred_fake)),
        })

    eval_step = _wrap(mesh, eval_body, (_REP, _REP, _REP, _BATCH), _REP)
    return train_step, eval_step
