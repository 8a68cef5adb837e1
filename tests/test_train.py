"""Training step and trainer tests on the virtual 8-device CPU mesh.

Covers: one jitted step of each pipeline (params change, metrics finite, BN
stats update), the GAN two-optimizer update order, checkpoint save/restore
round-trips, and the curriculum trigger semantics.
"""

import dataclasses
import os

import jax
import numpy as np
import optax
import pytest

from wav2lip_tpu.config import DEFAULT_CONFIG
from wav2lip_tpu.parallel import make_mesh, shard_batch
from wav2lip_tpu.train.state import TrainState
from wav2lip_tpu.train.steps import (
    _as_unit,
    make_gan_steps,
    make_syncnet_steps,
    make_wav2lip_steps,
)


def tree_l2_diff(a, b):
    return sum(
        float(np.abs(np.asarray(x) - np.asarray(y)).sum())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def mesh2():
    """2-device mesh for the step tests: big enough to exercise real
    cross-device collectives and shard/replicate semantics, small enough
    that the serialized per-device compute stays fast on a low-core-count
    host (the 8-device step coverage lives in the driver's multi-chip
    dryrun and the two-process distributed test)."""
    return make_mesh(jax.devices()[:2])


@pytest.fixture(scope="module")
def mesh1():
    """1-device mesh: shard_map path with no collectives — used by trainer
    tests where the subject is resume/loop semantics, not sharding."""
    return make_mesh(jax.devices()[:1])


@pytest.fixture(scope="module")
def sync_batch():
    r = np.random.default_rng(0)
    B = 8
    return (
        r.standard_normal((B, 80, 16, 1)).astype(np.float32),
        r.random((B, 48, 96, 15)).astype(np.float32),
        (r.random((B, 1)) > 0.5).astype(np.float32),
    )


@pytest.fixture(scope="module")
def w2l_batch():
    r = np.random.default_rng(1)
    B, T = 2, 5
    return {
        "x": r.random((B, T, 96, 96, 6)).astype(np.float32),
        "indiv_mels": r.standard_normal((B, T, 80, 16, 1)).astype(np.float32),
        "mel": r.standard_normal((B, 80, 16)).astype(np.float32),
        "gt": r.random((B, T, 96, 96, 3)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def sync_vars():
    from wav2lip_tpu.models import SyncNet

    return jax.jit(SyncNet().init)(
        jax.random.key(0),
        np.zeros((1, 80, 16, 1), np.float32),
        np.zeros((1, 48, 96, 15), np.float32),
    )


class TestSyncNetStep:
    def test_step_updates_and_learns(self, mesh2, sync_batch, sync_vars):
        tx = optax.adam(1e-4)
        train_step, eval_step = make_syncnet_steps(tx, mesh=mesh2)
        state = TrainState.create(sync_vars, tx)
        batch = shard_batch(mesh2, sync_batch)

        # snapshot the pre-step leaves host-side: the trainers build these
        # steps with donate=True (input-state buffers dead after the call),
        # so comparisons stay donation-safe regardless of configuration
        params0 = jax.tree.map(np.asarray, state.params)
        stats0 = jax.tree.map(np.asarray, state.batch_stats)
        state2, m = train_step(state, *batch)
        assert np.isfinite(float(m["loss"]))
        assert tree_l2_diff(params0, state2.params) > 0
        assert tree_l2_diff(stats0, state2.batch_stats) > 0
        assert int(state2.step) == 1

        em = eval_step(state2, *batch)
        assert np.isfinite(float(em["loss"]))

    def test_donate_true_consumes_state(self, sync_batch, sync_vars):
        """donate=True — the trainers' configuration: the update writes into
        the consumed state's buffers (old state reads fail as deleted), and
        the rebound state keeps stepping. A private copy of the shared
        sync_vars fixture is donated, never the fixture itself."""
        import jax.numpy as jnp

        tx = optax.adam(1e-4)
        train_step, _ = make_syncnet_steps(tx, donate=True)
        state = TrainState.create(
            jax.tree.map(jnp.array, sync_vars), tx
        )
        old = state
        state, m = train_step(state, *sync_batch)
        assert np.isfinite(float(m["loss"]))
        with pytest.raises(RuntimeError, match="deleted"):
            np.asarray(jax.tree.leaves(old.params)[0])
        state, m = train_step(state, *sync_batch)
        assert int(state.step) == 2

    def test_loss_decreases_over_steps(self, sync_batch, sync_vars):
        # single-device jit path: the subject is the optimizer update, not
        # sharding; keeps 12 sequential steps fast on low-core hosts.
        # Reference lr (1e-4, hparams.py:89): 10x that overfits the fixed
        # batch so hard the L2-normalize gradients blow up by step ~11
        # (1/||pre-norm|| as embeddings collapse) — divergence, not a bug.
        tx = optax.adam(1e-4)
        train_step, _ = make_syncnet_steps(tx)
        state = TrainState.create(sync_vars, tx)
        batch = sync_batch
        first = None
        for i in range(12):
            state, m = train_step(state, *batch)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first  # overfits the fixed batch

    def test_remat_step_matches_plain(self, sync_batch, sync_vars):
        """train.remat recomputes activations in the backward pass;
        numerics must be identical to the plain step."""
        tx = optax.adam(1e-3)
        plain, _ = make_syncnet_steps(tx)
        remat, _ = make_syncnet_steps(tx, remat=True)
        s1 = TrainState.create(sync_vars, tx)
        s2 = TrainState.create(sync_vars, tx)
        s1, m1 = plain(s1, *sync_batch)
        s2, m2 = remat(s2, *sync_batch)
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]),
                                                  rel=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    def test_mixed_precision_step(self, sync_batch, sync_vars):
        """Opt-in bf16 compute: loss still decreases, and master params /
        optimizer state / stored BN stats stay float32."""
        import jax.numpy as jnp

        tx = optax.adam(1e-3)
        train_step, _ = make_syncnet_steps(tx, compute_dtype=jnp.bfloat16)
        state = TrainState.create(sync_vars, tx)
        first = None
        for _ in range(6):
            state, m = train_step(state, *sync_batch)
            if first is None:
                first = float(m["loss"])
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss"]) < first
        for leaf in jax.tree.leaves(
            (state.params, state.batch_stats, state.opt_state)
        ):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                assert leaf.dtype == jnp.float32


class TestUint8Batches:
    """The host pipeline ships pixels as uint8 (4x fewer host→device bytes);
    the jitted steps cast to f32/255 on device. uint8→f32 is exact; the /255
    is compiled by XLA to a multiply-by-reciprocal, which lands within 1 ulp
    of the host path's IEEE division (measured: 126/256 byte values off by
    exactly 1 ulp, the rest exact) — an input perturbation of ≤6e-8 in [0,1],
    orders below JPEG quantization noise the pixels already carry."""

    def test_device_cast_within_one_ulp_of_host(self):
        """The exact contract over every possible byte value: device
        cast+divide vs numpy's IEEE f32 division differ by at most 1 ulp."""
        u = np.arange(256, dtype=np.uint8)
        host = u.astype(np.float32) / np.float32(255.0)
        dev = np.asarray(jax.jit(_as_unit)(u))
        ulp = np.abs(host.view(np.uint32).astype(np.int64)
                     - dev.view(np.uint32).astype(np.int64))
        assert ulp.max() <= 1
        assert np.asarray(jax.jit(_as_unit)(host)).dtype == np.float32

    def test_syncnet_step_uint8_matches_f32(self, sync_vars):
        """One training step on a uint8 batch vs the pre-divided f32 batch:
        loss and updated params agree to float32 noise (the ≤1-ulp input
        delta above, carried through conv/BN)."""
        r = np.random.default_rng(7)
        B = 8
        mel = r.standard_normal((B, 80, 16, 1)).astype(np.float32)
        faces_u8 = r.integers(0, 256, (B, 48, 96, 15), dtype=np.uint8)
        y = (r.random((B, 1)) > 0.5).astype(np.float32)
        faces_f32 = faces_u8.astype(np.float32) / 255.0

        tx = optax.adam(1e-3)
        train_step, eval_step = make_syncnet_steps(tx)
        s_u8, m_u8 = train_step(TrainState.create(sync_vars, tx),
                                mel, faces_u8, y)
        s_f, m_f = train_step(TrainState.create(sync_vars, tx),
                              mel, faces_f32, y)
        np.testing.assert_allclose(float(m_u8["loss"]), float(m_f["loss"]),
                                   rtol=1e-5)
        # Adam's first step is ~lr*sign(g): near-zero-gradient coordinates
        # amplify ulp-level gradient noise up to the full step size, so
        # post-step params agree to within 2*lr, not to f32 noise (the loss
        # and eval assertions above/below cover forward-path agreement).
        for a, b in zip(jax.tree.leaves(s_u8.params),
                        jax.tree.leaves(s_f.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2.1e-3)
        # forward-only agreement on ONE state (the post-step states differ
        # by the Adam amplification above, so compare inputs, not states)
        np.testing.assert_allclose(
            float(eval_step(s_u8, mel, faces_u8, y)["loss"]),
            float(eval_step(s_u8, mel, faces_f32, y)["loss"]), rtol=1e-5)

    def test_wav2lip_uint8_batch_traces(self, sync_vars):
        """uint8 x/gt trace through the wav2lip train step (eval_shape: no
        CPU compile) with f32 generated frames out — the dtype contract the
        real loader now exercises."""
        import functools

        from wav2lip_tpu.models import Wav2LipGenerator

        B, T, S = 2, 5, 96
        r = np.random.default_rng(8)
        batch = {
            "x": r.integers(0, 256, (B, T, S, S, 6), dtype=np.uint8),
            "indiv_mels": r.standard_normal(
                (B, T, 80, 16, 1)).astype(np.float32),
            "mel": r.standard_normal((B, 80, 16)).astype(np.float32),
            "gt": r.integers(0, 256, (B, T, S, S, 3), dtype=np.uint8),
        }
        tx = optax.adam(1e-4)
        gvars = jax.eval_shape(
            Wav2LipGenerator().init, jax.random.key(0),
            jax.ShapeDtypeStruct((1, T, 80, 16, 1), np.float32),
            jax.ShapeDtypeStruct((1, T, S, S, 6), np.float32),
        )
        state = TrainState.create(gvars, tx)
        train_step, _ = make_wav2lip_steps(tx)
        _, metrics, g = jax.eval_shape(
            functools.partial(train_step, use_sync=True),
            state, sync_vars, batch, np.float32(0.01),
        )
        assert g.shape == (B, T, S, S, 3) and g.dtype == np.float32
        assert set(metrics) == {"loss", "l1", "sync"}


class TestWav2LipStep:
    def test_step_no_sync(self, mesh2, w2l_batch, sync_vars):
        tx = optax.adam(1e-4)
        train_step, eval_step = make_wav2lip_steps(tx, mesh=mesh2)
        from wav2lip_tpu.models import Wav2LipGenerator

        gvars = jax.jit(Wav2LipGenerator().init)(
            jax.random.key(1),
            np.zeros((1, 5, 80, 16, 1), np.float32),
            np.zeros((1, 5, 96, 96, 6), np.float32),
        )
        state = TrainState.create(gvars, tx)
        batch = shard_batch(mesh2, w2l_batch)

        state2, m, g = train_step(state, sync_vars, batch,
                                  np.float32(0.0), use_sync=False)
        assert np.isfinite(float(m["loss"]))
        assert float(m["sync"]) == 0.0
        assert g.shape == (2, 5, 96, 96, 3)
        # with wt=0, loss == l1
        assert float(m["loss"]) == pytest.approx(float(m["l1"]), rel=1e-6)

        state3, m2, _ = train_step(state2, sync_vars, batch,
                                   np.float32(0.01), use_sync=True)
        assert np.isfinite(float(m2["sync"])) and float(m2["sync"]) > 0
        assert float(m2["loss"]) == pytest.approx(
            0.01 * float(m2["sync"]) + 0.99 * float(m2["l1"]), rel=1e-5
        )

        em = eval_step(state3, sync_vars, batch)
        assert np.isfinite(float(em["sync"]))


class TestGANStep:
    def test_full_gan_step(self, mesh2, w2l_batch, sync_vars):
        from wav2lip_tpu.models import Wav2LipGenerator, QualityDiscriminator

        gen_tx = optax.adam(1e-4, b1=0.5)
        disc_tx = optax.adam(1e-4, b1=0.5)
        train_step, eval_step = make_gan_steps(gen_tx, disc_tx, mesh=mesh2)
        gvars = jax.jit(Wav2LipGenerator().init)(
            jax.random.key(2),
            np.zeros((1, 5, 80, 16, 1), np.float32),
            np.zeros((1, 5, 96, 96, 6), np.float32),
        )
        dvars = jax.jit(QualityDiscriminator().init)(
            jax.random.key(3), np.zeros((1, 5, 96, 96, 3), np.float32)
        )
        gs = TrainState.create(gvars, gen_tx)
        ds = TrainState.create(dvars, disc_tx)
        batch = shard_batch(mesh2, w2l_batch)

        # snapshot params host-side (donation-safe pattern; see above)
        gp0 = jax.tree.map(np.asarray, gs.params)
        dp0 = jax.tree.map(np.asarray, ds.params)
        gs2, ds2, m = train_step(gs, ds, sync_vars, batch,
                                 np.float32(0.03), np.float32(0.07),
                                 use_sync=True)
        for k in ("gen_loss", "l1", "sync", "percep", "disc_real", "disc_fake"):
            assert np.isfinite(float(m[k])), k
        assert tree_l2_diff(gp0, gs2.params) > 0
        assert tree_l2_diff(dp0, ds2.params) > 0

        em = eval_step(gs2, ds2, sync_vars, batch)
        assert np.isfinite(float(em["percep"]))


class TestCheckpointRoundtrip:
    def test_save_restore(self, tmp_path, sync_vars):
        from wav2lip_tpu.train import checkpoint as ckpt

        tx = optax.adam(1e-4)
        state = TrainState.create(sync_vars, tx)
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "global_step": 7,
            "global_epoch": 1,
        }
        path = ckpt.save_checkpoint(str(tmp_path), 7, payload)
        assert os.path.isdir(path)
        assert ckpt.latest_checkpoint(str(tmp_path)) == path

        restored = ckpt.load_orbax(path)
        assert int(restored["global_step"]) == 7
        np.testing.assert_allclose(
            jax.tree.leaves(restored["params"])[0],
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    def test_load_model_variables_orbax(self, tmp_path, sync_vars):
        from wav2lip_tpu.train import checkpoint as ckpt

        path = ckpt.save_checkpoint(
            str(tmp_path), 1,
            {"params": sync_vars["params"],
             "batch_stats": sync_vars["batch_stats"],
             "opt_state": None, "global_step": 1, "global_epoch": 0},
        )
        out = ckpt.load_model_variables(path, importer=None)
        assert "params" in out and "batch_stats" in out


class TestTrainerResume:
    def test_resume_then_step(self, tmp_path, sync_batch, mesh1):
        """Optimizer state must restore against the live-state template so a
        train step AFTER load() works — Orbax without a template returns
        optax namedtuples as dicts and tx.update crashes (round-1 advisor
        high-severity finding)."""
        import optax as _optax

        from wav2lip_tpu.train import checkpoint as ckpt
        from wav2lip_tpu.train.trainers import SyncNetTrainer

        mel, faces, y = sync_batch
        t1 = SyncNetTrainer(rng_seed=0, mesh=mesh1)
        t1.state, _ = t1.train_step(t1.state, *t1._shard((mel, faces, y)))
        t1.global_step, t1.global_epoch = 1, 2
        t1.save(str(tmp_path))
        path = ckpt.latest_checkpoint(str(tmp_path))

        t2 = SyncNetTrainer(rng_seed=99, mesh=mesh1)
        t2.load(path)  # reset_optimizer=False: opt_state must round-trip
        assert (t2.global_step, t2.global_epoch) == (1, 2)
        # restored opt_state keeps the optax pytree structure (adam mu/nu)
        assert jax.tree.structure(t2.state.opt_state) == jax.tree.structure(
            t1.state.opt_state
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(t2.state.opt_state)[1]),
            np.asarray(jax.tree.leaves(t1.state.opt_state)[1]),
        )
        # the regression: this crashed in tx.update before the fix
        t2.state, m = t2.train_step(t2.state, *t2._shard((mel, faces, y)))
        assert np.isfinite(float(m["loss"]))

    def test_reset_optimizer_load(self, tmp_path, sync_batch, mesh1):
        """reset_optimizer=True loads params only (frozen-expert semantics,
        wav2lip_train.py:365) and must work without a structure template."""
        from wav2lip_tpu.train import checkpoint as ckpt
        from wav2lip_tpu.train.trainers import SyncNetTrainer

        mel, faces, y = sync_batch
        t1 = SyncNetTrainer(rng_seed=0, mesh=mesh1)
        t1.save(str(tmp_path))
        t2 = SyncNetTrainer(rng_seed=1, mesh=mesh1)
        fresh_opt = t2.state.opt_state
        t2.load(ckpt.latest_checkpoint(str(tmp_path)), reset_optimizer=True,
                overwrite_global_states=False)
        assert t2.state.opt_state is fresh_opt
        t2.state, m = t2.train_step(t2.state, *t2._shard((mel, faces, y)))
        assert np.isfinite(float(m["loss"]))


class TestTrainerLoop:
    def test_fit_metrics_epochs(self, tmp_path, sync_batch, mesh1):
        """fit() writes JSONL metrics into the checkpoint dir and counts
        epochs via steps_per_epoch (reference global_epoch,
        wav2lip_train.py:299-304)."""
        import itertools
        import json

        from wav2lip_tpu.train.trainers import SyncNetTrainer

        mel, faces, y = sync_batch
        t = SyncNetTrainer(rng_seed=0, mesh=mesh1)
        it = itertools.repeat((faces, mel, y))  # fit expects (faces, mel, y)
        t.fit(iter(it), None, str(tmp_path), max_steps=3, steps_per_epoch=2)
        assert t.global_step == 3
        assert t.global_epoch == 1  # one full 2-step pass completed
        log_path = tmp_path / "train_log.jsonl"
        assert log_path.exists()
        recs = [json.loads(ln) for ln in log_path.read_text().splitlines()]
        assert any(r["prefix"] == "train" and r["step"] == 1 for r in recs)

    def test_fit_console_heartbeat(self, tmp_path, sync_batch, mesh1):
        """fit() announces entry and then prints rate-limited progress lines
        (the reference's live signal is a tqdm running-loss bar,
        wav2lip_train.py:209; ours is the JSONL series plus this console
        heartbeat — without it a step-1 stall is undiagnosable)."""
        import itertools

        from wav2lip_tpu.train.trainers import SyncNetTrainer

        mel, faces, y = sync_batch
        lines = []
        t = SyncNetTrainer(rng_seed=0, mesh=mesh1, log_fn=lines.append)
        t.heartbeat_s = 0.0  # beat every step
        it = itertools.repeat((faces, mel, y))
        t.fit(iter(it), None, str(tmp_path), max_steps=3)
        assert any("fit: step 0 -> 3" in ln for ln in lines)
        beats = [ln for ln in lines if "steps/s" in ln]
        assert len(beats) == 3 and "compile + warmup" in beats[0]
        # the compile tag belongs to the fit's first step ONLY
        assert all("compile + warmup" not in b for b in beats[1:])
        assert "loss=" in beats[-1]


class TestWav2LipTrainerLoop:
    def test_gan_fit_loop_plumbing(self, tmp_path, sync_vars, mesh1):
        """Drives Wav2LipTrainer(gan=True).fit end-to-end over real uint8
        loader batches with the two jitted step programs stubbed (their
        numerics are covered by TestGANStep; a cold GAN-step compile is
        minutes on this host): checkpoint cadence, uint8 sample-collage
        dumps, curriculum trigger on eval sync, and counters."""
        import itertools
        import types

        from wav2lip_tpu.train.trainers import Wav2LipTrainer

        B, T, S = 2, 5, 96
        r = np.random.default_rng(11)
        batch = {
            "x": r.integers(0, 256, (B, T, S, S, 6), dtype=np.uint8),
            "indiv_mels": r.standard_normal(
                (B, T, 80, 16, 1)).astype(np.float32),
            "mel": r.standard_normal((B, 80, 16)).astype(np.float32),
            "gt": r.integers(0, 256, (B, T, S, S, 3), dtype=np.uint8),
        }
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            train=dataclasses.replace(
                DEFAULT_CONFIG.train, checkpoint_interval=2,
                eval_interval=2, eval_steps_gan=1),
        )
        t = Wav2LipTrainer(sync_vars, config=cfg, mesh=mesh1, gan=True,
                           log_fn=lambda *a, **k: None)

        g_fake = np.zeros((B, T, S, S, 3), np.float32)
        t.train_step = types.SimpleNamespace(
            gen_step=lambda gs, dp, sv, b, wt, dwt, use_sync: (
                gs, {"loss": 1.0, "l1": 0.5, "sync": 0.0}, g_fake),
            disc_step=lambda ds, gt, g: (ds, {"disc_real": 0.6,
                                              "disc_fake": 0.7}),
        )
        # eval sync below the 0.75 threshold must flip syncnet_wt to 0.03
        # (hq_wav2lip_train.py:289-290)
        t.eval_step = lambda gs, ds, sv, b: {"loss": 1.0, "l1": 0.5,
                                             "sync": 0.2, "disc_real": 0.6,
                                             "disc_fake": 0.7}
        assert t.syncnet_wt == 0.0
        it = itertools.repeat(batch)
        t.fit(iter(it), iter(it), str(tmp_path), max_steps=3,
              dump_samples=True, steps_per_epoch=2)
        assert t.global_step == 3 and t.global_epoch == 1
        assert t.syncnet_wt == 0.03  # curriculum fired from stubbed eval
        # checkpoint cadence: step 1 (always), 2 (interval), 3 (max_steps);
        # GAN mode writes generator + disc_ pairs
        names = sorted(os.listdir(tmp_path))
        for s in (1, 2, 3):
            assert f"checkpoint_step{s:09d}" in names
            assert f"disc_checkpoint_step{s:09d}" in names
        # sample collages dumped from the uint8 host batch at checkpoints
        dumps = [n for n in names if n.startswith("samples_step")]
        assert dumps
        for d in dumps:
            assert any(f.endswith(".jpg")
                       for f in os.listdir(tmp_path / d))


class TestShardBatch:
    def test_warns_on_indivisible_batch(self, mesh):
        """A batch not divisible by the mesh silently replicated 8x work in
        round 1; now it must warn."""
        with pytest.warns(UserWarning, match="not\\s+divisible"):
            shard_batch(mesh, np.zeros((3, 4), np.float32))

    def test_divisible_batch_sharded_quietly(self, mesh):
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            out = shard_batch(mesh, np.zeros((8, 4), np.float32))
        assert out.sharding.is_fully_replicated is False

    def test_global_batch_from_local(self, mesh):
        """Multi-host input sharding entry point: process-local data →
        data-axis-sharded global array (single-process it must equal the
        plain shard)."""
        from wav2lip_tpu.parallel import global_batch_from_local

        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        out = global_batch_from_local(mesh, {"x": x})["x"]
        assert out.shape == (8, 3)
        assert not out.sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(out), x)

    def test_local_batch_size(self, monkeypatch):
        from wav2lip_tpu.parallel import local_batch_size
        import wav2lip_tpu.parallel.distributed as dist

        assert local_batch_size(16) == 16  # single process
        # fake a 4-process world for the slicing arithmetic
        monkeypatch.setattr(dist.jax, "process_count", lambda: 4)
        assert local_batch_size(16) == 4
        with pytest.raises(ValueError):
            local_batch_size(6)


class TestCurriculum:
    def test_trigger_semantics(self):
        """syncnet_wt flips to 0.01 (plain) / 0.03 (GAN) when eval sync < 0.75
        (wav2lip_train.py:253-254, hq_wav2lip_train.py:289-290)."""
        tcfg = DEFAULT_CONFIG.train
        assert tcfg.syncnet_wt == 0.0
        assert tcfg.sync_loss_curriculum_threshold == 0.75
        assert tcfg.syncnet_wt_after_trigger == 0.01
        assert tcfg.disc_wt == 0.07
        assert tcfg.gan_adam_b1 == 0.5
