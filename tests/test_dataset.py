"""Training input pipeline tests over synthetic preprocessed data."""

import os
from os.path import join

import numpy as np
import pytest

from fixtures import make_preprocessed_dataset, write_filelists
from wav2lip_tpu.data.dataset import (
    PrefetchLoader,
    WindowSampler,
    get_video_list,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prep"))
    dirs = make_preprocessed_dataset(root, num_videos=3, frames_per_video=40)
    return root, dirs


class TestFilelists:
    def test_get_video_list(self, tmp_path, dataset):
        root, dirs = dataset
        fl = str(tmp_path / "filelists")
        write_filelists(fl, ["spk0/vid0", "spk0/vid1 extra_field"])
        vids = get_video_list(root, "train", fl)
        assert vids == [join(root, "spk0/vid0"), join(root, "spk0/vid1")]


class TestSyncnetSampling:
    def test_sample_shapes_and_range(self, dataset):
        root, dirs = dataset
        s = WindowSampler(dirs, seed=0)
        faces, mel, y = s.sample_syncnet()
        assert faces.shape == (48, 96, 15)
        assert mel.shape == (80, 16)
        assert y.shape == (1,)
        # pixels ship as uint8; the jitted steps cast to f32/255 on device
        assert faces.dtype == np.uint8
        assert y[0] in (0.0, 1.0)

    def test_labels_both_classes(self, dataset):
        root, dirs = dataset
        s = WindowSampler(dirs, seed=1)
        ys = {float(s.sample_syncnet()[2][0]) for _ in range(20)}
        assert ys == {0.0, 1.0}

    def test_deterministic_given_seed(self, dataset):
        root, dirs = dataset
        a = WindowSampler(dirs, seed=7).sample_syncnet()
        b = WindowSampler(dirs, seed=7).sample_syncnet()
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestWav2LipSampling:
    def test_sample_contract(self, dataset):
        root, dirs = dataset
        s = WindowSampler(dirs, seed=2)
        b = s.sample_wav2lip()
        assert b["x"].shape == (5, 96, 96, 6)
        assert b["indiv_mels"].shape == (5, 80, 16, 1)
        assert b["mel"].shape == (80, 16)
        assert b["gt"].shape == (5, 96, 96, 3)
        # pixels ship as uint8 (device casts to f32/255); mels stay f32
        assert b["x"].dtype == np.uint8 and b["gt"].dtype == np.uint8
        assert b["mel"].dtype == np.float32
        # masked channels: lower half of first 3 channels must be zero
        assert np.all(b["x"][:, 48:, :, :3] == 0)
        # upper half of masked == upper half of gt
        np.testing.assert_array_equal(b["x"][:, :48, :, :3], b["gt"][:, :48])

    def test_short_video_rejected(self, tmp_path):
        # a video with <= 3*T frames must never be sampled
        root = str(tmp_path)
        dirs = make_preprocessed_dataset(root, num_videos=2,
                                         frames_per_video=40)
        import cv2
        from fixtures import synth_face_frame, make_wav

        short = join(root, "spk0", "short")
        os.makedirs(short)
        for i in range(10):
            cv2.imwrite(join(short, f"{i}.jpg"), synth_face_frame(64, 64, i))
        make_wav(join(short, "audio.wav"), seconds=0.5)
        s = WindowSampler(dirs + [short], seed=3)
        for _ in range(10):
            s.sample_wav2lip()  # must not hang or crash


class TestPrefetchLoader:
    def test_batches(self, dataset):
        root, dirs = dataset
        s = WindowSampler(dirs, seed=4)
        loader = PrefetchLoader(s.sample_syncnet, batch_size=4, num_workers=2)
        try:
            faces, mel, y = next(iter(loader))
            assert faces.shape == (4, 48, 96, 15)
            assert mel.shape == (4, 80, 16)
            assert y.shape == (4, 1)
        finally:
            loader.close()

    def test_dict_batches(self, dataset):
        root, dirs = dataset
        s = WindowSampler(dirs, seed=5)
        loader = PrefetchLoader(s.sample_wav2lip, batch_size=2, num_workers=1)
        try:
            b = next(iter(loader))
            assert b["x"].shape == (2, 5, 96, 96, 6)
            assert b["gt"].shape == (2, 5, 96, 96, 3)
        finally:
            loader.close()


class TestUnusableDatasetFailsLoudly:
    """The reference resamples forever (wav2lip_train.py:112-127); on a
    broken setup — filelist entries that don't exist under data_root, or
    all-too-short videos — that is a silent 100% CPU spin with no output
    (it cost two 45-minute timed-out trainer drives before this guard).
    The sampler must raise with a diagnostic instead."""

    def test_nonexistent_video_dirs_raise(self):
        s = WindowSampler(["/nonexistent/a", "/nonexistent/b"], seed=0)
        with pytest.raises(RuntimeError, match="unusable.*frame counts"):
            s.sample_wav2lip()

    def test_raises_through_prefetch_loader(self):
        from wav2lip_tpu.data.dataset import PrefetchLoader

        s = WindowSampler(["/nonexistent/only"], seed=0)
        loader = PrefetchLoader(s.sample_syncnet, batch_size=2,
                                num_workers=1)
        try:
            with pytest.raises(RuntimeError, match="worker failed") as ei:
                next(iter(loader))
            assert "unusable" in str(ei.value.__cause__)
        finally:
            loader.close()

    def test_successes_reset_the_counter(self, dataset):
        """Only CONSECUTIVE rejections count: a usable dataset must sample
        far past the limit without tripping, even with the limit floored."""
        root, dirs = dataset
        s = WindowSampler(dirs, seed=6)
        s._reject_limit = 8  # make any leak across successes visible
        for _ in range(64):
            s.sample_wav2lip()
        assert s._rejects < 8


class TestLoaderTrainerIntegration:
    def test_syncnet_loader_feeds_trainer(self, dataset, tmp_path):
        """The data pipeline's (faces, mel(80,16), y) tuples must drive a
        real SyncNetTrainer step — the mel channel-dim contract between
        sampler and jitted step is exactly what unit fixtures (which build
        4-D mels by hand) never exercised, and it shipped broken once."""
        import jax

        from wav2lip_tpu.data.dataset import PrefetchLoader
        from wav2lip_tpu.parallel import make_mesh
        from wav2lip_tpu.train.trainers import SyncNetTrainer

        root, dirs = dataset
        sampler = WindowSampler(dirs, seed=3)
        loader = PrefetchLoader(sampler.sample_syncnet, batch_size=8,
                                num_workers=0)
        try:
            t = SyncNetTrainer(mesh=make_mesh(jax.devices()[:1]), rng_seed=0)
            out = t.fit(iter(loader), None, str(tmp_path / "ck"), max_steps=1)
            assert np.isfinite(out["loss"])
            assert t.global_step == 1
        finally:
            loader.close()

    def test_wav2lip_sampler_shapes_trace_through_step(self, dataset):
        """Trace (not compile) one Wav2Lip train step on a REAL sampler
        batch: catches sampler↔step rank/shape contract drift (like the
        3-D-mel SyncNet bug) in seconds, without the multi-minute CPU
        compile a real step would cost."""
        import functools

        import jax
        import optax

        from wav2lip_tpu.models import SyncNet, Wav2LipGenerator
        from wav2lip_tpu.train.state import TrainState
        from wav2lip_tpu.train.steps import make_wav2lip_steps

        root, dirs = dataset
        sampler = WindowSampler(dirs, seed=5)
        samples = [sampler.sample_wav2lip() for _ in range(2)]
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}

        T, S = 5, 96
        tx = optax.adam(1e-4)
        key = jax.random.key(0)
        gvars = jax.eval_shape(
            Wav2LipGenerator().init, key,
            jax.ShapeDtypeStruct((1, T, 80, 16, 1), np.float32),
            jax.ShapeDtypeStruct((1, T, S, S, 6), np.float32),
        )
        svars = jax.eval_shape(
            SyncNet().init, key,
            jax.ShapeDtypeStruct((1, 80, 16, 1), np.float32),
            jax.ShapeDtypeStruct((1, S // 2, S, 3 * T), np.float32),
        )
        state = TrainState.create(gvars, tx)
        train_step, _ = make_wav2lip_steps(tx)
        out = jax.eval_shape(
            functools.partial(train_step, use_sync=True),
            state, svars, batch, np.float32(0.01),
        )
        new_state, metrics, g = out
        assert g.shape == (2, T, S, S, 3)
        assert set(metrics) == {"loss", "l1", "sync"}
