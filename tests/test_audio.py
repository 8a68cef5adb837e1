"""Mel frontend tests.

The reference pins librosa 0.7; librosa is not available here, so parity is
established structurally: the STFT is cross-checked against torch.stft (an
independent implementation of the same centered/reflect/Hann convention), the
pre-emphasis filter against scipy.signal.lfilter (exactly what the reference
calls), and the Slaney mel filterbank against its defining properties. The JAX
device path must match the NumPy host path to float32 tolerance.
"""

import numpy as np
import pytest

from wav2lip_tpu.audio.mel import (
    MelFrontend,
    hz_to_mel,
    mel_to_hz,
    mel_filterbank,
    periodic_hann,
    load_wav,
    save_wav,
)
from wav2lip_tpu.config import AudioConfig


@pytest.fixture(scope="module")
def frontend():
    return MelFrontend(AudioConfig())


def make_wav(n=16000, seed=0):
    r = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    wav = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 1330 * t)
        + 0.05 * r.standard_normal(n)
    )
    return wav.astype(np.float32)


class TestMelScale:
    def test_roundtrip(self):
        f = np.array([0.0, 55.0, 440.0, 999.0, 1000.0, 4000.0, 7600.0, 8000.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)

    def test_linear_below_1khz(self):
        np.testing.assert_allclose(hz_to_mel(200.0 / 3.0), 1.0, rtol=1e-12)
        np.testing.assert_allclose(hz_to_mel(500.0), 7.5, rtol=1e-12)

    def test_log_above_1khz(self):
        # 6.4x in frequency = 27 mels above the 1 kHz knee.
        np.testing.assert_allclose(
            hz_to_mel(6400.0) - hz_to_mel(1000.0), 27.0, rtol=1e-12
        )


class TestMelFilterbank:
    def test_shape_and_nonneg(self):
        fb = mel_filterbank(16000, 800, 80, 55.0, 7600.0)
        assert fb.shape == (80, 401)
        assert (fb >= 0).all()
        # every filter must have support
        assert (fb.sum(axis=1) > 0).all()

    def test_slaney_area_normalization(self):
        # With Slaney norm each triangle has height 2/(hz width); the sum over
        # fft bins times bin width approximates unit area.
        fb = mel_filterbank(16000, 800, 80, 55.0, 7600.0)
        bin_hz = (16000 / 2) / 400
        areas = fb.sum(axis=1) * bin_hz
        # triangles are sampled, so tolerance is loose for narrow low filters
        assert np.all(areas > 0.5) and np.all(areas < 1.5)

    def test_peak_positions_monotonic(self):
        fb = mel_filterbank(16000, 800, 80, 55.0, 7600.0)
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()
        fftfreqs = np.linspace(0, 8000, 401)
        assert fftfreqs[peaks[0]] > 40.0
        assert fftfreqs[peaks[-1]] < 7600.0


class TestPreemphasis:
    def test_matches_scipy_lfilter(self):
        import scipy.signal

        wav = make_wav()
        expected = scipy.signal.lfilter([1.0, -0.97], [1.0], wav)
        fe = MelFrontend(AudioConfig())
        from wav2lip_tpu.audio.mel import _preemphasis_np

        got = _preemphasis_np(wav.astype(np.float64), 0.97)
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9)


class TestSTFT:
    def test_matches_torch_stft(self):
        torch = pytest.importorskip("torch")
        from wav2lip_tpu.audio.mel import _stft_magnitude_np

        cfg = AudioConfig()
        wav = make_wav().astype(np.float64)
        got = _stft_magnitude_np(wav, cfg)

        window = torch.hann_window(800, periodic=True, dtype=torch.float64)
        ref = torch.stft(
            torch.from_numpy(wav),
            n_fft=800,
            hop_length=200,
            win_length=800,
            window=window,
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        ref_mag = ref.abs().numpy()
        assert got.shape == ref_mag.shape
        np.testing.assert_allclose(got, ref_mag, rtol=1e-4, atol=1e-6)

    def test_frame_count(self, frontend):
        # 80 mel frames per second: 1s of 16 kHz audio → 81 frames (centered).
        mel = frontend.melspectrogram(make_wav(16000))
        assert mel.shape == (80, 81)
        mel = frontend.melspectrogram(make_wav(32000))
        assert mel.shape == (80, 161)


class TestMelSpectrogram:
    def test_range_and_dtype(self, frontend):
        mel = frontend.melspectrogram(make_wav())
        assert mel.dtype == np.float32
        assert mel.min() >= -4.0 and mel.max() <= 4.0
        # a tonal signal must not be constant
        assert mel.std() > 0.1

    def test_silence_maps_to_floor(self, frontend):
        mel = frontend.melspectrogram(np.zeros(16000, dtype=np.float32))
        np.testing.assert_allclose(mel, -4.0, atol=1e-5)

    def test_jax_matches_numpy(self, frontend):
        wav = make_wav()
        ref = frontend.melspectrogram(wav)
        got = np.asarray(frontend.melspectrogram_jax(wav))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=8e-3)

    def test_jax_batched(self, frontend):
        wavs = np.stack([make_wav(seed=1), make_wav(seed=2)])
        got = np.asarray(frontend.melspectrogram_jax(wavs))
        assert got.shape == (2, 80, 81)
        for i in range(2):
            ref = frontend.melspectrogram(wavs[i])
            np.testing.assert_allclose(got[i], ref, atol=8e-3)

    def test_denormalize_roundtrip(self, frontend):
        wav = make_wav()
        mel = frontend.melspectrogram(wav)
        db = frontend.denormalize(mel)
        assert db.max() <= 0.0 + 1e-4
        assert db.min() >= -100.0 - 1e-4


class TestLibrosaRederivation:
    """Independent librosa-0.7 chain cross-check (SURVEY §7 'hard parts' #1,
    second line of evidence).

    ``tests/librosa_ref.py`` re-derives librosa 0.7's documented stft +
    filters.mel semantics with deliberately different code (scalar per-filter
    triangle loops, scipy's own get_window and lfilter) — agreement between
    that oracle and ``wav2lip_tpu.audio.mel`` bounds implementation drift in
    a way a same-code golden cannot.
    """

    def test_filterbank_matches_independent_derivation(self):
        import librosa_ref

        from wav2lip_tpu.audio.mel import mel_filterbank

        ours = mel_filterbank(16000, 800, 80, 55.0, 7600.0)
        oracle = librosa_ref.mel_filterbank(16000, 800, 80, 55.0, 7600.0)
        np.testing.assert_allclose(ours, oracle, atol=1e-6)

    def test_full_chain_matches_independent_derivation(self, frontend):
        import librosa_ref

        for seed, n in [(0, 16000), (1, 16123), (2, 5000)]:
            rng = np.random.default_rng(seed)
            wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
                   + 0.05 * rng.standard_normal(n)).astype(np.float32)
            ours = frontend.melspectrogram(wav)
            oracle = librosa_ref.melspectrogram(wav.astype(np.float64))
            assert ours.shape == oracle.shape
            np.testing.assert_allclose(ours, oracle, atol=2e-4)


class TestGoldenMelVectors:
    """Drift-detector golden vectors (SURVEY §7 'hard parts' #1).

    librosa (any version) is not installable in this environment, so these
    goldens are generated from THIS implementation (tests/golden/
    mel_golden.npz, 4 wav/mel pairs incl. odd lengths) — they pin today's
    numerics so any future refactor that shifts melspectrogram output is
    caught. Structural parity with librosa 0.7 semantics is covered by the
    torch.stft / scipy.lfilter / Slaney-property tests above and by the
    independent re-derivation oracle (TestLibrosaRederivation); the
    remaining librosa gap is documented in docs/DESIGN.md's deviation table.
    """

    @pytest.fixture(scope="class")
    def golden(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "golden",
                            "mel_golden.npz")
        return np.load(path)

    @pytest.mark.parametrize("name", ["tones", "chirp", "burst", "am"])
    def test_numpy_path_matches_golden(self, frontend, golden, name):
        mel = frontend.melspectrogram(golden[f"wav_{name}"])
        ref = golden[f"mel_{name}"]
        assert mel.shape == ref.shape
        np.testing.assert_allclose(mel, ref, atol=1e-4)

    @pytest.mark.parametrize("name", ["tones", "chirp", "burst", "am"])
    def test_jax_path_matches_golden(self, frontend, golden, name):
        mel = np.asarray(frontend.melspectrogram_jax(golden[f"wav_{name}"]))
        ref = golden[f"mel_{name}"]
        assert mel.shape == ref.shape
        # device path tolerance: float32 FFT vs float64 host path
        np.testing.assert_allclose(mel, ref, atol=8e-3)


class TestWavIO:
    def test_save_load_roundtrip(self, tmp_path):
        wav = make_wav()
        p = str(tmp_path / "a.wav")
        save_wav(wav, p, 16000)
        back = load_wav(p, 16000)
        assert back.dtype == np.float32
        assert len(back) == len(wav)
        # save_wav peak-normalizes; compare shapes after renormalizing
        np.testing.assert_allclose(
            back / np.abs(back).max(), wav / np.abs(wav).max(), atol=1e-3
        )

    def test_load_resamples(self, tmp_path):
        import scipy.io.wavfile as wavfile

        r = np.random.default_rng(3)
        wav48 = (r.standard_normal(48000) * 8000).astype(np.int16)
        p = str(tmp_path / "b.wav")
        wavfile.write(p, 48000, wav48)
        back = load_wav(p, 16000)
        assert abs(len(back) - 16000) <= 1

    def test_load_stereo_mixdown(self, tmp_path):
        import scipy.io.wavfile as wavfile

        r = np.random.default_rng(4)
        wav = (r.standard_normal((1600, 2)) * 8000).astype(np.int16)
        p = str(tmp_path / "c.wav")
        wavfile.write(p, 16000, wav)
        back = load_wav(p, 16000)
        assert back.shape == (1600,)


class TestConfigVariants:
    def test_asymmetric_mels_roundtrip(self):
        """symmetric_mels=False maps to [0, max_abs] (reference audio.py
        110-136's other branch) and denormalize inverts it."""
        import dataclasses

        from wav2lip_tpu.config import DEFAULT_AUDIO

        cfg = dataclasses.replace(DEFAULT_AUDIO, symmetric_mels=False)
        fe = MelFrontend(cfg)
        wav = make_wav(8000)
        S = fe.melspectrogram(wav)
        assert S.min() >= 0.0 and S.max() <= cfg.max_abs_value
        D = fe.denormalize(S)
        assert D.min() >= cfg.min_level_db - 1e-4
        # jax path agrees with the host path in this mode too
        Sj = np.asarray(fe.melspectrogram_jax(wav))
        assert np.max(np.abs(Sj - S)) < 5e-3

    def test_jax_path_win_smaller_than_nfft(self):
        """win_size < n_fft center-pads the window on the device path like
        the host path (used to raise a broadcast error)."""
        import dataclasses

        from wav2lip_tpu.config import DEFAULT_AUDIO

        cfg = dataclasses.replace(DEFAULT_AUDIO, win_size=400)
        fe = MelFrontend(cfg)
        wav = make_wav(6400)
        S = fe.melspectrogram(wav)
        Sj = np.asarray(fe.melspectrogram_jax(wav))
        assert Sj.shape == S.shape
        assert np.max(np.abs(Sj - S)) < 5e-3
