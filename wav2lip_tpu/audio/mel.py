"""Mel-spectrogram audio frontend.

Re-implements the reference's librosa-based DSP chain (reference: audio.py:45-51)
from first principles — pre-emphasis → centered STFT (reflect padding, periodic
Hann) → Slaney-scale mel filterbank → amp-to-dB with a −100 dB floor → symmetric
normalization clipped to ±4 — with two interchangeable backends:

* a NumPy host path (``MelFrontend.melspectrogram``) used by data pipelines and
  as the numerical reference, and
* a JAX path (``MelFrontend.melspectrogram_jax``) that is jittable, batched, and
  runs the whole chain on device so inference never round-trips audio through
  the host after load.

Output convention matches the reference: ``(num_mels, T)`` float32 with
``T = 1 + len(wav) // hop_size``; 80 mel frames per second at the default
16 kHz / hop 200, i.e. 3.2 mel frames per 25 fps video frame.

librosa semantics reproduced (librosa 0.7, as pinned by the reference's
requirements.txt): ``stft(center=True, pad_mode='reflect', window='hann')``
with a periodic (fftbins) Hann window, and ``filters.mel`` with the Slaney
mel scale and Slaney area normalization (htk=False, norm=1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.config import AudioConfig, DEFAULT_AUDIO

# ---------------------------------------------------------------------------
# Slaney mel scale (librosa htk=False default)
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0           # linear region: 66.67 Hz per mel
_MIN_LOG_HZ = 1000.0          # switch to log scale above 1 kHz
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    mels = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freqs = mels * _F_SP
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(
        log_region,
        _MIN_LOG_HZ * np.exp(_LOGSTEP * (mels - _MIN_LOG_MEL)),
        freqs,
    )
    return freqs


def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Triangular mel filterbank, Slaney scale + Slaney (area) normalization.

    Equivalent to ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` with
    default htk=False, norm=1 (reference: audio.py:98-101). Shape
    ``(n_mels, 1 + n_fft // 2)``.
    """
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter has unit area on the Hz axis.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def periodic_hann(win_size: int) -> np.ndarray:
    """Periodic ("fftbins") Hann window, as scipy.signal.get_window('hann', N)
    returns for librosa's default stft window."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


# ---------------------------------------------------------------------------
# Host (NumPy) path
# ---------------------------------------------------------------------------


def _preemphasis_np(wav: np.ndarray, k: float) -> np.ndarray:
    # y[n] = x[n] - k * x[n-1], y[0] = x[0]  (reference: audio.py:20-23 via
    # scipy.signal.lfilter([1, -k], [1], wav))
    out = np.empty_like(wav, dtype=np.float64)
    out[0] = wav[0]
    out[1:] = wav[1:] - k * wav[:-1]
    return out


def _stft_magnitude_np(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Centered magnitude STFT, shape (1 + n_fft//2, 1 + len(y)//hop)."""
    pad = cfg.n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    window = periodic_hann(cfg.win_size).astype(np.float64)
    if cfg.win_size < cfg.n_fft:  # center-pad window to n_fft
        lpad = (cfg.n_fft - cfg.win_size) // 2
        window = np.pad(window, (lpad, cfg.n_fft - cfg.win_size - lpad))
    num_frames = 1 + (len(y) - cfg.n_fft) // cfg.hop_size
    idx = (
        np.arange(num_frames)[:, None] * cfg.hop_size
        + np.arange(cfg.n_fft)[None, :]
    )
    frames = y[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    return np.abs(spec).T  # (freq, time)


def _amp_to_db_np(x: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    min_level = np.exp(cfg.min_level_db / 20.0 * np.log(10.0))
    return 20.0 * np.log10(np.maximum(min_level, x))


def _normalize_np(S: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    # Both reference branches (audio.py:110-122): symmetric_mels=True maps
    # to [-max_abs, max_abs] (the default), False to [0, max_abs].
    m = cfg.max_abs_value
    frac = (S - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_mels:
        scaled = (2.0 * m) * frac - m
        lo = -m
    else:
        scaled = m * frac
        lo = 0.0
    if cfg.allow_clipping_in_normalization:
        scaled = np.clip(scaled, lo, m)
    return scaled


def _denormalize_np(D: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    # inverse of both branches (audio.py:124-136)
    m = cfg.max_abs_value
    if cfg.symmetric_mels:
        D = np.clip(D, -m, m) if cfg.allow_clipping_in_normalization else D
        return ((D + m) * -cfg.min_level_db / (2.0 * m)) + cfg.min_level_db
    D = np.clip(D, 0, m) if cfg.allow_clipping_in_normalization else D
    return (D * -cfg.min_level_db / m) + cfg.min_level_db


# ---------------------------------------------------------------------------
# JAX path (jittable, batched)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "num_frames"))
def _frame_jax(y, n_fft: int, hop: int, num_frames: int):
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[..., idx]


class MelFrontend:
    """Stateless mel frontend bound to an AudioConfig.

    The mel basis and window are computed once at construction (the reference
    caches the basis in a module global, audio.py:90-96).
    """

    def __init__(self, cfg: AudioConfig = DEFAULT_AUDIO):
        self.cfg = cfg
        self.mel_basis = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax
        )
        self.window = periodic_hann(cfg.win_size)
        self._mel_basis_j = jnp.asarray(self.mel_basis)
        # the device path multiplies (.., n_fft) frames, so center-pad the
        # window up front when win_size < n_fft (the host path pads inside
        # _stft_magnitude_np; librosa's util.pad_center semantics)
        window_full = self.window
        if cfg.win_size < cfg.n_fft:
            lpad = (cfg.n_fft - cfg.win_size) // 2
            window_full = np.pad(
                window_full, (lpad, cfg.n_fft - cfg.win_size - lpad)
            )
        self._window_j = jnp.asarray(window_full)

    # -- host --------------------------------------------------------------

    def num_mel_frames(self, num_samples: int) -> int:
        return 1 + num_samples // self.cfg.hop_size

    def melspectrogram(self, wav: np.ndarray) -> np.ndarray:
        """(num_samples,) float waveform → (num_mels, T) float32 mel."""
        cfg = self.cfg
        y = np.asarray(wav, dtype=np.float64)
        if cfg.preemphasize:
            y = _preemphasis_np(y, cfg.preemphasis)
        mag = _stft_magnitude_np(y, cfg)
        mel = self.mel_basis.astype(np.float64) @ mag
        S = _amp_to_db_np(mel, cfg) - cfg.ref_level_db
        if cfg.signal_normalization:
            S = _normalize_np(S, cfg)
        return S.astype(np.float32)

    def linearspectrogram(self, wav: np.ndarray) -> np.ndarray:
        """(num_samples,) → (1 + n_fft//2, T) normalized linear spectrogram
        (reference: audio.py:37-43)."""
        cfg = self.cfg
        y = np.asarray(wav, dtype=np.float64)
        if cfg.preemphasize:
            y = _preemphasis_np(y, cfg.preemphasis)
        mag = _stft_magnitude_np(y, cfg)
        S = _amp_to_db_np(mag, cfg) - cfg.ref_level_db
        if cfg.signal_normalization:
            S = _normalize_np(S, cfg)
        return S.astype(np.float32)

    def denormalize(self, D: np.ndarray) -> np.ndarray:
        return _denormalize_np(D, self.cfg)

    # -- device ------------------------------------------------------------

    def melspectrogram_jax(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Jittable mel chain. ``wav``: (..., num_samples) → (..., num_mels, T).

        Static shapes: T is determined by the (static) sample count. The whole
        chain — pre-emphasis, framing, windowed rFFT, mel matmul (MXU), dB and
        normalization — fuses into one XLA computation.
        """
        cfg = self.cfg
        y = jnp.asarray(wav, dtype=jnp.float32)
        if cfg.preemphasize:
            y = jnp.concatenate(
                [y[..., :1], y[..., 1:] - cfg.preemphasis * y[..., :-1]], axis=-1
            )
        pad = cfg.n_fft // 2
        pad_widths = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, pad_widths, mode="reflect")
        num_frames = 1 + (y.shape[-1] - cfg.n_fft) // cfg.hop_size
        frames = _frame_jax(y, cfg.n_fft, cfg.hop_size, num_frames)
        frames = frames * self._window_j
        mag = jnp.abs(jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1))
        # (..., T, freq) @ (freq, mels) → (..., T, mels); runs on the MXU.
        mel = jnp.einsum(
            "...tf,mf->...mt", mag, self._mel_basis_j,
            preferred_element_type=jnp.float32,
        )
        min_level = jnp.exp(cfg.min_level_db / 20.0 * jnp.log(10.0))
        S = 20.0 * jnp.log10(jnp.maximum(min_level, mel)) - cfg.ref_level_db
        if cfg.signal_normalization:
            m = cfg.max_abs_value
            frac = (S - cfg.min_level_db) / (-cfg.min_level_db)
            if cfg.symmetric_mels:
                S, lo = (2.0 * m) * frac - m, -m
            else:
                S, lo = m * frac, 0.0
            if cfg.allow_clipping_in_normalization:
                S = jnp.clip(S, lo, m)
        return S


# ---------------------------------------------------------------------------
# Module-level convenience API mirroring the reference's audio.py surface
# ---------------------------------------------------------------------------

_default_frontend: Optional[MelFrontend] = None


def _frontend() -> MelFrontend:
    global _default_frontend
    if _default_frontend is None:
        _default_frontend = MelFrontend(DEFAULT_AUDIO)
    return _default_frontend


def melspectrogram(wav: np.ndarray) -> np.ndarray:
    """(num_samples,) → (80, T) normalized mel (reference: audio.py:45-51)."""
    return _frontend().melspectrogram(wav)


def load_wav(path: str, sr: int = 16000) -> np.ndarray:
    """Load audio as float32 in [-1, 1] at sample rate ``sr``.

    Matches the contract of ``librosa.core.load(path, sr)[0]`` (reference:
    audio.py:9-10): mono mixdown and resampling to ``sr``. Resampling uses
    polyphase filtering (scipy), which differs from librosa's kaiser_best
    resampler by a small numerical tolerance.
    """
    import scipy.io.wavfile as wavfile
    import scipy.signal

    file_sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    if file_sr != sr:
        g = np.gcd(int(file_sr), int(sr))
        wav = scipy.signal.resample_poly(wav, sr // g, file_sr // g).astype(
            np.float32
        )
    return wav


def save_wav(wav: np.ndarray, path: str, sr: int = 16000) -> None:
    """Peak-normalize to int16 and write (reference: audio.py:12-15)."""
    import scipy.io.wavfile as wavfile

    wav = np.asarray(wav, dtype=np.float32)
    wav = wav * (32767.0 / max(0.01, float(np.max(np.abs(wav)))))
    wavfile.write(path, sr, wav.astype(np.int16))
