"""Independent re-derivation of the librosa-0.7 mel chain, used as a
cross-check oracle for ``wav2lip_tpu.audio.mel``.

librosa itself is not installable in this environment, so this module
re-derives the exact semantics the reference pins (librosa==0.7 via
requirements.txt:1, called from audio.py:45-51) from librosa 0.7's
*documented* behavior — it is written independently of
``wav2lip_tpu/audio/mel.py`` (explicit per-filter loops, scipy's own
``get_window``/``lfilter`` operators) so that agreement between the two is
evidence of correctness rather than of shared code:

* ``stft(y, n_fft, hop_length, win_length, window='hann', center=True,
  pad_mode='reflect')``: frame t covers ``y_padded[t*hop : t*hop+n_fft]``
  after reflect-padding by ``n_fft//2``, windowed by the periodic Hann
  window (``scipy.signal.get_window('hann', n, fftbins=True)``), then rfft.
* ``filters.mel(sr, n_fft, n_mels, fmin, fmax)`` with defaults htk=False,
  norm=1: triangular filters with edges at ``n_mels + 2`` points uniformly
  spaced on the Slaney mel scale (linear below 1 kHz at 200/3 Hz per mel,
  logarithmic above with a factor of 6.4 per 27 mels), each filter scaled by
  ``2 / (f_upper - f_lower)`` (Slaney area normalization).
* the reference's own pre-emphasis operator is scipy's
  ``lfilter([1, -k], [1], wav)`` (audio.py:20-23) — used verbatim here since
  scipy IS available.

Provenance: semantics transcribed from the librosa 0.7 documentation and the
ISC-licensed librosa reference manual's parameter defaults; no librosa source
code is copied.
"""

import numpy as np
import scipy.signal


def slaney_hz_to_mel(f: float) -> float:
    """Scalar Slaney-scale Hz→mel (librosa 0.7 hz_to_mel, htk=False)."""
    f_sp = 200.0 / 3.0
    if f < 1000.0:
        return f / f_sp
    min_log_mel = 1000.0 / f_sp
    logstep = np.log(6.4) / 27.0
    return min_log_mel + np.log(f / 1000.0) / logstep


def slaney_mel_to_hz(m: float) -> float:
    """Scalar Slaney-scale mel→Hz."""
    f_sp = 200.0 / 3.0
    min_log_mel = 1000.0 / f_sp
    if m < min_log_mel:
        return m * f_sp
    logstep = np.log(6.4) / 27.0
    return 1000.0 * np.exp(logstep * (m - min_log_mel))


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular filterbank, built filter by filter
    with explicit slopes (NOT the vectorized ramps formulation)."""
    n_bins = 1 + n_fft // 2
    fftfreqs = np.arange(n_bins) * (sr / n_fft)
    mel_lo, mel_hi = slaney_hz_to_mel(fmin), slaney_hz_to_mel(fmax)
    edges_hz = [
        slaney_mel_to_hz(mel_lo + (mel_hi - mel_lo) * i / (n_mels + 1))
        for i in range(n_mels + 2)
    ]
    weights = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = edges_hz[m], edges_hz[m + 1], edges_hz[m + 2]
        for k, fk in enumerate(fftfreqs):
            up = (fk - lo) / (mid - lo)
            down = (hi - fk) / (hi - mid)
            weights[m, k] = max(0.0, min(up, down))
        weights[m] *= 2.0 / (hi - lo)  # Slaney area normalization
    return weights


def stft_magnitude(y: np.ndarray, n_fft: int, hop: int,
                   win_length: int) -> np.ndarray:
    """|stft| with librosa 0.7 center=True/reflect semantics, one frame at a
    time. Shape (1 + n_fft//2, n_frames)."""
    window = scipy.signal.get_window("hann", win_length, fftbins=True)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    yp = np.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop
    cols = []
    for t in range(n_frames):
        frame = yp[t * hop : t * hop + n_fft] * window
        cols.append(np.abs(np.fft.rfft(frame, n=n_fft)))
    return np.stack(cols, axis=1)


def melspectrogram(wav: np.ndarray, *, sr=16000, n_fft=800, hop=200,
                   win_length=800, n_mels=80, fmin=55.0, fmax=7600.0,
                   preemphasis=0.97, ref_level_db=20.0, min_level_db=-100.0,
                   max_abs=4.0) -> np.ndarray:
    """The full reference chain (audio.py:45-51) over the independent
    pieces above: preemphasis (scipy.lfilter — the reference's own
    operator) → |STFT| → mel → amp_to_db → symmetric normalize."""
    y = scipy.signal.lfilter([1.0, -preemphasis], [1.0], wav)
    S = mel_filterbank(sr, n_fft, n_mels, fmin, fmax) @ stft_magnitude(
        y, n_fft, hop, win_length
    )
    min_level = np.exp(min_level_db / 20.0 * np.log(10.0))
    D = 20.0 * np.log10(np.maximum(min_level, S)) - ref_level_db
    v = (2.0 * max_abs) * ((D - min_level_db) / (-min_level_db)) - max_abs
    return np.clip(v, -max_abs, max_abs)
