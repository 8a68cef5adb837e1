"""Fused Pallas TPU kernel for the mel-spectrogram frontend.

One kernel computes the whole chain of the reference's ``melspectrogram``
(reference audio.py:45-51) — windowing, STFT, mel projection, amp→dB,
symmetric normalization — in a single pass through VMEM:

* the rFFT becomes two MXU matmuls against precomputed DFT basis matrices
  (frames @ cos, frames @ sin). At n_fft=800 that is a (128, 800) x (800,
  512) matmul per tile — exactly the systolic array's shape regime, and far
  more MXU-friendly than a radix FFT's scalar butterflies;
* the overlapped framing (hop 200, window 800) happens IN the kernel:
  ``frames @ W`` decomposes as ``Σ_j rows[t+j] @ W[j·hop:(j+1)·hop]`` over
  the (T, hop)-reshaped waveform, so each grid step issues ``r`` aligned
  (TILE, hop) loads feeding ``r`` MXU matmuls — no 4x-duplicated frame
  tensor ever exists in HBM (and no sublane-offset concat, which Mosaic
  cannot lower);
* frequency bins are zero-padded 401 → 512 lanes; the padded bins carry
  |0 + 0i| = 0 magnitude and zero mel-basis weight, so the math is identical
  and every matmul stays lane-aligned;
* window multiply, magnitude, mel matmul, the dB floor and the ±4 clip all
  fuse into the same VMEM-resident tile — the waveform is read from HBM once
  and only the (T, n_mels) mel comes back.

Numerics: float32 end-to-end. The DFT-by-matmul differs from the host
``np.fft.rfft`` float64 path by ~1e-4 relative in magnitude, which after the
dB/normalize squashing lands within ~1e-2 absolute of the NumPy reference
(asserted by tests/test_mel_pallas.py against golden vectors). The host path
(audio/mel.py) remains the numerical reference; this kernel is the
throughput path for on-device audio.

Preemphasis and the centered reflect pad are data layout, not compute — they
run as (fused) jnp ops before the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wav2lip_tpu.audio.mel import mel_filterbank, periodic_hann
from wav2lip_tpu.config import AudioConfig, DEFAULT_AUDIO

TILE = 128      # output mel frames per grid step
F_PAD = 512     # frequency bins padded to a lane multiple (401 real bins)


def _dft_matrices(n_fft: int, f_pad: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_fft, f_pad) cosine/sine rDFT bases, zero beyond 1 + n_fft//2."""
    n_bins = 1 + n_fft // 2
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_bins, dtype=np.float64)[None, :]
    theta = 2.0 * np.pi * k * f / n_fft
    cos = np.zeros((n_fft, f_pad), np.float32)
    sin = np.zeros((n_fft, f_pad), np.float32)
    cos[:, :n_bins] = np.cos(theta)
    sin[:, :n_bins] = np.sin(theta)
    return cos, sin


def _mel_kernel(*refs, tile: int, r: int, min_level: float,
                ref_level_db: float, min_level_db: float, max_abs: float,
                normalize: bool, symmetric: bool, clip: bool):
    y_refs = refs[:r]          # r blocked (tile, hop) row-shifted streams
    win_ref, cos_ref, sin_ref, mel_ref, out_ref = refs[r:]
    hop = win_ref.shape[1]
    f_pad = cos_ref.shape[1]
    # frame t spans rows t .. t+r-1 of the (T, hop)-reshaped waveform, so
    # frames @ W decomposes as Σ_j rows[t+j] @ W[j*hop:(j+1)*hop]: each
    # addend reads its own shifted stream as a normal aligned block (Mosaic
    # supports neither sublane-offset concats nor non-8-aligned dynamic
    # sublane loads, so the shifts live in the BlockSpec streams instead)
    re = jnp.zeros((tile, f_pad), jnp.float32)
    im = jnp.zeros((tile, f_pad), jnp.float32)
    for j in range(r):  # r = 4: unrolled
        segw = y_refs[j][:] * win_ref[j : j + 1, :]         # window chunk
        # precision=HIGHEST: the MXU's default f32 path truncates inputs
        # to bf16, which costs ~0.25 absolute on the normalized mel; the
        # 3-pass f32 emulation is exact to ~1e-5 and the FLOPs are trivial
        re = re + jnp.dot(segw, cos_ref[j * hop : (j + 1) * hop, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        im = im + jnp.dot(segw, sin_ref[j * hop : (j + 1) * hop, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)              # (tile, F_PAD)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    S = 20.0 * (jnp.log(jnp.maximum(min_level, mel)) / np.log(10.0))
    S = S - ref_level_db
    if normalize:
        frac = (S - min_level_db) / (-min_level_db)
        if symmetric:  # audio.py:110-122 branches
            S = (2.0 * max_abs) * frac - max_abs
            if clip:  # allow_clipping_in_normalization, like the host path
                S = jnp.clip(S, -max_abs, max_abs)
        else:
            S = max_abs * frac
            if clip:
                S = jnp.clip(S, 0.0, max_abs)
    out_ref[:] = S


@functools.partial(
    jax.jit,
    static_argnames=("blocks", "hop", "n_fft", "cfg", "interpret"),
)
def _fused_mel(y_rows, window, cos_m, sin_m, mel_m, blocks: int,
               hop: int, n_fft: int, cfg: AudioConfig, interpret: bool):
    """Returns the PADDED (blocks*TILE, n_mels) mel; the caller slices to
    the true frame count OUTSIDE the jit — keying the trace on the exact
    length would compile one executable per distinct audio duration instead
    of one per 128-frame bucket."""
    import jax.experimental.pallas as pl

    r = n_fft // hop
    n_mels = mel_m.shape[1]
    t_pad = blocks * TILE
    min_level = float(np.exp(cfg.min_level_db / 20.0 * np.log(10.0)))

    # r row-shifted views of the waveform rows; shift j feeds the j-th
    # window/DFT chunk. Plain XLA slices — each streams through its own
    # grid-blocked (auto double-buffered) BlockSpec below.
    y_shifts = tuple(y_rows[j : j + t_pad] for j in range(r))

    kernel = functools.partial(
        _mel_kernel,
        tile=TILE,
        r=r,
        min_level=min_level,
        ref_level_db=float(cfg.ref_level_db),
        min_level_db=float(cfg.min_level_db),
        max_abs=float(cfg.max_abs_value),
        normalize=bool(cfg.signal_normalization),
        symmetric=bool(cfg.symmetric_mels),
        clip=bool(cfg.allow_clipping_in_normalization),
    )
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((TILE, hop), lambda i: (i, 0))] * r + [
            pl.BlockSpec(window.shape, lambda i: (0, 0)),
            pl.BlockSpec(cos_m.shape, lambda i: (0, 0)),
            pl.BlockSpec(sin_m.shape, lambda i: (0, 0)),
            pl.BlockSpec(mel_m.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, n_mels), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_mels), jnp.float32),
        interpret=interpret,
    )(*y_shifts, window, cos_m, sin_m, mel_m)
    return out


class PallasMelFrontend:
    """Device mel frontend running the fused kernel.

    Drop-in for ``MelFrontend.melspectrogram`` on TPU: ``__call__`` takes a
    float waveform and returns the (num_mels, T) normalized mel. Constant
    operands (window, DFT bases, mel basis) are built once and kept on
    device. ``interpret=True`` runs the kernel in Pallas interpret mode for
    CPU-hosted tests.
    """

    def __init__(self, cfg: AudioConfig = DEFAULT_AUDIO,
                 interpret: Optional[bool] = None):
        if cfg.n_fft % cfg.hop_size != 0:
            raise ValueError("fused mel kernel needs hop | n_fft")
        if cfg.win_size != cfg.n_fft:
            raise ValueError("fused mel kernel assumes win_size == n_fft")
        if 1 + cfg.n_fft // 2 > F_PAD:
            raise ValueError(
                f"fused mel kernel's lane padding holds {F_PAD} frequency "
                f"bins; n_fft={cfg.n_fft} needs {1 + cfg.n_fft // 2} — raise "
                f"mel_pallas.F_PAD (multiple of 128) or use the host path"
            )
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        window = periodic_hann(cfg.win_size).astype(np.float32)
        r = cfg.n_fft // cfg.hop_size
        self._window = jnp.asarray(window.reshape(r, cfg.hop_size))
        cos_m, sin_m = _dft_matrices(cfg.n_fft, F_PAD)
        self._cos = jnp.asarray(cos_m)
        self._sin = jnp.asarray(sin_m)
        basis = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax
        )  # (n_mels, 401)
        mel_pad = np.zeros((F_PAD, cfg.num_mels), np.float32)
        mel_pad[: basis.shape[1], :] = basis.T
        self._mel = jnp.asarray(mel_pad)

    def __call__(self, wav) -> jnp.ndarray:
        """(num_samples,) float waveform → (num_mels, T) float32 mel."""
        cfg = self.cfg
        y = jnp.asarray(wav, jnp.float32)
        if cfg.preemphasize:
            y = jnp.concatenate(
                [y[:1], y[1:] - cfg.preemphasis * y[:-1]]
            )
        pad = cfg.n_fft // 2
        y = jnp.pad(y, (pad, pad), mode="reflect")
        hop = cfg.hop_size
        num_frames = 1 + (y.shape[0] - cfg.n_fft) // hop
        r = cfg.n_fft // hop
        blocks = (num_frames + TILE - 1) // TILE
        rows_needed = blocks * TILE + r - 1
        total = rows_needed * hop
        y = jnp.pad(y, (0, max(0, total - y.shape[0])))[:total]
        y_rows = y.reshape(rows_needed, hop)
        out = _fused_mel(
            y_rows, self._window, self._cos, self._sin, self._mel,
            blocks=blocks, hop=hop, n_fft=cfg.n_fft, cfg=cfg,
            interpret=self.interpret,
        )
        return out[:num_frames].T  # (num_mels, T)
