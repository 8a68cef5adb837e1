"""Fused Pallas mel kernel vs the NumPy reference chain.

The kernel runs in interpret mode on the CPU-hosted suite (the real Mosaic
lowering is exercised on TPU); numerics are float32 DFT-by-matmul against
the float64 np.fft host path, so tolerances are absolute on the normalized
(±4-clipped) output.
"""

import numpy as np
import pytest

from wav2lip_tpu.audio import MelFrontend
from wav2lip_tpu.audio.mel_pallas import PallasMelFrontend
from wav2lip_tpu.config import DEFAULT_AUDIO


@pytest.fixture(scope="module")
def frontends():
    return MelFrontend(DEFAULT_AUDIO), PallasMelFrontend(
        DEFAULT_AUDIO, interpret=True
    )


def _wav(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * DEFAULT_AUDIO.sample_rate)
    t = np.arange(n) / DEFAULT_AUDIO.sample_rate
    return (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1500 * t + 0.7)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


class TestPallasMel:
    def test_matches_numpy_reference(self, frontends):
        host, fused = frontends
        wav = _wav(1.3)
        ref = host.melspectrogram(wav)
        out = np.asarray(fused(wav))
        assert out.shape == ref.shape  # (80, T), T = 1 + len//hop
        assert np.max(np.abs(out - ref)) < 2e-2
        # mel frames/sec contract: 80 frames per second of audio
        assert ref.shape[1] == 1 + len(wav) // DEFAULT_AUDIO.hop_size

    def test_non_tile_multiple_frame_count(self, frontends):
        """T not a multiple of the 128-frame grid tile: the padded tail must
        be sliced away, not leak into the output."""
        host, fused = frontends
        wav = _wav(0.31, seed=3)  # T = 25 frames, far from a tile boundary
        ref = host.melspectrogram(wav)
        out = np.asarray(fused(wav))
        assert out.shape == ref.shape
        assert np.max(np.abs(out - ref)) < 2e-2

    def test_golden_drift(self, frontends):
        """Pinned against the repo's mel golden vectors (drift detectors for
        trained-checkpoint compatibility, same set the host path asserts)."""
        import os

        path = os.path.join(os.path.dirname(__file__), "golden",
                            "mel_golden.npz")
        data = np.load(path)
        _, fused = frontends
        names = sorted(set(
            k[len("wav_"):] for k in data.files if k.startswith("wav_")
        ))
        assert names
        for name in names:
            out = np.asarray(fused(data[f"wav_{name}"]))
            ref = data[f"mel_{name}"]
            assert out.shape == ref.shape
            assert np.max(np.abs(out - ref)) < 2e-2, name
