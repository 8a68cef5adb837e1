"""LSE scorer tests: the distance/confidence arithmetic on controlled
embeddings, and an end-to-end score of a synthetic clip."""

import numpy as np
import pytest

from fixtures import make_video, make_wav


def make_scorer(vshift=15):
    import jax

    from wav2lip_tpu.eval import LSEScorer
    from wav2lip_tpu.models import SyncNet

    sync_vars = jax.jit(SyncNet().init)(
        jax.random.key(0),
        np.zeros((1, 80, 16, 1), np.float32),
        np.zeros((1, 48, 96, 15), np.float32),
    )
    return LSEScorer(sync_vars, vshift=vshift, batch_size=16)


class TestScoreEmbeddings:
    def test_perfect_sync(self):
        """Identical audio/video embeddings → distance 0 at shift 0,
        offset 0, positive confidence."""
        scorer = make_scorer(vshift=5)
        r = np.random.default_rng(0)
        e = r.standard_normal((40, 64)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        res = scorer.score_embeddings(e.copy(), e.copy())
        assert res.lse_d == pytest.approx(0.0, abs=1e-5)
        assert res.av_offset == 0
        assert res.lse_c > 0.5

    def test_known_offset_detected(self):
        scorer = make_scorer(vshift=5)
        r = np.random.default_rng(1)
        a = r.standard_normal((43, 64)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        shift = 3
        v = np.roll(a, -shift, axis=0)  # video leads audio by `shift`
        res = scorer.score_embeddings(a, v)
        assert abs(res.av_offset) == shift

    def test_random_embeddings_low_confidence(self):
        scorer = make_scorer(vshift=5)
        r = np.random.default_rng(2)
        a = r.standard_normal((40, 64)).astype(np.float32)
        v = r.standard_normal((40, 64)).astype(np.float32)
        res = scorer.score_embeddings(a, v)
        assert res.lse_c < 0.5  # no real alignment signal


class TestScoreVideo:
    def test_end_to_end_synthetic(self, tmp_path):
        video = make_video(str(tmp_path / "v.mp4"), num_frames=40, fps=25.0,
                           w=96, h=96)
        wav = make_wav(str(tmp_path / "a.wav"), seconds=2.0)
        scorer = make_scorer(vshift=5)
        res = scorer.score_video(video, wav)
        assert np.isfinite(res.lse_d) and res.lse_d > 0
        assert np.isfinite(res.lse_c)
        assert -5 <= res.av_offset <= 5
