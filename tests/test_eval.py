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


def reference_lse(im_feat, cc_feat, vshift):
    """Direct numpy transliteration of the reference protocol: calc_pdist
    (SyncNetInstance_calc_scores.py:19-31) + offset/conf/minval
    (:131-137). Kept as an independent oracle — not shared with the
    implementation under test."""
    win = 2 * vshift + 1
    cc_p = np.pad(cc_feat, ((vshift, vshift), (0, 0)))
    dists = np.stack([
        np.sqrt(((im_feat[i] - cc_p[i : i + win]) ** 2).sum(axis=1))
        for i in range(len(im_feat))
    ])  # (N windows, win shifts)
    mdist = dists.mean(axis=0)
    minidx = int(mdist.argmin())
    minval = float(mdist[minidx])
    return minval, float(np.median(mdist) - minval), vshift - minidx


class TestReferenceProtocol:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_transliteration(self, seed):
        """score_embeddings must equal the reference statistic exactly:
        mean-over-windows curve FIRST, then min / median − min (min and mean
        do not commute; the round-1 implementation got this wrong)."""
        scorer = make_scorer(vshift=15)
        r = np.random.default_rng(seed)
        n, d = 47, 32
        a = r.standard_normal((n, d))
        v = r.standard_normal((n, d)) + 0.3 * np.roll(a, 2, axis=0)
        res = scorer.score_embeddings(a, v)
        ref_d, ref_c, ref_off = reference_lse(im_feat=v, cc_feat=a, vshift=15)
        assert res.lse_d == pytest.approx(ref_d, rel=1e-12)
        assert res.lse_c == pytest.approx(ref_c, rel=1e-12)
        assert res.av_offset == ref_off


class TestFrechetDistance:
    def test_identical_gaussians_zero(self):
        from wav2lip_tpu.eval import frechet_distance

        r = np.random.default_rng(0)
        mu = r.standard_normal(8)
        a = r.standard_normal((8, 8))
        sigma = a @ a.T + np.eye(8)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(
            0.0, abs=1e-6
        )

    def test_mean_shift_only(self):
        from wav2lip_tpu.eval import frechet_distance

        mu1, mu2 = np.zeros(4), np.full(4, 2.0)
        s = np.eye(4)
        # ||mu1-mu2||^2 = 16; covariance terms cancel
        assert frechet_distance(mu1, s, mu2, s) == pytest.approx(16.0,
                                                                 abs=1e-6)

    def test_univariate_closed_form(self):
        from wav2lip_tpu.eval import frechet_distance

        # 1-D: (m1-m2)^2 + (sqrt(v1)-sqrt(v2))^2
        got = frechet_distance([1.0], [[4.0]], [3.0], [[9.0]])
        assert got == pytest.approx((1 - 3) ** 2 + (2 - 3) ** 2, abs=1e-6)

    def test_statistics(self):
        from wav2lip_tpu.eval import compute_statistics

        r = np.random.default_rng(1)
        f = r.standard_normal((500, 6))
        mu, sigma = compute_statistics(f)
        np.testing.assert_allclose(mu, f.mean(axis=0))
        assert sigma.shape == (6, 6)


class TestFIDScorer:
    def test_pluggable_extractor_orders_similarity(self):
        """Same frames → FID 0; a shifted set scores worse. Uses a weight-free
        extractor (mean color) so the test needs no Inception checkpoint."""
        from wav2lip_tpu.eval import FIDScorer

        import jax.numpy as jnp

        scorer = FIDScorer(
            feature_fn=lambda x: jnp.mean(x, axis=(1, 2)),
            batch_size=8, input_size=32,
        )
        r = np.random.default_rng(2)
        a = r.integers(0, 200, (16, 32, 32, 3)).astype(np.uint8)
        same = scorer.score_frames(a, a.copy())
        shifted = scorer.score_frames(a, np.clip(a + 40, 0, 255))
        assert same == pytest.approx(0.0, abs=1e-6)
        assert shifted > same + 0.001

    def test_inception_architecture(self):
        """The FID InceptionV3 trunk initializes and emits 2048-d pool3
        features (pytorch-fid inception.py graph; weights imported
        separately via import_inception)."""
        import jax

        from wav2lip_tpu.eval import InceptionV3FID

        model = InceptionV3FID()
        variables = jax.jit(model.init)(
            jax.random.key(0), np.zeros((1, 96, 96, 3), np.float32)
        )
        out = jax.jit(model.apply)(
            variables, np.zeros((2, 96, 96, 3), np.float32)
        )
        assert out.shape == (2, 2048)
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
        )
        # trunk of torchvision/pytorch-fid inception_v3 without the fc head:
        # 23,834,568 total - 2,049,000 fc = 21,785,568
        assert n_params == 21_785_568, n_params

    def test_import_inception_key_mapping(self):
        """OIHW→HWIO + bn split for a synthetic pytorch-fid-style state
        dict slice."""
        from wav2lip_tpu.eval import import_inception

        sd = {
            "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
            "Conv2d_1a_3x3.bn.weight": np.ones(32, np.float32),
            "Conv2d_1a_3x3.bn.bias": np.zeros(32, np.float32),
            "Conv2d_1a_3x3.bn.running_mean": np.zeros(32, np.float32),
            "Conv2d_1a_3x3.bn.running_var": np.ones(32, np.float32),
            "fc.weight": np.zeros((1008, 2048), np.float32),  # dropped
        }
        v = import_inception(sd)
        assert v["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (
            3, 3, 3, 32
        )
        assert v["batch_stats"]["Conv2d_1a_3x3"]["bn"]["var"].shape == (32,)
        assert "fc" not in v["params"]


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
