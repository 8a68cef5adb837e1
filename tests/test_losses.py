"""Loss function tests, cross-checked against torch where it defines the
semantics (BCELoss clamping, cosine-similarity BCE)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wav2lip_tpu.train.losses import (
    bce,
    cosine_bce_loss,
    fold_lower_half_for_syncnet,
    l1_loss,
)


class TestBCE:
    def test_matches_torch_bceloss(self):
        torch = pytest.importorskip("torch")
        r = np.random.default_rng(0)
        p = r.uniform(0.01, 0.99, (16, 1)).astype(np.float32)
        t = (r.random((16, 1)) > 0.5).astype(np.float32)
        ref = torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t))
        got = bce(jnp.asarray(p), jnp.asarray(t))
        assert float(got) == pytest.approx(float(ref), rel=1e-5)

    def test_extreme_predictions_finite(self):
        # torch clamps log at -100; exact 0/1 predictions stay finite
        p = jnp.asarray([[0.0], [1.0]])
        t = jnp.asarray([[1.0], [0.0]])
        assert np.isfinite(float(bce(p, t)))
        assert float(bce(p, t)) == pytest.approx(100.0, rel=1e-3)

    def test_gradient_matches_torch_backward(self):
        """ATen clamps the backward denominator at 1e-12 (grad bounded at
        ~1e12); the naive autodiff grad 1/pred overflows float32 to inf for
        tiny predictions — one ReLU-collapsed embedding (cosine ~0 on a
        positive pair) then poisons Adam's moments and the whole run goes
        NaN (observed in the round-5 expert calibration at step ~550)."""
        import jax

        torch = pytest.importorskip("torch")
        p = np.asarray([[0.0], [3e-40], [1e-12], [0.3], [1.0]], np.float32)
        t = np.ones_like(p)
        got = jax.grad(lambda q: bce(q, jnp.asarray(t)))(jnp.asarray(p))
        got = np.asarray(got)
        assert np.isfinite(got).all(), got
        tp = torch.from_numpy(p).requires_grad_(True)
        torch.nn.BCELoss()(tp, torch.from_numpy(t)).backward()
        np.testing.assert_allclose(got, tp.grad.numpy(), rtol=1e-4)


class TestCosineBCE:
    def test_matches_torch_composition(self):
        torch = pytest.importorskip("torch")
        r = np.random.default_rng(1)
        # ReLU-tower-like embeddings: non-negative, then L2 normalized
        a = np.abs(r.standard_normal((8, 512))).astype(np.float32)
        v = np.abs(r.standard_normal((8, 512))).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        y = (r.random((8, 1)) > 0.5).astype(np.float32)

        ta, tv, ty = map(torch.from_numpy, (a, v, y))
        d = torch.nn.functional.cosine_similarity(ta, tv)
        ref = torch.nn.BCELoss()(d.unsqueeze(1), ty)
        got = cosine_bce_loss(jnp.asarray(a), jnp.asarray(v), jnp.asarray(y))
        assert float(got) == pytest.approx(float(ref), rel=1e-4)


class TestFoldLowerHalf:
    def test_matches_torch_fold(self):
        """Our NHWC fold must equal the reference's NCHW fold
        (wav2lip_train.py:192-198: lower half then cat over T on channels)."""
        torch = pytest.importorskip("torch")
        r = np.random.default_rng(2)
        g_nchw = r.random((2, 3, 5, 96, 96)).astype(np.float32)  # (B,C,T,H,W)

        tg = torch.from_numpy(g_nchw)
        tg = tg[:, :, :, tg.size(3) // 2 :]
        ref = torch.cat([tg[:, :, i] for i in range(5)], dim=1).numpy()

        g_nhwc = np.transpose(g_nchw, (0, 2, 3, 4, 1))  # (B,T,H,W,C)
        got = np.asarray(fold_lower_half_for_syncnet(jnp.asarray(g_nhwc)))
        got_nchw = np.transpose(got, (0, 3, 1, 2))
        np.testing.assert_allclose(got_nchw, ref, atol=1e-6)


class TestL1:
    def test_basic(self):
        a = jnp.asarray([[1.0, 2.0]])
        b = jnp.asarray([[0.0, 4.0]])
        assert float(l1_loss(a, b)) == pytest.approx(1.5)
