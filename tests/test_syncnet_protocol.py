"""Protocol-faithful LSE path: MFCC frontend, external-SyncNet tower parity
vs a torch replica, checkpoint import, and the distance-curve statistic vs a
transliteration of SyncNetInstance_calc_scores.py:19-31,131-137."""

import math
import os

import numpy as np
import pytest

from wav2lip_tpu.eval.syncnet_protocol import (
    ProtocolSyncNet,
    SyncNetPythonScorer,
    distance_curve_scores,
    import_syncnet_python_checkpoint,
    mfcc,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mfcc_golden.npz")


# ---------------------------------------------------------------------------
# MFCC frontend
# ---------------------------------------------------------------------------


def _test_signal(seconds=1.0, sr=16000, seed=3):
    r = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = 8000 * np.sin(2 * np.pi * 220 * t) + 500 * r.standard_normal(len(t))
    return sig.astype(np.int16)


def test_mfcc_shape_and_frame_count():
    sr = 16000
    sig = _test_signal(1.0, sr)
    out = mfcc(sig, sr)
    # python_speech_features framing: 1 + ceil((N - 400) / 160) frames
    want = 1 + math.ceil((len(sig) - 400) / 160)
    assert out.shape == (want, 13)
    assert np.isfinite(out).all()
    # ~100 frames/sec => 4 MFCC frames per 25fps video frame
    assert abs(want - 100) <= 2


def test_mfcc_c0_is_log_energy():
    """appendEnergy=True replaces c0 with the log of the total frame power
    (python_speech_features default the reference relies on,
    SyncNetInstance_calc_scores.py:86-87)."""
    sr = 16000
    sig = _test_signal(0.5, sr)
    out = mfcc(sig, sr)
    # recompute frame 0's energy independently: power spectrum of the
    # pre-emphasized first 400 samples
    pre = np.append(sig[:1].astype(np.float64),
                    sig[1:400].astype(np.float64)
                    - 0.97 * sig[:399].astype(np.float64))
    pspec = np.abs(np.fft.rfft(pre, 512)) ** 2 / 512
    assert out[0, 0] == pytest.approx(np.log(pspec.sum()), rel=1e-10)


def test_mfcc_scale_invariance_is_absent():
    """The protocol feeds raw int16 samples — amplitude matters (no
    normalization anywhere in the reference path)."""
    sig = _test_signal(0.3)
    a = mfcc(sig)
    b = mfcc(sig.astype(np.float64) / 32768.0)
    assert not np.allclose(a, b)


def test_mfcc_golden_drift():
    """Drift detector: frozen output of this implementation (committed
    golden). librosa/python_speech_features are not installable in this
    environment, so cross-library parity is documented as a gap in
    docs/DESIGN.md; this pins the implementation against silent drift."""
    sig = _test_signal(0.5)
    out = mfcc(sig)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, mfcc=out)
        pytest.skip("golden written; rerun to compare")
    want = np.load(GOLDEN)["mfcc"]
    np.testing.assert_allclose(out, want, atol=1e-8)


# ---------------------------------------------------------------------------
# torch replica of the external SyncNet (public syncnet_python architecture)
# ---------------------------------------------------------------------------


def _torch_replica():
    """The S module of joonson/syncnet_python, rebuilt for parity testing
    (the reference's eval scripts import it from that external repo,
    SyncNetInstance_calc_scores.py:13)."""
    import torch.nn as tnn

    class S(tnn.Module):
        def __init__(self, out_dim=1024):
            super().__init__()
            self.netcnnaud = tnn.Sequential(
                tnn.Conv2d(1, 64, 3, 1, 1), tnn.BatchNorm2d(64), tnn.ReLU(),
                tnn.MaxPool2d((1, 1), (1, 1)),
                tnn.Conv2d(64, 192, 3, 1, 1), tnn.BatchNorm2d(192),
                tnn.ReLU(), tnn.MaxPool2d((3, 3), (1, 2)),
                tnn.Conv2d(192, 384, 3, 1, 1), tnn.BatchNorm2d(384),
                tnn.ReLU(),
                tnn.Conv2d(384, 256, 3, 1, 1), tnn.BatchNorm2d(256),
                tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, 1, 1), tnn.BatchNorm2d(256),
                tnn.ReLU(), tnn.MaxPool2d((3, 3), (2, 2)),
                tnn.Conv2d(256, 512, (5, 4), 1, 0), tnn.BatchNorm2d(512),
                tnn.ReLU(),
            )
            self.netfcaud = tnn.Sequential(
                tnn.Linear(512, 512), tnn.BatchNorm1d(512), tnn.ReLU(),
                tnn.Linear(512, out_dim),
            )
            self.netcnnlip = tnn.Sequential(
                tnn.Conv3d(3, 96, (5, 7, 7), (1, 2, 2), 0),
                tnn.BatchNorm3d(96), tnn.ReLU(),
                tnn.MaxPool3d((1, 3, 3), (1, 2, 2)),
                tnn.Conv3d(96, 256, (1, 5, 5), (1, 2, 2), (0, 1, 1)),
                tnn.BatchNorm3d(256), tnn.ReLU(),
                tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
                tnn.Conv3d(256, 256, (1, 3, 3), 1, (0, 1, 1)),
                tnn.BatchNorm3d(256), tnn.ReLU(),
                tnn.Conv3d(256, 256, (1, 3, 3), 1, (0, 1, 1)),
                tnn.BatchNorm3d(256), tnn.ReLU(),
                tnn.Conv3d(256, 256, (1, 3, 3), 1, (0, 1, 1)),
                tnn.BatchNorm3d(256), tnn.ReLU(),
                tnn.MaxPool3d((1, 3, 3), (1, 2, 2)),
                tnn.Conv3d(256, 512, (1, 6, 6), 1, 0),
                tnn.BatchNorm3d(512), tnn.ReLU(),
            )
            self.netfclip = tnn.Sequential(
                tnn.Linear(512, 512), tnn.BatchNorm1d(512), tnn.ReLU(),
                tnn.Linear(512, out_dim),
            )

        def forward_aud(self, x):
            mid = self.netcnnaud(x)
            return self.netfcaud(mid.view(mid.size(0), -1))

        def forward_lip(self, x):
            mid = self.netcnnlip(x)
            return self.netfclip(mid.view(mid.size(0), -1))

    return S()


@pytest.fixture(scope="module")
def imported_replica(tmp_path_factory):
    """Random-weight torch replica saved in the published .model format
    (a plain state_dict, SyncNetInstance_calc_scores.py:203-210) then
    imported."""
    import torch

    torch.manual_seed(0)
    net = _torch_replica()
    # randomize BN running stats so eval-mode normalization is non-trivial
    for m in net.modules():
        if hasattr(m, "running_mean"):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    net.eval()
    path = str(tmp_path_factory.mktemp("ckpt") / "syncnet_test.model")
    torch.save(net.state_dict(), path)
    variables = import_syncnet_python_checkpoint(path)
    return net, variables


def test_import_and_tower_parity(imported_replica):
    import torch

    net, variables = imported_replica
    model = ProtocolSyncNet()
    rng = np.random.default_rng(0)

    mfcc_win = rng.standard_normal((2, 13, 20, 1)).astype(np.float32) * 3
    frames = (rng.random((2, 5, 224, 224, 3)) * 255).astype(np.float32)

    a_jax, v_jax = model.apply(variables, mfcc_win, frames)

    with torch.no_grad():
        a_t = net.forward_aud(
            torch.from_numpy(np.transpose(mfcc_win, (0, 3, 1, 2)))
        ).numpy()
        v_t = net.forward_lip(
            torch.from_numpy(np.transpose(frames, (0, 4, 1, 2, 3)))
        ).numpy()

    np.testing.assert_allclose(np.asarray(a_jax), a_t, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v_jax), v_t, atol=2e-3, rtol=1e-4)


def test_import_rejects_shape_mismatch(tmp_path):
    import torch

    net = _torch_replica()
    sd = net.state_dict()
    sd["netfcaud.3.weight"] = torch.zeros(7, 512)  # wrong out_dim
    path = str(tmp_path / "bad.model")
    torch.save(sd, path)
    with pytest.raises(ValueError, match="mismatch"):
        import_syncnet_python_checkpoint(path)


# ---------------------------------------------------------------------------
# Distance-curve statistic vs torch transliteration
# ---------------------------------------------------------------------------


def test_distance_curve_vs_torch_transliteration():
    """distance_curve_scores == the reference's calc_pdist + offset logic
    (SyncNetInstance_calc_scores.py:19-31,131-137), including pairwise
    distance's additive eps."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    n, d, vshift = 23, 32, 15
    v_feat = rng.standard_normal((n, d)).astype(np.float32)
    a_feat = rng.standard_normal((n, d)).astype(np.float32)

    # transliteration (feat1 = video tower, feat2 = audio tower)
    feat1 = torch.from_numpy(v_feat)
    feat2p = F.pad(torch.from_numpy(a_feat), (0, 0, vshift, vshift))
    win = 2 * vshift + 1
    dists = [
        F.pairwise_distance(feat1[[i], :].repeat(win, 1),
                            feat2p[i : i + win, :])
        for i in range(n)
    ]
    mdist = torch.mean(torch.stack(dists, 1), 1)
    minval, minidx = torch.min(mdist, 0)
    want_d = float(minval)
    want_c = float(torch.median(mdist) - minval)
    want_off = int(vshift - int(minidx))

    got = distance_curve_scores(v_feat, a_feat, vshift, eps=1e-6)
    assert got.lse_d == pytest.approx(want_d, rel=1e-5)
    assert got.lse_c == pytest.approx(want_c, rel=1e-5)
    assert got.av_offset == want_off


# ---------------------------------------------------------------------------
# End-to-end scorer on synthetic media
# ---------------------------------------------------------------------------


def test_scorer_end_to_end_synthetic():
    """Window plan matches the reference exactly: min(frames, samples//640)-5
    windows (SyncNetInstance_calc_scores.py:99-117), scores finite."""
    import jax

    from fixtures import synth_face_frame

    model = ProtocolSyncNet()
    variables = jax.jit(model.init)(
        jax.random.key(0),
        np.zeros((1, 13, 20, 1), np.float32),
        np.zeros((1, 5, 224, 224, 3), np.float32),
    )
    scorer = SyncNetPythonScorer(variables, vshift=5, batch_size=8)

    frames = [synth_face_frame(64, 64, t) for t in range(12)]
    audio = _test_signal(1.0)  # 16000 samples -> 25 frame-equivalents

    m_wins, f_wins = scorer._windows(frames, audio)
    assert len(m_wins) == min(12, 16000 // 640) - 5  # = 7
    assert f_wins.shape == (7, 5, 224, 224, 3)
    assert m_wins.shape == (7, 13, 20, 1)

    r = scorer.score_arrays(frames, audio)
    assert np.isfinite(r.lse_d) and np.isfinite(r.lse_c)
    assert -5 <= r.av_offset <= 5
