"""Protocol-faithful LSE-D / LSE-C scoring via the external SyncNet.

The reference's published LSE numbers are produced by the pretrained SyncNet
of the external ``syncnet_python`` repo — a *different* model from the
Wav2Lip expert (evaluation/README.md:10-29; the eval scripts are copied into
that repo and import its ``SyncNetModel``,
SyncNetInstance_calc_scores.py:13). Its protocol
(SyncNetInstance_calc_scores.py:55-58,86-87,110-150):

* video → 224×224 BGR frames, raw 0-255 floats (no normalization);
* audio → 13-coefficient MFCCs at 100 frames/sec via python_speech_features
  defaults (25 ms window / 10 ms step / 26 filters / nfft 512 / lifter 22 /
  log-energy as c0), fed as a (13, 20) window advancing 4 MFCC frames per
  video frame;
* two towers (2D CNN over MFCC, 3D CNN over 5-frame RGB stacks) emitting
  UN-normalized 1024-d embeddings;
* distance curve over ±vshift frame offsets: mean-over-windows first, then
  LSE-D = min(curve), LSE-C = median(curve) − min(curve),
  offset = vshift − argmin (SyncNetInstance_calc_scores.py:131-137).

This module reimplements all four pieces TPU-natively (NHWC/NDHWC Flax
towers, numpy MFCC, batched jitted embedding) plus an importer for the
published ``syncnet_v2.model`` torch checkpoint, so LSE scores are
number-comparable to the paper's. The tower layer spec follows the public
``syncnet_python`` SyncNetModel (not vendored here); the importer is
sequence- and shape-driven and fails loudly on any mismatch with a real
checkpoint.

Everything is eval-only: BatchNorm uses imported running stats.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from wav2lip_tpu.eval.lse import LSEResult
from wav2lip_tpu.utils.cache import enable_compile_cache

# ---------------------------------------------------------------------------
# MFCC frontend — python_speech_features-default semantics
# (SyncNetInstance_calc_scores.py:86-87 calls python_speech_features.mfcc
# with all defaults on the int16 wav samples)
# ---------------------------------------------------------------------------


def _hz2mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def _mel2hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)


def _filterbanks(nfilt: int, nfft: int, samplerate: int,
                 lowfreq: float, highfreq: float) -> np.ndarray:
    """Triangular HTK-mel filterbank, (nfilt, nfft//2+1)."""
    melpoints = np.linspace(_hz2mel(lowfreq), _hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * _mel2hz(melpoints) / samplerate).astype(int)
    fbank = np.zeros((nfilt, nfft // 2 + 1))
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / max(1, bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / max(1, bins[j + 2] - bins[j + 1])
    return fbank


def mfcc(signal: np.ndarray, samplerate: int = 16000, winlen: float = 0.025,
         winstep: float = 0.01, numcep: int = 13, nfilt: int = 26,
         nfft: int = 512, lowfreq: float = 0.0,
         highfreq: Optional[float] = None, preemph: float = 0.97,
         ceplifter: int = 22) -> np.ndarray:
    """13-coefficient MFCCs, (num_frames, numcep).

    Matches python_speech_features.mfcc defaults: rectangular window,
    zero-padded tail framing (1 + ceil((len-400)/160) frames @16 kHz), power
    spectrum |rfft|²/nfft, HTK-mel triangular filterbank, log, ortho DCT-II,
    sinusoidal liftering, log-total-energy replacing c0. Operates on the raw
    int16-valued samples exactly as the reference feeds them
    (SyncNetInstance_calc_scores.py:85-87 — no amplitude normalization).
    """
    from scipy.fftpack import dct

    signal = np.asarray(signal, np.float64)
    highfreq = samplerate / 2.0 if highfreq is None else highfreq

    # pre-emphasis then zero-padded framing
    signal = np.append(signal[:1], signal[1:] - preemph * signal[:-1])
    frame_len = int(round(winlen * samplerate))    # 400 @ 16 kHz
    frame_step = int(round(winstep * samplerate))  # 160 @ 16 kHz
    slen = len(signal)
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((slen - frame_len) / frame_step))
    padlen = (numframes - 1) * frame_step + frame_len
    padded = np.concatenate([signal, np.zeros(padlen - slen)])
    idx = (np.arange(frame_len)[None, :]
           + np.arange(numframes)[:, None] * frame_step)
    frames = padded[idx]

    # power spectrum + total energy
    pspec = np.abs(np.fft.rfft(frames, nfft)) ** 2 / nfft
    energy = pspec.sum(axis=1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)

    # log mel filterbank energies
    fb = _filterbanks(nfilt, nfft, samplerate, lowfreq, highfreq)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat)

    # ortho DCT-II, lifter, log-energy as c0
    feat = dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
    if ceplifter > 0:
        lift = 1 + (ceplifter / 2.0) * np.sin(
            np.pi * np.arange(numcep) / ceplifter
        )
        feat = feat * lift
    feat[:, 0] = np.log(energy)
    return feat


# ---------------------------------------------------------------------------
# The two-tower model (NHWC / NDHWC)
# ---------------------------------------------------------------------------


def _bn(x, train=False):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.9)(x)


def _pool2d(x, window, strides, padding="VALID"):
    return nn.max_pool(x, window_shape=window, strides=strides,
                       padding=padding)


class _AudioTower(nn.Module):
    """2D CNN + FC over a (B, 13, 20, 1) MFCC window → (B, 1024)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        # reference has a 1×1/1 max-pool here (identity); nothing to do
        x = nn.Conv(192, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = _pool2d(x, (3, 3), (1, 2))                    # 13×20 → 11×9
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = _pool2d(x, (3, 3), (2, 2))                    # 11×9 → 5×4
        x = nn.Conv(512, (5, 4), padding="VALID")(x)      # → 1×1
        x = nn.relu(_bn(x))
        x = x.reshape((x.shape[0], -1))                   # (B, 512)
        x = nn.Dense(512)(x)
        x = nn.relu(_bn(x))
        return nn.Dense(1024)(x)


class _LipTower(nn.Module):
    """3D CNN + FC over a (B, 5, 224, 224, 3) BGR window → (B, 1024)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(96, (5, 7, 7), strides=(1, 2, 2), padding="VALID")(x)
        x = nn.relu(_bn(x))                               # (1, 109, 109)
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "VALID")  # (1, 54, 54)
        x = nn.Conv(256, (1, 5, 5), strides=(1, 2, 2),
                    padding=((0, 0), (1, 1), (1, 1)))(x)  # (1, 26, 26)
        x = nn.relu(_bn(x))
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))  # (1, 13, 13)
        x = nn.Conv(256, (1, 3, 3),
                    padding=((0, 0), (1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = nn.Conv(256, (1, 3, 3),
                    padding=((0, 0), (1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = nn.Conv(256, (1, 3, 3),
                    padding=((0, 0), (1, 1), (1, 1)))(x)
        x = nn.relu(_bn(x))
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "VALID")  # (1, 6, 6)
        x = nn.Conv(512, (1, 6, 6), padding="VALID")(x)    # (1, 1, 1)
        x = nn.relu(_bn(x))
        x = x.reshape((x.shape[0], -1))                    # (B, 512)
        x = nn.Dense(512)(x)
        x = nn.relu(_bn(x))
        return nn.Dense(1024)(x)


class ProtocolSyncNet(nn.Module):
    """joonson/syncnet_python-architecture two-tower SyncNet.

    ``forward_aud``/``forward_lip`` equivalents run as one call each; both
    embeddings are raw (un-normalized), matching the external model.
    """

    def setup(self):
        self.audio = _AudioTower()
        self.lip = _LipTower()

    def embed_audio(self, mfcc_win):
        """(B, 13, 20, 1) raw MFCC window → (B, 1024)."""
        return self.audio(mfcc_win)

    def embed_lip(self, frames):
        """(B, 5, 224, 224, 3) raw 0-255 BGR frames → (B, 1024)."""
        return self.lip(frames)

    def __call__(self, mfcc_win, frames):
        return self.embed_audio(mfcc_win), self.embed_lip(frames)


# ---------------------------------------------------------------------------
# torch checkpoint import (published syncnet_v2.model format: a plain
# state_dict of the S module — SyncNetInstance_calc_scores.py:203-210)
# ---------------------------------------------------------------------------


def _group_torch_layers(state: Dict[str, "np.ndarray"], prefix: str):
    """Order the conv/linear/bn layers under one Sequential prefix by index.

    Returns a list of ('conv'|'dense'|'bn', {tensor_name: array}) in layer
    order — robust to exact Sequential indices as long as the op sequence
    matches the towers above.
    """
    by_idx: Dict[int, Dict[str, np.ndarray]] = {}
    for key, val in state.items():
        if not key.startswith(prefix + "."):
            continue
        rest = key[len(prefix) + 1:]
        idx_s, _, tname = rest.partition(".")
        by_idx.setdefault(int(idx_s), {})[tname] = np.asarray(val)
    layers = []
    for idx in sorted(by_idx):
        tensors = by_idx[idx]
        if "running_mean" in tensors:
            layers.append(("bn", tensors))
        elif tensors["weight"].ndim in (4, 5):
            layers.append(("conv", tensors))
        elif tensors["weight"].ndim == 2:
            layers.append(("dense", tensors))
        else:
            raise ValueError(
                f"unrecognized layer {prefix}.{idx}: "
                f"{ {k: v.shape for k, v in tensors.items()} }"
            )
    return layers


def _conv_kernel_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW / OIDHW → flax HWIO / DHWIO."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    return np.transpose(w, (2, 3, 4, 1, 0))


def import_syncnet_python_checkpoint(path: str):
    """Load a syncnet_python ``.model`` checkpoint into ProtocolSyncNet
    variables. Shape-validates every tensor against the Flax template and
    raises with a per-tensor diff on mismatch."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    state = {k.replace("module.", ""): v.detach().numpy()
             for k, v in state.items()}

    model = ProtocolSyncNet()
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 13, 20, 1), jnp.float32),
            jnp.zeros((1, 5, 224, 224, 3), jnp.float32),
        )
    )

    # flax module paths, in the same layer order _group_torch_layers yields
    def tower_paths(scope: str, n_convs: int):
        paths = []
        for i in range(n_convs):
            paths.append(("conv", (scope, f"Conv_{i}")))
            paths.append(("bn", (scope, f"BatchNorm_{i}")))
        return paths

    def fc_paths(scope: str, first_dense: int, bn_idx: int):
        return [
            ("dense", (scope, f"Dense_{first_dense}")),
            ("bn", (scope, f"BatchNorm_{bn_idx}")),
            ("dense", (scope, f"Dense_{first_dense + 1}")),
        ]

    # each tower has 6 convs (each followed by BN); the FC head's BN is the
    # tower scope's 7th BatchNorm (Flax numbers all BNs in one compact scope)
    plan = {
        "netcnnaud": tower_paths("audio", 6),
        "netfcaud": fc_paths("audio", 0, 6),
        "netcnnlip": tower_paths("lip", 6),
        "netfclip": fc_paths("lip", 0, 6),
    }

    def _to_mutable(tree):
        if isinstance(tree, dict):
            return {k: _to_mutable(v) for k, v in tree.items()}
        return tree  # ShapeDtypeStruct leaf: replaced (or caught) below

    params = _to_mutable(dict(template["params"]))
    batch_stats = _to_mutable(dict(template["batch_stats"]))

    def _set(tree, path, name, arr):
        node = tree
        for p in path:
            node = node[p]
        want = tuple(node[name].shape)
        got = tuple(arr.shape)
        if got != want:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}/{name}: checkpoint "
                f"{got} vs model {want}"
            )
        node[name] = jnp.asarray(arr, jnp.float32)

    for prefix, paths in plan.items():
        layers = _group_torch_layers(state, prefix)
        kinds = [k for k, _ in layers]
        want_kinds = [k for k, _ in paths]
        if kinds != want_kinds:
            raise ValueError(
                f"{prefix}: checkpoint layer sequence {kinds} != expected "
                f"{want_kinds}"
            )
        for (kind, tensors), (_, path) in zip(layers, paths):
            if kind == "conv":
                _set(params, path, "kernel",
                     _conv_kernel_to_hwio(tensors["weight"]))
                _set(params, path, "bias", tensors["bias"])
            elif kind == "dense":
                _set(params, path, "kernel", tensors["weight"].T)
                _set(params, path, "bias", tensors["bias"])
            else:  # bn
                _set(params, path, "scale", tensors["weight"])
                _set(params, path, "bias", tensors["bias"])
                _set(batch_stats, path, "mean", tensors["running_mean"])
                _set(batch_stats, path, "var", tensors["running_var"])

    # every template leaf must have been filled by the checkpoint
    for leaf_path, leaf in jax.tree_util.tree_leaves_with_path(
        {"params": params, "batch_stats": batch_stats}
    ):
        if not isinstance(leaf, jax.Array):
            raise ValueError(
                f"checkpoint left {jax.tree_util.keystr(leaf_path)} unfilled"
            )

    return {"params": params, "batch_stats": batch_stats}


# ---------------------------------------------------------------------------
# Scoring — the reference statistic over the external model's embeddings
# ---------------------------------------------------------------------------


def distance_curve_scores(v_feat: np.ndarray, a_feat: np.ndarray,
                          vshift: int = 15, eps: float = 0.0) -> LSEResult:
    """Mean-over-windows distance curve over ±vshift offsets
    (SyncNetInstance_calc_scores.py:19-31,131-137). ``eps`` mirrors
    torch.nn.functional.pairwise_distance's additive epsilon (1e-6 in the
    reference path)."""
    n = len(v_feat)
    a_pad = np.pad(a_feat, ((vshift, vshift), (0, 0)))
    curve = np.zeros(2 * vshift + 1, np.float64)
    for s in range(2 * vshift + 1):
        diff = v_feat - a_pad[s : s + n] + eps
        curve[s] = np.sqrt((diff ** 2).sum(axis=1)).mean()
    best = int(np.argmin(curve))
    minval = float(curve[best])
    return LSEResult(
        lse_d=minval,
        lse_c=float(np.median(curve) - minval),
        av_offset=vshift - best,
    )


class SyncNetPythonScorer:
    """LSE-D/LSE-C scorer running the external-SyncNet protocol on device.

    Construct from an imported checkpoint (``from_checkpoint``) for
    number-comparable scores, or from random-init variables for pipeline
    tests. Mirrors SyncNetInstance.evaluate (SyncNetInstance_calc_scores.py:
    42-150): 224² frames, MFCC windows of 20 advancing 4/frame, window count
    ``min(len(frames), len(audio)//640) - 5``, distance curve over ±vshift.
    """

    def __init__(self, variables, vshift: int = 15, batch_size: int = 64):
        from wav2lip_tpu.utils.transfer import put_tree

        enable_compile_cache()
        # weights up once, passed as a jit argument (not closure constants —
        # those are re-fetched at lowering and baked into cached executables)
        self.vars = put_tree(variables)
        self.vshift = vshift
        self.batch_size = batch_size
        self.model = ProtocolSyncNet()
        self._jit_embed = jax.jit(
            lambda v, m, f: self.model.apply(v, m, f)
        )

    @classmethod
    def from_checkpoint(cls, path: str, vshift: int = 15,
                        batch_size: int = 64):
        return cls(import_syncnet_python_checkpoint(path), vshift=vshift,
                   batch_size=batch_size)

    # -- protocol frontend ----------------------------------------------------

    def _windows(self, frames_bgr: List[np.ndarray], audio_i16: np.ndarray,
                 samplerate: int = 16000):
        """(N, 5, 224, 224, 3) frame windows + (N, 13, 20, 1) MFCC windows
        for every start frame in [0, min_length-5)."""
        cc = mfcc(audio_i16, samplerate).T  # (13, T_mfcc)
        min_length = min(len(frames_bgr), int(len(audio_i16) // 640))
        lastframe = min_length - 5
        if lastframe < 1:
            raise ValueError("clip too short for LSE scoring (needs >5 "
                             "frames of both audio and video)")
        ims = np.stack([
            cv2.resize(f, (224, 224)) for f in frames_bgr[: lastframe + 4 + 1]
        ]).astype(np.float32)
        f_wins = np.stack([ims[i : i + 5] for i in range(lastframe)])
        m_wins = np.stack([
            cc[:, i * 4 : i * 4 + 20] for i in range(lastframe)
        ]).astype(np.float32)[..., None]
        return m_wins, f_wins

    def _embed_all(self, m_wins: np.ndarray, f_wins: np.ndarray):
        n = len(m_wins)
        bs = self.batch_size
        a_out, v_out = [], []
        for i in range(0, n, bs):
            m, f = m_wins[i : i + bs], f_wins[i : i + bs]
            k = len(m)
            if k < bs:  # pad to the fixed compiled batch shape
                m = np.concatenate(
                    [m, np.zeros((bs - k,) + m.shape[1:], m.dtype)])
                f = np.concatenate(
                    [f, np.zeros((bs - k,) + f.shape[1:], f.dtype)])
            a, v = self._jit_embed(self.vars, m, f)
            a_out.append(np.asarray(a)[:k])
            v_out.append(np.asarray(v)[:k])
        return np.concatenate(a_out), np.concatenate(v_out)

    # -- entry points -----------------------------------------------------------

    def score_arrays(self, frames_bgr: List[np.ndarray],
                     audio_i16: np.ndarray,
                     samplerate: int = 16000) -> LSEResult:
        m_wins, f_wins = self._windows(frames_bgr, audio_i16, samplerate)
        a_feat, v_feat = self._embed_all(m_wins, f_wins)
        return distance_curve_scores(v_feat, a_feat, self.vshift, eps=1e-6)

    def score_video(self, video_path: str,
                    wav_path: Optional[str] = None) -> LSEResult:
        """Score a rendered clip; audio from ``wav_path`` or extracted via
        ffmpeg. Raw int16 samples, as the reference feeds wavfile.read
        output straight to MFCC (SyncNetInstance_calc_scores.py:85-87)."""
        from scipy.io import wavfile

        from wav2lip_tpu.io.video import extract_audio, read_video_frames

        frames, _fps = read_video_frames(video_path)
        sr, audio = wavfile.read(wav_path or extract_audio(video_path))
        if audio.ndim > 1:
            audio = audio[:, 0]
        return self.score_arrays(frames, audio, sr)

    def score_video_tracked(self, video_path: str, detector,
                            wav_path: Optional[str] = None,
                            track_cfg=None) -> LSEResult:
        """Score a FULL-SCENE video through the protocol's face-track/crop
        front end (eval.face_track — the in-repo rebuild of syncnet_python
        run_pipeline.py, chained by calculate_scores_real_videos.sh:6-7):
        S3FD per frame at 0.25 scale, IOU tracking, median-smoothed 0.40-
        scale square crops to 224², audio sliced to the track span. This is
        the missing stage that makes ReSyncED-style videos (small off-center
        faces) score like their pre-cropped versions. ``detector`` is a
        detect.FaceDetectionPipeline with downscale=1."""
        from scipy.io import wavfile

        from wav2lip_tpu.eval.face_track import (
            TrackConfig,
            slice_audio_to_track,
            track_and_crop,
        )
        from wav2lip_tpu.io.video import extract_audio, read_video_frames

        frames, fps = read_video_frames(video_path)
        sr, audio = wavfile.read(wav_path or extract_audio(video_path))
        if audio.ndim > 1:
            audio = audio[:, 0]
        crops, track = track_and_crop(
            frames, detector, track_cfg or TrackConfig()
        )
        return self.score_arrays(
            crops, slice_audio_to_track(audio, sr, fps, track), sr
        )

    def score_many(self, pairs: List[Tuple[str, Optional[str]]]):
        """Corpus averaging (calculate_scores_LRS.py:40-50)."""
        results = [self.score_video(v, w) for v, w in pairs]
        return {
            "lse_d": float(np.mean([r.lse_d for r in results])),
            "lse_c": float(np.mean([r.lse_c for r in results])),
            "per_video": results,
        }
