"""Executable example for the evaluation harness: `evaluate generate` over
the checked-in sample pair list (filelists/sample_pairs.txt) against
synthetic media — the vendored stand-in for the reference's
test_filelists/*.txt benchmark runs (gen_videos_from_filelist.py)."""

import os
from os.path import dirname, join

import cv2
import jax
import numpy as np
import pytest

from fixtures import make_video, make_wav

REPO = dirname(dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gen_checkpoint(tmp_path_factory):
    from wav2lip_tpu.models import Wav2LipGenerator
    from wav2lip_tpu.train.checkpoint import save_checkpoint

    d = tmp_path_factory.mktemp("genckpt")
    variables = jax.jit(Wav2LipGenerator().init)(
        jax.random.key(0),
        np.zeros((1, 80, 16, 1), np.float32),
        np.zeros((1, 96, 96, 6), np.float32),
    )
    return save_checkpoint(
        str(d), 0,
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats"),
         "opt_state": None, "global_step": 0, "global_epoch": 0},
    )


def test_generate_over_sample_pairs(gen_checkpoint, tmp_path):
    from wav2lip_tpu.cli.evaluate import main

    data_root = tmp_path / "data" / "spk0"
    data_root.mkdir(parents=True)
    # media named to match filelists/sample_pairs.txt ids (spk0/vid{0,1,2});
    # vid0's 2 s audio paired with vid2's 30 frames exercises the eval
    # harness's skip-if-short path (gen_videos_from_filelist.py:195-196)
    for i, (frames, secs) in enumerate([(30, 2.0), (30, 1.0), (30, 1.0)]):
        make_video(str(data_root / f"vid{i}.mp4"), num_frames=frames,
                   fps=25.0, w=128, h=128)
        make_wav(str(data_root / f"vid{i}.wav"), seconds=secs, seed=i)

    results = tmp_path / "out"
    rc = main([
        "generate",
        "--filelist", join(REPO, "filelists", "sample_pairs.txt"),
        "--data_root", str(tmp_path / "data"),
        "--results_dir", str(results),
        "--checkpoint_path", gen_checkpoint,
        "--box", "20", "108", "20", "108",
        "--wav2lip_batch_size", "16",
    ])
    assert rc == 0
    rendered = sorted(os.listdir(results))
    # pair 2 is (audio vid0: 2.0s → 46 chunks) vs (video vid2: 30 frames)
    # → skipped; pairs 0 and 1 render
    assert "0.mp4" in rendered and "1.mp4" in rendered
    assert "2.mp4" not in rendered

    cap = cv2.VideoCapture(str(results / "1.mp4"))
    n = 0
    while cap.read()[0]:
        n += 1
    # 1.0 s audio → 81 mel frames → 21 full chunks, tail DROPPED (eval mode)
    assert n == 21
