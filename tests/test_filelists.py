"""Vendored benchmark filelists: parse all five and round-trip a sampled
subset through the evaluate-CLI path planning (VERDICT: the standard
benchmark must be runnable given only a data_root)."""

import os
from os.path import join

import numpy as np
import pytest

ROOT = join(os.path.dirname(__file__), "..", "filelists", "test_filelists")

LRS_LISTS = {"lrs2.txt": 14239, "lrs3.txt": 14000, "lrw.txt": 28000}
RESYNCED = {"random_pairs.txt": 160, "tts_pairs.txt": 18}


@pytest.mark.parametrize("name,count", sorted(LRS_LISTS.items()))
def test_lrs_filelists_parse(name, count):
    """Two whitespace-separated IDs per line, no blanks, exact counts
    (reference evaluation/test_filelists/*.txt)."""
    with open(join(ROOT, name)) as f:
        pairs = [ln.split() for ln in f if ln.strip()]
    assert len(pairs) == count
    assert all(len(p) == 2 for p in pairs)
    # IDs are relative paths without extensions
    assert not any(p[0].endswith(".mp4") or p[1].endswith(".mp4")
                   for p in pairs[:100])


@pytest.mark.parametrize("name,count", sorted(RESYNCED.items()))
def test_resynced_filelists_parse(name, count):
    """ReSyncED pairs are media *filenames* (video audio)."""
    with open(join(ROOT, "ReSyncED", name)) as f:
        pairs = [ln.split() for ln in f if ln.strip()]
    assert len(pairs) == count
    assert all(len(p) == 2 for p in pairs)


def test_generate_path_planning_roundtrip(tmp_path):
    """A sampled subset of lrs2.txt plans to data_root-relative media paths
    exactly like cmd_generate (cli/evaluate.py): video = data_root/<id>.mp4,
    audio = sibling .wav when present else <id>.mp4."""
    with open(join(ROOT, "lrs2.txt")) as f:
        pairs = [ln.split() for ln in f if ln.strip()]
    rng = np.random.default_rng(0)
    sample = [pairs[i] for i in rng.choice(len(pairs), 25, replace=False)]

    data_root = tmp_path / "lrs2"
    planned = []
    for audio_id, video_id in sample:
        vpath = data_root / (video_id + ".mp4")
        apath_wav = data_root / (audio_id + ".wav")
        apath = apath_wav if apath_wav.exists() else data_root / (
            audio_id + ".mp4")
        planned.append((str(vpath), str(apath)))
        # IDs resolve under data_root without escaping it
        assert str(vpath).startswith(str(data_root))
        assert str(apath).startswith(str(data_root))
        # create the tree to prove the IDs are valid relative paths
        vpath.parent.mkdir(parents=True, exist_ok=True)
        vpath.touch()
    assert len(set(p[0] for p in planned)) == len(planned)
