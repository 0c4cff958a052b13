"""The end-to-end walkthrough runs at toy scale and produces artifacts."""

import sys
from pathlib import Path

import numpy as np


def test_walkthrough_end_to_end(tmp_path):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import walkthrough

    walkthrough.main(["--out-dir", str(tmp_path)])
    assert (tmp_path / "inferred_rir.wav").exists()
    assert (tmp_path / "binaural_walkthrough.wav").exists()
    assert (tmp_path / "trajectory.gif").exists()
    rirs = np.load(tmp_path / "subband" / "broadband_rirs.npy")
    assert np.isfinite(rirs).all()
