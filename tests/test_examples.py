"""Smoke + invariant tests for the notebook-study examples.

Each example reproduces one of the reference's investigation notebooks
(loss surface, fade-in, subband colouration) as a runnable script; these
tests pin the study's *conclusion*, not just that the script runs.
"""

import importlib.util
from pathlib import Path

import numpy as np


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"{name}_example",
        Path(__file__).resolve().parents[1] / "examples" / f"{name}.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_loss_surface_product_degeneracy(tmp_path):
    """The EDC surface's minimum valley sits on g_in*g_out = true product."""
    mod = _load("loss_surface")
    g, edc, edr, prod = mod.compute_surfaces(nfft=1024, grid=13, span=1.2)
    assert np.all(np.isfinite(edc)) and np.all(np.isfinite(edr))
    i, j = np.unravel_index(np.argmin(edc), edc.shape)
    assert abs(g[i] * g[j] - prod) < 0.15
    # degeneracy: the mirrored gain pair (-g_in, -g_out) is equally optimal
    mi = len(g) - 1 - i
    mj = len(g) - 1 - j
    assert abs(edc[mi, mj] - edc[i, j]) < 1e-3


def test_fadein_difference_of_exponentials(tmp_path):
    """The +/- tap case IS the difference of exponentials, exactly.

    With both groups sharing delays and mixing matrix, the grouped FDN
    factors as sum_g c_g e^{-d_g t} u(t) with u the shared lossless
    kernel — opposite-sign taps therefore modulate u by the fade-in
    envelope (e^{-d1 t} - e^{-d2 t}) sample-for-sample (the notebook's
    coupled-room fade-in condition).
    """
    mod = _load("fadein_study")
    fs = 8000.0
    t60s = (0.25, 0.9)
    t, rirs, analytic, t0, u = mod.synthesize_cases(
        fs=fs, t60s=t60s, dur_s=0.4)
    d = 3.0 * np.log(10) / np.asarray(t60s)
    w = 0.2 / np.sqrt(abs(d[1] - d[0]))
    pred = w * (np.exp(-d[0] * t) - np.exp(-d[1] * t)) * u
    got = rirs["uncoupled, +/- taps"]
    peak = np.max(np.abs(got))
    assert np.max(np.abs(got - pred)) < 1e-3 * peak
    # same-sign taps: the SUM of exponentials (no early cancellation)
    pred_ss = 0.35 * (np.exp(-d[0] * t) + np.exp(-d[1] * t)) * u
    got_ss = rirs["uncoupled, same-sign taps"]
    assert np.max(np.abs(got_ss - pred_ss)) < 1e-3 * np.max(np.abs(got_ss))
    # fade-in: the +/- energy envelope peaks well after the first echo;
    # the same-sign envelope peaks at it
    win = int(0.01 * fs)
    pk_pm = t[np.argmax(mod.envelope_db(got, win))] - t0
    pk_ss = t[np.argmax(mod.envelope_db(got_ss, win))] - t0
    assert pk_pm > pk_ss + 0.01, (pk_pm, pk_ss)
    # analytic target rises then falls
    pk = np.argmax(analytic)
    assert 0 < pk < len(t) - 1


def test_colouration_filterbank_restores_band_decay(tmp_path):
    """Subband filtering restores per-band decay; a plain sum cannot.

    The plain sum's top-band region contains every band's (full-band) FDN
    including the slow low-frequency one, so its top-band decay is
    contaminated toward the longest T60; the filterbank sum decays at the
    top band's own (fast) prescribed rate.
    """
    mod = _load("fdn_colouration")
    nfft, fs = 8192, 32000.0
    centres, h_bands, w_bands, t60s = mod.band_responses(nfft=nfft, fs=fs)
    freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
    w_top = w_bands[-1]
    n0 = 2 ** 11  # the reconstruction FIRs' group delay (fir 4096 taps)
    d_plain = mod.band_decay_db(h_bands.sum(0), w_top, nfft, fs)
    d_filt = mod.band_decay_db((w_bands * h_bands).sum(0), w_top, nfft, fs,
                               undo_delay_samps=n0)
    d_ref = mod.band_decay_db(h_bands[-1], w_top, nfft, fs)
    # filtered sum decays like the top-band GFDN alone; the plain sum
    # decays measurably slower (less dB drop over the same window)
    assert abs(d_filt - d_ref) < 2.0, (d_filt, d_ref)
    assert d_plain > d_filt + 3.0, (d_plain, d_filt)
    # the bank itself reconstructs: |sum W_b| ~ 1 over the passband
    total = np.abs(w_bands.sum(0))
    sel = (freqs >= centres[0]) & (freqs <= fs / 2 * 0.9)
    assert np.allclose(total[sel], 1.0, atol=0.1)
    # colouration metric is finite for all three reconstructions
    assert np.isfinite(mod.colouration_db(h_bands.sum(0), freqs,
                                          centres[0], fs / 2 * 0.9))


def test_check_edr_loss_dft_shortcut_is_invalid(tmp_path):
    """check_edr_loss.ipynb's conclusion: the convolution-rule 'STFT from
    DFT bins' shortcut does NOT match the true STFT (sampled spectra
    multiply as circular convolution), while irfft -> STFT is exact — so
    the EDR loss must go through the time domain, as losses/gfdn.py does."""
    mod = _load("check_edr_loss")
    res = mod.run(str(tmp_path / "edr"))
    # irfft path is numerically exact; the shortcut is off by tens of dB
    assert res["err_irfft_db"] < 0.05
    assert res["err_shortcut_db"] > 20.0 * res["err_irfft_db"]
    assert res["err_shortcut_db"] > 5.0
    assert (tmp_path / "edr" / "edr_comparison.png").exists()


def test_colorless_training_flattens_every_group(tmp_path):
    """investigate_colorless_output.ipynb's conclusion: colorless
    pre-training raises each group's spectral flatness and pulls |H|
    toward 1 (spectral MSE drops)."""
    mod = _load("colorless_output_study")
    results = mod.run(str(tmp_path / "colorless"), epochs=5)
    assert len(results) == 3
    for r in results:
        assert r["flat1"] > r["flat0"]
        assert r["mse1"] < 0.5 * r["mse0"]
    assert (tmp_path / "colorless" / "colorless_responses.png").exists()


def test_cs_amplitudes_cluster_by_room_and_vary_smoothly(tmp_path):
    """analyse_common_slope_amplitudes.ipynb's conclusions: (1) per-
    receiver CS amplitude vectors cluster by ROOM (a 3-component GMM
    recovers the room partition), (2) the amplitude field is spatially
    smooth (2-D spatial spectrum is low-pass)."""
    mod = _load("cs_amplitude_study")
    res = mod.run(str(tmp_path / "cs"))
    assert res["accuracy"] > 0.85
    for ratio in res["lowpass_ratios"]:
        assert ratio > 0.9
    assert (tmp_path / "cs" / "amplitude_map_slope1.png").exists()


def test_low_rank_trained_free_render(tmp_path):
    """low_rank_amplitude_matrix_decomposition.ipynb's conclusion: the CS
    amplitude matrix is near rank-1 (source x receiver separable), and its
    factors drive a GFDN render with NO TRAINING whose EDC tracks the true
    common-slopes EDC."""
    mod = _load("low_rank_study")
    res = mod.run(str(tmp_path / "lr"))
    assert np.all(res["explained"] > 0.95)
    assert res["mean_edc_err_db"] < 4.0
    assert (tmp_path / "lr" / "low_rank_edc_error_map.png").exists()


def test_room_geometry_spatial_machinery(tmp_path):
    """visualise_room_geometry.ipynb's checks: one-hot encodings snap
    train/valid receivers to unique mesh cells, Fourier features vary
    across the grid, and CNN square patches partition the receiver grid."""
    mod = _load("room_geometry_study")
    res = mod.run(str(tmp_path / "geom"))
    for split in ("train", "valid"):
        assert res["one_hot"][split]["unique"], split
    assert int((res["feat_std"] > 0.05).sum()) >= len(res["feat_std"]) // 2
    assert res["patches"]["disjoint"]
    assert res["patches"]["covered"] > 0.9
    assert (tmp_path / "geom" / "floor_plan.png").exists()
    assert (tmp_path / "geom" / "rooms_3d.png").exists()
