"""Tests for biquad/SVF, GEQ design, prony, and filterbanks."""

import jax.numpy as jnp
import numpy as np
import scipy.signal as sig

from diffgfdn_tpu.ops import absorption, biquad, filterbanks, geq, prony


def test_svf_to_biquad_peaking_unit_gain_is_allpass():
    # a peaking SVF with 0 dB gain has num == den -> flat response
    num, den = biquad.svf_to_biquad(
        cutoff=jnp.array(0.3),
        resonance=jnp.array(0.5),
        filter_type=jnp.array(biquad.SVF_PEAKING),
        g_db=jnp.array(0.0),
    )
    assert np.allclose(np.asarray(num), np.asarray(den), atol=1e-6)


def test_svf_lowshelf_gains():
    # low shelf: boost at DC by G, unity at Nyquist
    f = np.pi * 1000.0 / 32000.0
    num, den = biquad.svf_to_biquad(
        cutoff=jnp.array(f),
        resonance=jnp.array(1.0 / np.sqrt(2.0)),
        filter_type=jnp.array(biquad.SVF_LOWSHELF),
        g_db=jnp.array(6.0),
    )
    z = jnp.array([1.0 + 0j, -1.0 + 0j])  # DC and Nyquist
    h = biquad.sos_frequency_response(num[None, :], den[None, :], z)
    mag = np.abs(np.asarray(h))
    assert abs(20 * np.log10(mag[0]) - 6.0) < 0.01
    assert abs(20 * np.log10(mag[1])) < 0.01


def test_sos_frequency_response_matches_scipy():
    rng = np.random.RandomState(1)
    # random stable biquad cascade
    sos = []
    for _ in range(4):
        p = 0.8 * rng.rand() * np.exp(1j * np.pi * rng.rand())
        zz = 0.9 * rng.rand() * np.exp(1j * np.pi * rng.rand())
        b = np.real(np.poly([zz, np.conj(zz)]))
        a = np.real(np.poly([p, np.conj(p)]))
        sos.append(np.concatenate([b, a]))
    sos = np.asarray(sos)
    w, h_ref = sig.sosfreqz(sos, worN=128)
    z = np.exp(1j * w)
    h = biquad.sos_frequency_response(
        jnp.asarray(sos[:, :3]), jnp.asarray(sos[:, 3:]), jnp.asarray(z)
    )
    assert np.allclose(np.asarray(h), h_ref, atol=1e-4)


def test_sos_response_low_cutoff_dc_no_cancellation():
    """DC response of a low-cutoff section must not blow up.

    At z = 1 the denominator sums to ~4 f^2 (f = pi fc / fs ~ 3e-3 for a
    31 Hz shelf at 32 kHz): a near-total cancellation. Evaluating the
    polynomial via a matmul (MXU at bf16 default precision on TPU) rounds
    it to 0 and the response NaNs — the elementwise form must stay finite
    and match float64.
    """
    import jax.numpy as jnp

    from diffgfdn_tpu.ops.biquad import sos_frequency_response, svf_to_biquad

    f = np.pi * 31.25 / 32000.0
    num, den = svf_to_biquad(
        jnp.asarray(f), jnp.asarray(0.7), jnp.asarray(3), jnp.asarray(5.0)
    )
    z = jnp.asarray([1.0 + 0.0j, np.exp(1j * 0.01)], jnp.complex64)
    h = np.asarray(sos_frequency_response(num[None], den[None], z))
    n64 = np.asarray(num, np.float64)
    d64 = np.asarray(den, np.float64)
    z64 = np.asarray(z, np.complex128)
    truth = np.polyval(n64[::-1], 1.0 / z64) / np.polyval(d64[::-1], 1.0 / z64)
    assert np.isfinite(h).all()
    np.testing.assert_allclose(h, truth, rtol=2e-3)


def test_iir_frequency_response_matches_scipy():
    b, a = sig.butter(4, 0.3)
    w, h_ref = sig.freqz(b, a, worN=64)
    z = np.exp(1j * w)
    h = biquad.iir_frequency_response(jnp.asarray(b), jnp.asarray(a), jnp.asarray(z))
    assert np.allclose(np.asarray(h), h_ref, atol=1e-4)


def test_design_geq_tracks_target():
    center_freq, shelving = geq.eq_freqs()
    fs = 32000.0
    n_bands = len(center_freq) + 2
    target = np.linspace(-6.0, -1.0, n_bands)
    b, a = geq.design_geq(target, center_freq, shelving, fs)
    sos = np.concatenate([b.T, a.T], axis=-1)
    resp = biquad.sos_response_np(sos, center_freq, fs)
    resp_db = 20 * np.log10(np.abs(resp))
    err = np.abs(resp_db - target[1:-1])
    # interior bands matched within 1 dB; the 16 kHz band sits at Nyquist
    # (fs=32 kHz) where a peaking section is ill-conditioned — allow 3 dB
    assert np.max(err[:-1]) < 1.0
    assert err[-1] < 3.0


def test_prony_recovers_iir():
    b_true, a_true = sig.butter(4, 0.25)
    h = sig.lfilter(b_true, a_true, np.eye(1, 256)[0])
    b_fit, a_fit = prony.prony(h, 4, 4)
    h_fit = sig.lfilter(b_fit, a_fit, np.eye(1, 256)[0])
    assert np.allclose(h_fit, h, atol=1e-6)


def test_prony_warped_fits_smooth_response():
    fs = 32000.0
    # smooth decaying magnitude
    n_fft = 1024
    freqs = np.array([63.0, 125, 250, 500, 1000, 2000, 4000, 8000])
    mags = np.linspace(1.0, 0.4, len(freqs))
    interp, _ = prony.interpolate_magnitude_spectrum(
        mags, freqs, fs, n_fft, cutoff=(20, fs / 2 - 4e3),
        rolloff_dc_db=-60, rolloff_nyq_db=-100,
    )
    ir = prony.tf2minphase(interp, is_time_domain=True)
    b, a = prony.prony_warped(ir, fs, 8, 8)
    w, h = sig.freqz(b, a, worN=n_fft // 2 + 1, fs=fs)
    mid = (w > 100) & (w < 8000)
    err_db = np.abs(
        20 * np.log10(np.abs(h[mid]) + 1e-9) - 20 * np.log10(interp[mid] + 1e-9)
    )
    assert np.median(err_db) < 1.0


def test_absorption_gain_per_sample():
    g = absorption.decay_times_to_gain_per_sample(
        jnp.array([1.0]), jnp.array([32000.0]), 32000.0
    )
    # after T60 seconds of propagation, attenuation = -60 dB
    assert np.isclose(20 * np.log10(float(g[0])), -60.0, atol=1e-3)


def test_absorption_geq_filters_match_targets():
    fs = 32000.0
    bands = np.array([63.0, 125, 250, 500, 1000, 2000, 4000, 8000])
    t60 = np.linspace(1.2, 0.4, len(bands))
    delays = [1499, 1801]
    coeffs = absorption.decay_times_to_gain_filters_geq(bands, t60, delays, fs)
    assert coeffs.shape == (2, len(bands) + 3, 3, 2)
    for i, d in enumerate(delays):
        sos = np.concatenate([coeffs[i, :, :, 0], coeffs[i, :, :, 1]], axis=-1)
        resp = biquad.sos_response_np(sos, bands, fs)
        target = (10 ** (-3.0 / fs / t60)) ** d
        err_db = np.abs(
            20 * np.log10(np.abs(resp)) - 20 * np.log10(target)
        )
        assert np.max(err_db) < 1.5


def test_reconstructing_filterbank_is_allpass():
    coeffs, freqs = filterbanks.reconstructing_fractional_octave_bands(
        num_fractions=1, frequency_range=(63.0, 16000.0),
        n_samples=4096, sampling_rate=32000.0,
    )
    # covers at least the 63 .. 8000 Hz octave centres used in training
    assert len(freqs) >= 8
    for fc in (63.0, 125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0):
        assert np.min(np.abs(freqs - fc) / fc) < 0.05
    total = coeffs.sum(axis=0)
    H = np.fft.rfft(total)
    assert np.allclose(np.abs(H), 1.0, atol=1e-6)


def test_butterworth_bands_cover_spectrum():
    sos, freqs = filterbanks.fractional_octave_bands_sos(
        num_fractions=1, frequency_range=(63.0, 16000.0), sampling_rate=32000.0
    )
    assert sos.shape[0] == len(freqs)
    # band responses peak near their centre frequencies
    for k, fc in enumerate(freqs):
        w, h = sig.sosfreqz(sos[k], worN=4096, fs=32000.0)
        peak_f = w[np.argmax(np.abs(h))]
        assert 0.6 * fc < peak_f < 1.6 * fc


def test_time_reversed_filterbank_reconstruction():
    fs = 32000.0
    coeffs, _ = filterbanks.reconstructing_fractional_octave_bands(
        num_fractions=1, frequency_range=(63.0, 16000.0),
        n_samples=1024, sampling_rate=fs,
    )
    rng = np.random.RandomState(0)
    x = rng.randn(2048)
    # analysis: filter x into bands
    bands = np.stack(
        [np.convolve(x, coeffs[b], mode="full")[: len(x)] for b in range(len(coeffs))],
        axis=-1,
    )
    y = filterbanks.time_reversed_filtering(bands, coeffs).sum(axis=-1)
    # energy of reconstruction should be close to the original's
    ex = np.sum(x ** 2)
    ey = np.sum(y ** 2)
    assert 0.5 < ey / ex < 2.0


def test_subband_filter_response_shapes():
    resp = filterbanks.subband_filter_response(
        1000.0, (63.0, 16000.0), 1, 32000.0, 8192, use_amp_preserving=True
    )
    assert resp.shape == (8192 // 2 + 1,)
    resp_b = filterbanks.subband_filter_response(
        1000.0, (63.0, 16000.0), 1, 32000.0, 8192, use_amp_preserving=False
    )
    assert resp_b.shape == (8192 // 2 + 1,)


def test_allpass_warp_identity_and_roundtrip():
    """rho=0 is the identity warp (regression: a missing Nyquist bin used
    to misalign the negative-frequency half, ~7% error even at rho=0);
    warp->unwarp approximately inverts."""
    from diffgfdn_tpu.ops.prony import allpass_warp

    rng = np.random.RandomState(0)
    ir = rng.randn(512) * np.exp(-np.arange(512) / 100.0)
    out = allpass_warp(ir, 0.0)
    assert np.abs(out - ir).max() < 1e-10 * np.abs(ir).max()
    back = allpass_warp(allpass_warp(ir, 0.4), -0.4)
    assert np.abs(back - ir).max() < 0.05 * np.abs(ir).max()


def test_delay_primes_range_too_small_raises():
    import pytest

    from diffgfdn_tpu.config.schema import DiffGFDNConfig

    cfg = DiffGFDNConfig(
        seed=0, num_groups=3, sample_rate=32000.0, num_delay_lines=27,
        delay_range_ms=[20.0, 21.0],  # ~17 primes in [640, 672)
    )
    with pytest.raises(ValueError, match="primes"):
        _ = cfg.delay_length_samps


def test_subband_filter_response_short_grid_keeps_passband():
    """rfft(coeffs, n) truncates: on grids shorter than the FIR design
    length the 4096-tap filter's energy (centred at 2048) was cut away,
    silently returning an all-but-zero response — every small-nfft subband
    loss then compared eps-floor EDCs. The filter must be designed no
    longer than the grid."""
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response

    for nfft in (512, 1024, 4096):
        r = subband_filter_response(500.0, (63.0, 4000.0), 1, 8000.0, nfft)
        assert r.shape == (nfft // 2 + 1,)
        freqs = np.fft.rfftfreq(nfft, 1.0 / 8000.0)
        at_fc = np.abs(r)[np.argmin(np.abs(freqs - 500.0))]
        assert abs(at_fc - 1.0) < 0.05, (nfft, at_fc)
        # stopband well below the passband
        at_dc = np.abs(r)[1]
        assert at_dc < 0.1, (nfft, at_dc)
