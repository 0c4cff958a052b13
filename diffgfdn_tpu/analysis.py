"""EDC analysis: decay-parameter estimation and least-squares amplitudes.

Replaces the reference's analysis stack (src/diff_gfdn/analysis.py:41-262)
without the DecayFitNet dependency: decay parameters are estimated with a
multi-exponential nonlinear least-squares fit of the Schroeder EDC, and CS
amplitudes with the closed-form least-squares fit against decay kernels
(replacing slope2noise.calculate_amplitudes_least_squares). Host-side numpy;
these are offline analysis tools, not training-path code.
"""

from typing import List, Optional, Tuple

import numpy as np
from scipy.optimize import nnls
from scipy.signal import sosfilt

from .ops.basic import db2lin_np, LOG10E6, ms_to_samps
from .ops.filterbanks import fractional_octave_bands_sos
from .ops.geq import octave_bands


def octave_filtering(
    signal: np.ndarray,
    fs: float,
    band_centre_hz: List[float],
    get_filter_ir: bool = False,
) -> np.ndarray:
    """Filter a signal into octave bands (Butterworth SOS, zero-state).

    Returns (num_samples, num_bands). ``get_filter_ir`` filters an impulse
    instead (band filter IRs). Replaces slope2noise.octave_filtering.
    """
    # widen the range slightly so single-band requests still yield a filter
    sos, centers = fractional_octave_bands_sos(
        num_fractions=1,
        frequency_range=(
            min(band_centre_hz) / 2 ** 0.5,
            min(max(band_centre_hz) * 2 ** 0.5, fs / 2),
        ),
        sampling_rate=fs,
        order=5,
    )
    idx = [int(np.argmin(np.abs(centers - fc))) for fc in band_centre_hz]
    x = signal
    if get_filter_ir:
        x = np.zeros_like(signal)
        x[..., 0] = 1.0
    out = np.stack([sosfilt(sos[i], x, axis=-1) for i in idx], axis=-1)
    return out


def schroeder_edc(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Backward-integrated energy decay curve (host)."""
    return np.flip(np.cumsum(np.flip(x ** 2, axis=axis), axis=axis), axis=axis)


def calculate_amplitudes_least_squares(
    common_decay_times: np.ndarray,
    fs: float,
    filtered_rir: np.ndarray,
    band_centre_hz: List[float],
    leave_out_ms: float = 10.0,
    include_noise_term: bool = True,
) -> np.ndarray:
    """Least-squares CS amplitudes per band from band-filtered RIRs.

    Solves EDC_b(t) ~= sum_k A_kb exp(-t LOG10E6 / T_kb) (+ noise ramp) for
    nonnegative A (NNLS). ``common_decay_times``: (n_slopes, n_bands) or
    (n_slopes,); ``filtered_rir``: (n_samples, n_bands). Returns
    (1, n_slopes, n_bands) matching the reference's axis convention.
    """
    n_samples, n_bands = filtered_rir.shape
    cdt = np.asarray(common_decay_times, np.float64)
    if cdt.ndim == 1:
        cdt = np.repeat(cdt[:, None], n_bands, axis=1)
    n_slopes = cdt.shape[0]
    cut = ms_to_samps(leave_out_ms, fs)
    t = np.arange(n_samples - cut) / fs

    amps = np.zeros((1, n_slopes, n_bands))
    for b in range(n_bands):
        edc = schroeder_edc(filtered_rir[: n_samples - cut, b])
        # EDC of exp-decaying noise: integral of the energy envelope
        kernels = []
        for k in range(n_slopes):
            tau = LOG10E6 / cdt[k, b]
            kernels.append(np.exp(-t * tau) / tau * fs)  # backward integral
        if include_noise_term:
            kernels.append(np.flip(np.arange(1, len(t) + 1)).astype(np.float64))
        K = np.stack(kernels, axis=-1)
        sol, _ = nnls(K, edc)
        amps[0, :, b] = sol[:n_slopes] * (LOG10E6 / cdt[:, b]) / fs
    return amps


def get_amps_for_rir(
    rir: np.ndarray,
    common_decay_times: np.ndarray,
    band_centre_hz: List[float],
    fs: float,
    mixing_time_ms: float = 20.0,
    leave_out_ms: float = 10.0,
) -> np.ndarray:
    """CS amplitudes of one RIR per octave band (reference: analysis.py:172-207).

    Returns (n_bands, 1, n_slopes).
    """
    mix = ms_to_samps(mixing_time_ms, fs)
    trunc = rir[mix:] if (len(rir) - mix) % 2 == 0 else rir[mix + 1 :]
    filtered = octave_filtering(trunc, fs, band_centre_hz)
    amps = calculate_amplitudes_least_squares(
        common_decay_times, fs, filtered, band_centre_hz, leave_out_ms
    )
    return np.moveaxis(amps, -1, 0)


def estimate_decay_params(
    rir: np.ndarray,
    n_slopes: int,
    fs: float,
    f_bands: Optional[List[float]] = None,
    t60_grid: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Estimate (T60s, amplitudes, noise levels) per band from one RIR.

    Grid search over candidate decay times + NNLS amplitudes (a dependency-
    free stand-in for the reference's DecayFitNet wrapper,
    analysis.py:41-99): for each band, pick the n_slopes subset of the T60
    grid minimizing the EDC fit error. Returns arrays of shape
    (n_bands, n_slopes), (n_bands, n_slopes), (n_bands,).
    """
    from itertools import combinations

    if f_bands is None:
        f_bands = octave_bands(end_freq=min(16000.0, fs / 2))
    if t60_grid is None:
        t60_grid = np.geomspace(0.1, 3.0, 12)
    filtered = octave_filtering(rir, fs, f_bands)
    n_bands = filtered.shape[-1]
    t = np.arange(filtered.shape[0]) / fs

    t60s = np.zeros((n_bands, n_slopes))
    amps = np.zeros((n_bands, n_slopes))
    noise = np.zeros(n_bands)
    for b in range(n_bands):
        edc = schroeder_edc(filtered[:, b])
        log_edc = 10 * np.log10(edc + 1e-20)
        best = (np.inf, None, None, None)
        for combo in combinations(range(len(t60_grid)), n_slopes):
            cand = t60_grid[list(combo)]
            K = np.stack(
                [np.exp(-t * LOG10E6 / T) for T in cand]
                + [np.flip(np.arange(1, len(t) + 1)).astype(np.float64)],
                axis=-1,
            )
            sol, _ = nnls(K, edc)
            fit = K @ sol
            err = np.mean(
                (10 * np.log10(fit + 1e-20) - log_edc) ** 2
            )
            if err < best[0]:
                best = (err, cand, sol[:n_slopes], sol[-1])
        _, t60s[b], amps[b], noise[b] = best
    return t60s, amps, noise


def amplitudes_to_initial_level(
    decay_times: np.ndarray,
    amplitudes: np.ndarray,
    fs: float,
    ir_len: int,
    max_freq: float = 16e3,
    norm_vals: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Convert CS amplitudes to FDN initial levels (analysis.py:210-262).

    ``decay_times``/``amplitudes``: (n_bands, n_slopes). The level accounts
    for the octave filters' band energy and the delay feedback's geometric
    energy series.
    """
    if norm_vals is None:
        norm_vals = np.ones_like(amplitudes)
    n_slopes = amplitudes.shape[-1]
    amplitudes = amplitudes * norm_vals

    impulse = np.zeros(ir_len)
    impulse[0] = 1.0
    f_bands = octave_bands(end_freq=max_freq)
    band_irs = octave_filtering(impulse, fs, f_bands, get_filter_ir=True)
    band_energy = np.sum(band_irs ** 2, axis=0)
    band_energy = np.tile(band_energy[:, None], (1, n_slopes))

    slope = -60.0 / (decay_times * fs)
    gain_per_sample = db2lin_np(slope)
    decay_energy = 1.0 / (1.0 - gain_per_sample ** 2)
    return np.sqrt(amplitudes / band_energy / decay_energy)
