"""Prony / warped-Prony IIR fitting (host-side, init-time only).

Used to fit absorption filters to octave-band decay times before training
(reference: filters/prony.py:48-288, absorption_filters.py:56-105). These
fits are non-differentiable and run once at model build, so they stay in
numpy/scipy and never enter the jit graph.
"""

from typing import Optional, Tuple

import numpy as np
from scipy.fft import fft, ifft, irfft, rfftfreq
from scipy.interpolate import interp1d, splev, splrep
from scipy.linalg import toeplitz
from scipy.signal import hilbert, tf2zpk, zpk2tf

from .basic import db2lin_np, db_np


def one_to_two_sided_spectrum(one_sided: np.ndarray, is_even: bool = True):
    """Mirror a one-sided spectrum to a conjugate-symmetric two-sided one."""
    one_sided = np.array(one_sided, copy=True)
    if is_even:
        one_sided[-1] = np.real(one_sided[-1])
        two_sided = np.concatenate((one_sided, np.conj(one_sided[-2:0:-1])), axis=0)
    else:
        two_sided = np.concatenate((one_sided, np.conj(one_sided[-1:0:-1])), axis=0)
    two_sided[0] = np.real(two_sided[0])
    return two_sided


def wrap_phase(ph_uw: np.ndarray, positive: bool = True) -> np.ndarray:
    """Wrap phase into a 2*pi range."""
    twopi = 2 * np.pi
    if positive:
        return np.remainder(ph_uw, twopi)
    return ph_uw - np.round(ph_uw / twopi) * twopi


def tf2minphase(
    tf: np.ndarray,
    axis: int = 0,
    is_even_fft: bool = True,
    is_time_domain: bool = False,
) -> np.ndarray:
    """Minimum-phase version of a one-sided transfer function (Hilbert method)."""
    tf = np.asarray(tf)
    num_bins = tf.shape[axis]
    full = one_to_two_sided_spectrum(tf, is_even_fft)
    mag = np.abs(full)
    phu = np.imag(hilbert(-np.log(mag + np.finfo(np.float64).eps), axis=axis))
    ph = wrap_phase(phu)
    tf_mp = mag * np.exp(1j * ph)
    tf_mp = np.take(tf_mp, np.arange(num_bins), axis=axis)
    if is_time_domain:
        return irfft(tf_mp)
    return tf_mp


def interpolate_magnitude_spectrum(
    mag_spec: np.ndarray,
    freqs: np.ndarray,
    fs: float,
    n_fft: int,
    cutoff: Tuple[float, float] = (63.0, 16000.0),
    rolloff_dc_db: Optional[float] = None,
    rolloff_nyq_db: Optional[float] = None,
    return_one_sided: bool = True,
    bands_per_octave: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Spline-interpolate an octave-band magnitude onto the rFFT grid.

    Gentle roll-offs are applied below/above the cutoff band edges
    (reference: filters/prony.py:48-107).
    """
    mag_spec = np.asarray(mag_spec, dtype=np.float64)
    freqs = np.asarray(freqs, dtype=np.float64)
    if rolloff_nyq_db is None:
        rolloff_nyq_db = db_np(mag_spec[-1] - mag_spec[-2]) * bands_per_octave
    if rolloff_dc_db is None:
        rolloff_dc_db = -db_np(np.abs(mag_spec[1] - mag_spec[0])) * bands_per_octave

    new_freqs = rfftfreq(n_fft, d=1.0 / fs)
    n_bins = new_freqs.size
    end_at = int(np.where(new_freqs >= cutoff[1])[0][0])
    spline = splrep(freqs, mag_spec, k=2)
    mag_interp = splev(new_freqs, spline)

    start_from = int(np.where(new_freqs >= cutoff[0])[0][0])
    mag_interp[:start_from] = np.flip(
        mag_interp[start_from] - db2lin_np(rolloff_dc_db) * np.arange(start_from)
    )
    max_freq = float(np.max(freqs))
    frac_decay_at_nyq = (fs / 2.0) / (2.0 * max_freq)
    mag_interp[end_at:] = mag_interp[end_at] - db2lin_np(rolloff_nyq_db) * np.linspace(
        0.0, frac_decay_at_nyq, n_bins - end_at
    )
    if not return_one_sided:
        mag_interp = one_to_two_sided_spectrum(mag_interp, n_fft % 2 == 0)
    return mag_interp, new_freqs


def prony(h: np.ndarray, nb: int, na: int) -> Tuple[np.ndarray, np.ndarray]:
    """Prony's method: IIR (b, a) of orders (nb, na) matching impulse response h."""
    h = np.asarray(h, dtype=np.float64)
    k = len(h) - 1
    H = toeplitz(h, np.append([1.0], np.zeros(k)))[:, : na + 1]
    H1 = H[: nb + 1, :]
    h1 = H[nb + 1 : k + 1, 0]
    H2 = H[nb + 1 : k + 1, 1 : na + 1]
    # least-squares denominator (H2 is tall); -H2 \ h1
    a_tail = -np.linalg.lstsq(H2, h1, rcond=None)[0]
    a = np.concatenate(([1.0], a_tail))
    b = a @ H1.T
    return b, a


def allpass_warp(ir: np.ndarray, rho: float) -> np.ndarray:
    """Allpass frequency-warp an impulse response by warping factor rho."""
    nsamp = len(ir)
    nbinsmax = 65536
    stretch = (1 + abs(rho)) / (1 - abs(rho))
    nbins = min(nbinsmax, 2 ** int(np.ceil(np.log2(nsamp * stretch))))
    w = np.pi * np.arange(nbins) / nbins
    z = np.exp(1j * w)
    zeta = (z - rho) / (1 - rho * z)
    ww = np.angle(zeta)

    tf = fft(ir, 2 * nbins)[:nbins]
    interpf = interp1d(w, tf, kind="cubic", fill_value="extrapolate")
    var = interpf(ww)
    tfw = np.r_[var, np.conj(np.flip(var[1:nbins]))]
    irw = np.real(ifft(tfw, 2 * nbins))[:nsamp]
    return irw


def allpass_warp_roots(
    rho: float, b: np.ndarray, a: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Allpass-warp filter coefficients by warping their poles and zeros."""
    z, p, k = tf2zpk(b, a)
    zw = (z + rho) / (1 + rho * z)
    pw = (p + rho) / (1 + rho * p)
    npz = len(p) - len(z)
    if npz > 0:
        zw = np.r_[zw, np.ones(npz) * rho]
    elif npz < 0:
        pw = np.r_[pw, np.ones(-npz) * rho]
    kw = k * np.prod(1 + z * rho) / np.prod(1 + p * rho)
    bw, aw = zpk2tf(zw, pw, kw)
    return np.real(bw), np.real(aw)


def stabilize_denominator(a: np.ndarray, max_radius: float = 0.98) -> np.ndarray:
    """Clamp denominator pole radii to ``max_radius``.

    Prony least-squares fits can place poles essentially ON the unit circle
    (observed |den(z)| ~ 2e-8 at a frequency-sampling grid point), which
    makes the frequency-sampled response an f32 rounding lottery and blows
    up the loop-matrix inverse. Shrinking the radius keeps conjugate pairs
    symmetric, so the polynomial stays real.
    """
    a = np.asarray(a, np.float64)
    p = np.roots(a)
    r = np.abs(p)
    if np.all(r <= max_radius):
        return a
    p = np.where(r > max_radius, p * (max_radius / np.maximum(r, 1e-12)), p)
    return np.real(np.poly(p)) * a[0]


def prony_warped(
    h: np.ndarray, fs: float, nb: int, na: int, rho: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Prony fit in a warped (approximately Bark) frequency domain."""
    if rho is None:
        rho = (
            -np.round(
                (1.0674 * np.sqrt(2 / np.pi * np.arctan(0.06583 * (fs / 1000))) - 0.1916)
                * 1000
            )
            / 1000
        )
    h_warp = allpass_warp(h, rho)
    b_warped, a_warped = prony(h_warp, nb, na)
    return allpass_warp_roots(-rho, b_warped, a_warped)
