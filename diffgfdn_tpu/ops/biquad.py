"""Biquad / SVF filter primitives, fully vectorized for TPU.

Replaces the reference's per-filter python loops (gain_filters.py:19-259,
filters/functional.py:11-374) with closed-form batched jnp code:

* ``svf_to_biquad`` — state-variable-filter parameters -> biquad coefficients
  for whole cascades at once (reference builds SVF objects one by one,
  gain_filters.py:105-151);
* ``sos_frequency_response`` — cascade response evaluated at arbitrary complex
  z points, batched over leading axes (reference: gain_filters.py:221-241);
* RBJ biquad recipes (low/high/bandpass, shelving, peak) as vectorized
  functions (reference: filters/functional.py:54-330);
* ``probe_sos`` magnitude probing for the GEQ designer
  (reference: filters/functional.py:332-374).

Everything here is jit-safe and differentiable.
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# SVF filter-type ids for the vectorized mixing-coefficient table
SVF_LOWPASS = 0
SVF_HIGHPASS = 1
SVF_BANDPASS = 2
SVF_LOWSHELF = 3
SVF_HIGHSHELF = 4
SVF_PEAKING = 5


def svf_mixing_coeffs(
    filter_type: jnp.ndarray, resonance: jnp.ndarray, g_lin: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mixing coefficients (m_LP, m_BP, m_HP) for a batch of SVFs.

    ``filter_type`` is an integer array using the SVF_* ids; ``resonance`` and
    ``g_lin`` (linear gain) broadcast against it. Matches the per-type table
    of the reference (gain_filters.py:42-102).
    """
    ones = jnp.ones_like(g_lin)
    zeros = jnp.zeros_like(g_lin)
    sqrt_g = jnp.sqrt(g_lin)

    m_lp = jnp.select(
        [
            filter_type == SVF_LOWPASS,
            filter_type == SVF_HIGHPASS,
            filter_type == SVF_BANDPASS,
            filter_type == SVF_LOWSHELF,
            filter_type == SVF_HIGHSHELF,
        ],
        [ones, zeros, zeros, g_lin, ones],
        default=ones,  # peaking / notch
    )
    m_bp = jnp.select(
        [
            filter_type == SVF_LOWPASS,
            filter_type == SVF_HIGHPASS,
            filter_type == SVF_BANDPASS,
            filter_type == SVF_LOWSHELF,
            filter_type == SVF_HIGHSHELF,
        ],
        [zeros, zeros, ones, 2.0 * resonance * sqrt_g, 2.0 * resonance * sqrt_g],
        default=2.0 * resonance * g_lin,  # peaking / notch
    )
    m_hp = jnp.select(
        [
            filter_type == SVF_LOWPASS,
            filter_type == SVF_HIGHPASS,
            filter_type == SVF_BANDPASS,
            filter_type == SVF_LOWSHELF,
            filter_type == SVF_HIGHSHELF,
        ],
        [zeros, ones, zeros, ones, g_lin],
        default=ones,  # peaking / notch
    )
    return m_lp, m_bp, m_hp


def svf_to_biquad(
    cutoff: jnp.ndarray,
    resonance: jnp.ndarray,
    filter_type: jnp.ndarray,
    g_db: jnp.ndarray,
    compress_pole_factor: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert batches of SVF params to biquad (num, den) coefficient triples.

    All inputs broadcast; outputs have shape ``broadcast_shape + (3,)``.
    ``cutoff`` is the normalized frequency variable f = pi * fc / fs (the
    reference feeds this directly into the bilinear SVF form,
    model.py:716-719). ``compress_pole_factor`` < 1 shrinks pole/zero radii to
    reduce time-aliasing (reference: gain_filters.py:117-151).
    """
    cutoff, resonance, filter_type, g_db = jnp.broadcast_arrays(
        cutoff, resonance, filter_type, g_db
    )
    g_lin = jnp.power(10.0, g_db * 0.05)
    m_lp, m_bp, m_hp = svf_mixing_coeffs(filter_type, resonance, g_lin)
    f = cutoff
    rho = compress_pole_factor

    b0 = f ** 2 * m_lp + f * m_bp + m_hp
    b1 = (2.0 * f ** 2 * m_lp - 2.0 * m_hp) * rho
    b2 = (f ** 2 * m_lp - f * m_bp + m_hp) * rho ** 2

    a0 = f ** 2 + 2.0 * resonance * f + 1.0
    a1 = (2.0 * f ** 2 - 2.0) * rho
    a2 = (f ** 2 - 2.0 * resonance * f + 1.0) * rho ** 2

    num = jnp.stack([b0, b1, b2], axis=-1)
    den = jnp.stack([a0, a1, a2], axis=-1)
    return num, den


def sos_frequency_response(
    num: jnp.ndarray, den: jnp.ndarray, z: jnp.ndarray, eps: float = 0.0
) -> jnp.ndarray:
    """Response of a biquad cascade at complex points ``z``.

    ``num``/``den`` have shape (..., n_sections, 3); ``z`` has shape (F,).
    Returns (..., F): prod_i (b0+b1 z^-1 + b2 z^-2)/(a0+a1 z^-1 + a2 z^-2).
    """
    # elementwise polynomial evaluation (VPU, full f32): an einsum over the
    # 3 coefficients would hit the MXU at bf16 default precision on TPU,
    # where the denominator's near-cancellation at DC (a0+a1+a2 ~ 4 f^2 for
    # low cutoffs) rounds to 0 and the division NaNs.
    # STATIC LOOP over sections, accumulating (..., F): a broadcast
    # (..., K, F) intermediate + jnp.prod would materialize K x the output
    # (~1 GB class for the SVF-head flagship, and prod's VJP re-materializes
    # the cumulative products); the loop keeps peak memory at one section
    # and XLA fuses each multiply-accumulate (measured 1.9x on the SVF-head
    # train step end-to-end).
    zinv = (1.0 / z).astype(jnp.complex64)  # (F,)
    zinv2 = zinv * zinv
    k = num.shape[-2]
    h = None
    for i in range(k):
        n = num[..., i, :].astype(jnp.complex64)
        d = den[..., i, :].astype(jnp.complex64)
        sec_num = n[..., 0:1] + n[..., 1:2] * zinv + n[..., 2:3] * zinv2
        sec_den = d[..., 0:1] + d[..., 1:2] * zinv + d[..., 2:3] * zinv2
        sec = sec_num / (sec_den + eps)
        h = sec if h is None else h * sec
    return h


def iir_frequency_response(
    num: jnp.ndarray, den: jnp.ndarray, z: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """Response of direct-form IIR filters at complex points ``z``.

    ``num``/``den``: (..., order) polynomial coefficients in z^-1
    (reference: gain_filters.py:180-198). Returns (..., F).
    """
    # Horner evaluation in z^-1, elementwise (VPU, full f32 — see
    # sos_frequency_response for why no einsum/MXU here)
    order = num.shape[-1]
    zinv = (1.0 / z).astype(jnp.complex64)
    n = num.astype(jnp.complex64)
    d = den.astype(jnp.complex64)
    hnum = n[..., order - 1, None] * jnp.ones_like(zinv)
    hden = d[..., order - 1, None] * jnp.ones_like(zinv)
    for i in range(order - 2, -1, -1):
        hnum = hnum * zinv + n[..., i, None]
        hden = hden * zinv + d[..., i, None]
    return hnum / (hden + eps)


def biquad_freqz(b: jnp.ndarray, a: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Cascade frequency response via rFFT of the coefficients.

    ``b``/``a`` of shape (3, n_sections) (reference: filters/functional.py:11-31).
    """
    if b.ndim < 2:
        b = b[:, None]
    if a.ndim < 2:
        a = a[:, None]
    B = jnp.fft.rfft(b, nfft, axis=0)
    A = jnp.fft.rfft(a, nfft, axis=0)
    return jnp.prod(B, axis=1) / jnp.prod(A, axis=1)


def sosfreqz(sos: jnp.ndarray, nfft: int = 512) -> jnp.ndarray:
    """Cascade response from (n_sections, 6) second-order sections."""
    B = jnp.fft.rfft(sos[:, :3], nfft, axis=-1)
    A = jnp.fft.rfft(sos[:, 3:], nfft, axis=-1)
    return jnp.prod(B, axis=0) / jnp.prod(A, axis=0)


# ------------------------------- RBJ recipes --------------------------------
# Host-side (numpy) versions used by the GEQ designer at init time; the
# formulas follow the public RBJ Audio-EQ-Cookbook as in the reference
# (filters/functional.py:54-330).


def shelving_filter_np(
    fc: float, gain_lin: float, filt_type: str, fs: float
) -> Tuple[np.ndarray, np.ndarray]:
    """First-order-style shelving biquad (low/high) coefficients."""
    omega = 2.0 * np.pi * fc / fs
    t = np.tan(omega / 2.0)
    t2 = t ** 2
    g2 = gain_lin ** 0.5
    g4 = gain_lin ** 0.25
    sqrt2 = np.sqrt(2.0)

    b = np.array(
        [
            g2 * t2 + sqrt2 * t * g4 + 1.0,
            2.0 * g2 * t2 - 2.0,
            g2 * t2 - sqrt2 * t * g4 + 1.0,
        ]
    )
    a = np.array(
        [
            g2 + sqrt2 * t * g4 + t2,
            2.0 * t2 - 2.0 * g2,
            g2 - sqrt2 * t * g4 + t2,
        ]
    )
    b = g2 * b
    if filt_type == "high":
        b, a = a * gain_lin, b
    return b, a


def peak_filter_np(
    fc: float, gain_lin: float, q: float, fs: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Peaking biquad coefficients."""
    omega = 2.0 * np.pi * fc / fs
    bw = omega / q
    t = np.tan(bw / 2.0)
    sg = np.sqrt(gain_lin)
    b = np.array([sg + gain_lin * t, -2.0 * sg * np.cos(omega), sg - gain_lin * t])
    a = np.array([sg + t, -2.0 * sg * np.cos(omega), sg - t])
    return b, a


def lowpass_filter_np(fc: float, fs: float, gain_db: float = 0.0):
    """RBJ lowpass biquad coefficients."""
    omega = 2.0 * np.pi * fc / fs
    alpha = np.sin(omega) / 2.0 * np.sqrt(2.0)
    c = np.cos(omega)
    b = np.array([(1 - c) / 2, 1 - c, (1 - c) / 2]) * 10 ** (gain_db / 20)
    a = np.array([1 + alpha, -2 * c, 1 - alpha])
    return b, a


def highpass_filter_np(fc: float, fs: float, gain_db: float = 0.0):
    """RBJ highpass biquad coefficients."""
    omega = 2.0 * np.pi * fc / fs
    alpha = np.sin(omega) / 2.0 * np.sqrt(2.0)
    c = np.cos(omega)
    b = np.array([(1 + c) / 2, -(1 + c), (1 + c) / 2]) * 10 ** (gain_db / 20)
    a = np.array([1 + alpha, -2 * c, 1 - alpha])
    return b, a


def bandpass_filter_np(fc1: float, fc2: float, fs: float, gain_db: float = 0.0):
    """RBJ constant-skirt bandpass biquad from two corner frequencies."""
    w1 = 2.0 * np.pi * fc1 / fs
    w2 = 2.0 * np.pi * fc2 / fs
    omega = (w1 + w2) / 2.0
    bw_oct = np.log2(fc2 / fc1)
    alpha = np.sin(omega) * np.sinh(
        np.log(2.0) / 2.0 * bw_oct * omega / np.sin(omega)
    )
    c = np.cos(omega)
    b = np.array([alpha, 0.0, -alpha]) * 10 ** (gain_db / 20)
    a = np.array([1 + alpha, -2 * c, 1 - alpha])
    return b, a


def sos_response_np(sos: np.ndarray, freqs_hz: np.ndarray, fs: float) -> np.ndarray:
    """Exact cascade response at arbitrary frequencies (host-side).

    ``sos``: (n_sections, 6). Returns complex response at ``freqs_hz``.
    """
    z = np.exp(1j * 2.0 * np.pi * np.asarray(freqs_hz) / fs)
    zinv = 1.0 / z
    zpow = np.stack([np.ones_like(zinv), zinv, zinv ** 2], axis=0)
    num = sos[:, :3] @ zpow
    den = sos[:, 3:] @ zpow
    return np.prod(num / den, axis=0)


def probe_sos_np(
    sos: np.ndarray, control_freqs: np.ndarray, fs: float
) -> np.ndarray:
    """Magnitude (dB) of each SOS band at the control frequencies.

    ``sos``: (6, n_bands) as produced by the GEQ builder; each band is
    normalized by its a0 (reference: filters/functional.py:352-374, but
    evaluated exactly instead of via FFT+interpolation). Returns
    (len(control_freqs), n_bands) in dB.
    """
    n_bands = sos.shape[-1]
    G = np.zeros((len(control_freqs), n_bands))
    z = np.exp(1j * 2.0 * np.pi * np.asarray(control_freqs) / fs)
    zinv = 1.0 / z
    zpow = np.stack([np.ones_like(zinv), zinv, zinv ** 2], axis=0)
    for band in range(n_bands):
        coeffs = sos[:, band] / sos[3, band]
        h = (coeffs[:3] @ zpow) / (coeffs[3:] @ zpow + 1e-10)
        G[:, band] = 20.0 * np.log10(np.abs(h) + 1e-12)
    return G
