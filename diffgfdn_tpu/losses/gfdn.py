"""GFDN training losses: EDC, EDR, directional EDC, aliasing regularizer.

Reference behaviour: losses.py:63-495, rebuilt as pure jit-safe functions.

TPU-first deltas:
* optional subband EDC filtering multiplies the *spectra* by the band's
  frequency response before the irfft (equivalent circular filtering)
  instead of running a differentiable time-domain IIR over 10^5 samples
  (reference: losses.py:244-262 uses torchaudio.lfilter);
* the aliasing regularizer computes each output-filter IR via irfft of its
  sampled response rather than a time-domain filtfilt pass
  (reference: losses.py:96-106);
* random EDC masks use explicit ``jax.random`` keys.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import db, schroeder_backward_int
from ..ops.stft import edr_from_stft, stft


def scaled_shifted_sigmoid_inverse(
    x: jnp.ndarray, scale_factor: float, cutoff: float, top: float, bottom: float
) -> jnp.ndarray:
    """Reverse sigmoid from ``top`` down to ``bottom`` switching at ``cutoff``."""
    return bottom + (top - bottom) / (1.0 + jnp.exp(scale_factor * (x - cutoff)))


def _edc_pair(
    target_response: jnp.ndarray,
    achieved_response: jnp.ndarray,
    mixing_time_samps: int,
    max_ir_len_samps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """irfft both spectra and truncate to [mixing_time, max_ir_len]."""
    n = 2 * (target_response.shape[-1] - 1)
    end = min(max_ir_len_samps, n)
    target_rir = jnp.fft.irfft(target_response, n, axis=-1)[
        ..., mixing_time_samps:end
    ]
    achieved_rir = jnp.fft.irfft(achieved_response, n, axis=-1)[
        ..., mixing_time_samps:end
    ]
    return target_rir, achieved_rir


def edc_loss(
    target_response: jnp.ndarray,
    achieved_response: jnp.ndarray,
    mixing_time_samps: int,
    max_ir_len_samps: int,
    mask_key: Optional[jax.Array] = None,
    band_responses: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean |dB| difference between Schroeder EDCs of two spectra.

    ``band_responses``: optional (num_bands, F) complex subband filter
    responses — the loss is then summed over per-band filtered versions,
    compared in LINEAR scale and with ``mask_key`` ignored: this mirrors
    the reference's subband branch exactly (losses.py:241-281 accumulates
    ``mean(|edc_t - edc_a|)`` without db() and computes-but-never-applies
    its mask there; only the broadband branch is dB + masked).
    ``mask_key``: optional PRNG key for Bernoulli(U(0,1)) time masking
    (reference: losses.py:149-281). Responses may be (F,) or (B, F).
    """
    if band_responses is not None:
        total = jnp.asarray(0.0)
        for b_idx in range(band_responses.shape[0]):
            resp = band_responses[b_idx]
            t_rir, a_rir = _edc_pair(
                target_response * resp,
                achieved_response * resp,
                mixing_time_samps,
                max_ir_len_samps,
            )
            t_edc = schroeder_backward_int(t_rir)
            a_edc = schroeder_backward_int(a_rir)
            total = total + jnp.mean(jnp.abs(t_edc - a_edc))
        return total

    t_rir, a_rir = _edc_pair(
        target_response, achieved_response, mixing_time_samps, max_ir_len_samps
    )
    t_edc = schroeder_backward_int(t_rir)
    a_edc = schroeder_backward_int(a_rir)
    err = jnp.abs(
        db(t_edc, is_squared=True) - db(a_edc, is_squared=True)
    )
    if mask_key is not None:
        probs = jax.random.uniform(jax.random.fold_in(mask_key, 0), (err.shape[-1],))
        mask = jax.random.bernoulli(jax.random.fold_in(mask_key, 1), probs)
        return jnp.sum(err * mask) / (
            jnp.sum(mask) * np.prod(err.shape[:-1]) + 1e-9
        )
    return jnp.mean(err)


def _directional_edc_from_rir(
    pred_rir: jnp.ndarray,
    amps_true: jnp.ndarray,
    envelopes: jnp.ndarray,
    mask_key: Optional[jax.Array],
) -> jnp.ndarray:
    """Shared EDC comparison: (B, J, T) directional RIRs vs CS envelopes."""
    edc_pred = schroeder_backward_int(pred_rir)
    t = edc_pred.shape[-1]
    edc_true = jnp.einsum(
        "bjk,kt->bjt", amps_true.astype(jnp.float32), envelopes[:, :t]
    )
    err = jnp.abs(
        db(edc_true, is_squared=True) - db(edc_pred, is_squared=True)
    )
    if mask_key is not None:
        probs = jax.random.uniform(jax.random.fold_in(mask_key, 0), (t,))
        mask = jax.random.bernoulli(jax.random.fold_in(mask_key, 1), probs)
        return jnp.sum(err * mask) / (
            jnp.sum(mask) * np.prod(err.shape[:-1]) + 1e-9
        )
    return jnp.mean(err)


def directional_edc_loss(
    h_pred: jnp.ndarray,
    amps_true: jnp.ndarray,
    envelopes: jnp.ndarray,
    mixing_time_samps: int,
    edc_len_samps: int,
    mask_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """EDC error between predicted directional responses and CS envelopes.

    ``h_pred``: (B, J, F) directional transfer functions; ``amps_true``:
    (B, J, num_slopes); ``envelopes``: (num_slopes, T) decay kernels
    (reference: losses.py:284-371).
    """
    n = 2 * (h_pred.shape[-1] - 1)
    pred_rir = jnp.fft.irfft(h_pred, n, axis=-1)[
        ..., mixing_time_samps : edc_len_samps + mixing_time_samps
    ]
    return _directional_edc_from_rir(pred_rir, amps_true, envelopes, mask_key)


def directional_edc_loss_from_sh(
    h_sh: jnp.ndarray,
    analysis_matrix: jnp.ndarray,
    amps_true: jnp.ndarray,
    envelopes: jnp.ndarray,
    mixing_time_samps: int,
    edc_len_samps: int,
    mask_key: Optional[jax.Array] = None,
    use_matmul_irfft: bool = False,
) -> jnp.ndarray:
    """Same loss, fed the SH-domain response (B, L, F) directly.

    The beamforming matrix is linear, so it commutes with the irfft:
    irfft the L = (n+1)^2 SH channels (fewer than the J >= L directions)
    and apply the analysis matrix as a REAL time-domain matmul — identical
    result, ~J/L fewer FFTs and no (B, J, F) complex intermediate.

    ``use_matmul_irfft``: run the irfft as four-step MXU matmuls computing
    ONLY the [mixing_time, edc_len) output window (ops/mxu_fft.py) — a
    TPU-placement assertion like the Pallas kernels.
    """
    n = 2 * (h_sh.shape[-1] - 1)
    lo = mixing_time_samps
    hi = min(edc_len_samps + mixing_time_samps, n)
    if use_matmul_irfft:
        from ..ops.mxu_fft import irfft_matmul

        rir_sh = irfft_matmul(h_sh, n, lo, hi)
    else:
        rir_sh = jnp.fft.irfft(h_sh, n, axis=-1)[..., lo:hi]
    pred_rir = jnp.einsum(
        "jl,blt->bjt",
        jnp.asarray(analysis_matrix, jnp.float32),
        rir_sh,
        precision=jax.lax.Precision.HIGHEST,
    )
    return _directional_edc_from_rir(pred_rir, amps_true, envelopes, mask_key)


def edr_loss(
    target_response: jnp.ndarray,
    achieved_response: jnp.ndarray,
    win_size: int = 2 ** 12,
    hop_size: int = 2 ** 11,
    reduced_pole_radius: Optional[float] = None,
    erb_filters: Optional[jnp.ndarray] = None,
    frequency_weights: Optional[jnp.ndarray] = None,
    layout_barrier: bool = False,
) -> jnp.ndarray:
    """Normalized |dB| EDR difference between two spectra.

    STFT -> backward-cumulative energy per bin -> dB -> |diff|, summed over
    time, optionally frequency-weighted / ERB-grouped, normalized by the
    target EDR's magnitude (reference: losses.py:377-495).
    ``reduced_pole_radius`` undoes sampling outside the unit circle with a
    growing exponential on the achieved IR. ``layout_barrier`` pins default
    layouts on the fft results (multi-device XLA:CPU meshes only — the CPU
    fft thunk RET_CHECKs consumer-pushed batch-major layouts; see
    parallel/band_parallel.py).
    """
    n = 2 * (target_response.shape[-1] - 1)
    target_rir = jnp.fft.irfft(target_response, n, axis=-1)
    achieved_rir = jnp.fft.irfft(achieved_response, n, axis=-1)
    if layout_barrier:
        target_rir = jax.lax.optimization_barrier(target_rir)
        achieved_rir = jax.lax.optimization_barrier(achieved_rir)
    if reduced_pole_radius is not None and reduced_pole_radius != 1.0:
        env = jnp.power(
            1.0 / reduced_pole_radius, jnp.arange(achieved_rir.shape[-1])
        )
        achieved_rir = achieved_rir * env

    s_target = stft(target_rir, win_size, hop_size)
    s_ach = stft(achieved_rir, win_size, hop_size)
    if layout_barrier:
        s_target = jax.lax.optimization_barrier(s_target)
        s_ach = jax.lax.optimization_barrier(s_ach)
    if erb_filters is not None:
        s_target = jnp.einsum("nk,...kt->...nt", erb_filters, jnp.abs(s_target))
        s_ach = jnp.einsum("nk,...kt->...nt", erb_filters, jnp.abs(s_ach))
    target_edr = edr_from_stft(s_target)
    ach_edr = edr_from_stft(s_ach)

    freq_loss = jnp.sum(jnp.abs(target_edr - ach_edr), axis=-1)  # (..., F)
    if frequency_weights is not None:
        freq_loss = freq_loss * frequency_weights
    if target_edr.ndim == 3:
        per_item = jnp.sum(freq_loss, axis=-1) / jnp.sum(
            jnp.abs(target_edr), axis=(-2, -1)
        )
        return jnp.sum(per_item)
    return jnp.sum(freq_loss) / jnp.sum(jnp.abs(target_edr))


def edc_loss_from_rir(
    target_edc_db: jnp.ndarray,
    achieved_rir_trunc: jnp.ndarray,
    mask_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """EDC loss against a PRECOMPUTED target EDC (dB).

    The target EDC is position-dependent but parameter-independent, so the
    trainer computes it once per dataset instead of irfft-ing the target
    spectrum every step (the reference recomputes both sides each step,
    losses.py:201-238). ``achieved_rir_trunc`` is the already-truncated
    time-domain response.
    """
    a_edc = schroeder_backward_int(achieved_rir_trunc)
    err = jnp.abs(target_edc_db - db(a_edc, is_squared=True))
    if mask_key is not None:
        probs = jax.random.uniform(jax.random.fold_in(mask_key, 0), (err.shape[-1],))
        mask = jax.random.bernoulli(jax.random.fold_in(mask_key, 1), probs)
        return jnp.sum(err * mask) / (
            jnp.sum(mask) * np.prod(err.shape[:-1]) + 1e-9
        )
    return jnp.mean(err)


def edr_loss_from_rir(
    target_edr_db: jnp.ndarray,
    target_edr_abs_sum: jnp.ndarray,
    achieved_rir: jnp.ndarray,
    win_size: int = 2 ** 12,
    hop_size: int = 2 ** 11,
    erb_filters: Optional[jnp.ndarray] = None,
    frequency_weights: Optional[jnp.ndarray] = None,
    layout_barrier: bool = False,
) -> jnp.ndarray:
    """EDR loss against a PRECOMPUTED target EDR (dB) and its |.| sum.

    ``achieved_rir`` must already have the reduced-pole-radius envelope
    undone if sampling was off the unit circle. ``layout_barrier``: see
    :func:`edr_loss`.
    """
    s_ach = stft(achieved_rir, win_size, hop_size)
    if layout_barrier:
        s_ach = jax.lax.optimization_barrier(s_ach)
    if erb_filters is not None:
        s_ach = jnp.einsum("nk,...kt->...nt", erb_filters, jnp.abs(s_ach))
    ach_edr = edr_from_stft(s_ach)
    freq_loss = jnp.sum(jnp.abs(target_edr_db - ach_edr), axis=-1)
    if frequency_weights is not None:
        freq_loss = freq_loss * frequency_weights
    if target_edr_db.ndim == 3:
        return jnp.sum(jnp.sum(freq_loss, axis=-1) / target_edr_abs_sum)
    return jnp.sum(freq_loss) / target_edr_abs_sum


def reg_loss(
    biquad_num: jnp.ndarray,
    biquad_den: jnp.ndarray,
    num_time_samps: int,
    layout_barrier: bool = False,
) -> jnp.ndarray:
    """Time-aliasing regularizer on output-filter decay rates.

    ``biquad_num``/``biquad_den``: (B, G, K, 3) cascades. Each cascade's IR
    is obtained by irfft of its response on a num_time_samps grid; the loss
    softmax-weights the late/early |h| energy ratio per batch item
    (Lee et al. DAR; reference: losses.py:63-146). ``layout_barrier``: see
    :func:`edr_loss`.
    """
    from ..ops.biquad import sos_frequency_response

    nfft = num_time_samps
    w = jnp.linspace(0.0, np.pi, nfft // 2 + 1)
    z = jnp.exp(1j * w).astype(jnp.complex64)
    resp = sos_frequency_response(biquad_num, biquad_den, z)  # (B, G, F)
    if layout_barrier:
        # pin a default layout on BOTH sides of the fft (the CPU fft thunk
        # RET_CHECKs non-dim0-major operand layouts)
        resp = jax.lax.optimization_barrier(resp)
    h = jnp.fft.irfft(resp, nfft, axis=-1)
    if layout_barrier:
        h = jax.lax.optimization_barrier(h)
    n0 = int(round(num_time_samps / 8))
    early = jnp.sum(jnp.abs(h[..., :n0]), axis=-1)
    late = jnp.sum(jnp.abs(h[..., num_time_samps - n0 :]), axis=-1)
    gamma = late / (early + 1e-12)  # (B, G)
    weights = jax.nn.softmax(gamma, axis=-1)
    return jnp.sum(jnp.sum(weights * gamma, axis=-1))


def frequency_weighting(
    freqs_hz: np.ndarray,
    cutoff_freq_hz: float = 1e3,
    scale_factor: float = 10 ** (-2.5),
    top: float = 2.0,
    bottom: float = 1.0,
) -> jnp.ndarray:
    """Low-frequency-emphasis weights for the EDR loss (losses.py:419-428).

    Weights fall from ``top`` (below ``cutoff_freq_hz``) to ``bottom``
    (above it). NB the reference's call site (losses.py:426-428) passes
    (bottom, top) into the helper's (top, bottom) slots, so its actual
    weights RISE with frequency, contradicting its own "more weight on
    the lower frequency loss" comment — we implement the documented
    intent, not the swap.
    """
    return scaled_shifted_sigmoid_inverse(
        jnp.asarray(freqs_hz, jnp.float32), scale_factor, cutoff_freq_hz, top, bottom
    )
