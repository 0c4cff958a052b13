"""Common-slopes RIR synthesis: multiband shaped noise -> SRIRs.

Replaces the reference's slope2noise.shaped_wgn usage and the spatial
machinery in spatial_sampling/inference.py:121-294:

* :func:`shaped_wgn_multiband` — octave-band white noise shaped by per-band
  CS energy envelopes, summed through the amplitude-preserving filterbank;
* :func:`spatial_bandlimiting` — Hold-style or covariance-preserving
  band-limitation of directional RIR sets;
* :func:`convert_directional_rirs_to_ambisonics` — synthesis spherical
  filterbank;
* :func:`get_rirs_from_common_slopes_model` — end-to-end CS -> SRIR synth.

The noise shaping runs in JAX (vmapped over positions/directions) with the
PRNG key explicit; filterbank design stays host-side numpy.
"""

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import fftconvolve

from ..config.schema import BeamformerType
from ..ops.basic import LOG10E6
from ..ops.filterbanks import reconstructing_fractional_octave_bands
from ..ops.sph import design_sph_filterbank, modal_weights, repeat_per_order, sh_matrix


def band_noise(
    key: jax.Array,
    shape: Tuple[int, ...],
    n_samples: int,
    band_filters: np.ndarray,
) -> jnp.ndarray:
    """White noise filtered into bands: (..., num_bands, n_samples)."""
    num_bands, filt_len = band_filters.shape
    noise = jax.random.normal(key, shape + (num_bands, n_samples))
    # FFT convolution with each band filter (same filter per band over batch)
    nfft = int(2 ** np.ceil(np.log2(n_samples + filt_len - 1)))
    noise_f = jnp.fft.rfft(noise, nfft, axis=-1)
    filt_f = jnp.fft.rfft(jnp.asarray(band_filters, jnp.float32), nfft, axis=-1)
    out = jnp.fft.irfft(noise_f * filt_f, nfft, axis=-1)
    # compensate the filterbank's linear-phase group delay
    delay = filt_len // 2
    return out[..., delay : delay + n_samples]


def shaped_wgn_multiband(
    decay_times: np.ndarray,
    amplitudes: np.ndarray,
    sample_rate: float,
    n_samples: int,
    f_bands: List[float],
    key: jax.Array,
    fir_len: int = 2 ** 12,
) -> np.ndarray:
    """Common-slopes RIRs as octave-band shaped white noise.

    ``decay_times``: (num_slopes,) broadband or (num_slopes, num_bands);
    ``amplitudes``: (num_pos, num_slopes, num_bands). Returns
    (num_pos, n_samples): sum over bands of band-filtered noise scaled by
    sqrt(per-band CS energy envelope).
    """
    amplitudes = np.asarray(amplitudes, np.float32)
    num_pos, num_slopes, num_bands = amplitudes.shape
    decay_times = np.asarray(decay_times, np.float32)
    if decay_times.ndim == 1:
        decay_times = np.repeat(decay_times[:, None], num_bands, axis=1)

    filters, centers = reconstructing_fractional_octave_bands(
        num_fractions=1,
        frequency_range=(min(f_bands), max(f_bands)),
        n_samples=fir_len,
        sampling_rate=sample_rate,
    )
    # select filters nearest the requested bands
    idx = [int(np.argmin(np.abs(centers - fc))) for fc in f_bands]
    filters = filters[idx]

    t = np.arange(n_samples, dtype=np.float32) / sample_rate
    # (num_bands, num_slopes, T)
    env_kernel = np.exp(
        -t[None, None, :] * (LOG10E6 / decay_times.T[:, :, None])
    )
    # (num_pos, num_bands, T) energy envelopes
    env = np.einsum("pkb,bkt->pbt", amplitudes, env_kernel)
    env = np.maximum(env, 0.0)

    noise = band_noise(key, (num_pos,), n_samples, filters)
    rirs = jnp.sum(noise * jnp.sqrt(jnp.asarray(env)), axis=-2)
    return np.asarray(rirs)


def spatial_bandlimiting(
    ambi_order: int,
    des_dir: np.ndarray,
    drirs: np.ndarray,
    modal_weights_n: np.ndarray,
    method: str = "custom",
) -> np.ndarray:
    """Spatially band-limit directional RIRs (Hold et al. / custom).

    ``des_dir``: (2, J) (azi, elevation); ``drirs``:
    (num_directions, num_pos, T). 'custom' preserves total energy via a
    covariance-derived normalization (reference:
    spatial_sampling/inference.py:121-164).
    """
    y = sh_matrix(ambi_order, des_dir[0, :], np.pi / 2 - des_dir[1, :])
    des_cov = y @ np.diag(repeat_per_order(modal_weights_n)) @ y.T  # (J, J)

    if method == "Hold":
        mult = des_cov / np.sum(des_cov, axis=1, keepdims=True)
        return np.einsum("jk,krt->jrt", mult, drirs)

    est_cov = np.einsum("jrt,krt->jkr", drirs, np.conj(drirs)) / drirs.shape[-1]
    denom = np.einsum("ij,jkr,kl->ilr", des_cov, est_cov, np.conj(des_cov.T))
    norm = np.sqrt(
        np.trace(est_cov, axis1=0, axis2=1) / np.trace(denom, axis1=0, axis2=1)
    )
    mult = np.einsum("jk,r->jkr", des_cov, norm)
    out = np.einsum("jkr,krt->jrt", mult, drirs)
    return out


def convert_directional_rirs_to_ambisonics(
    ambi_order: int,
    desired_directions: np.ndarray,
    beamformer_type: Optional[BeamformerType],
    directional_rirs: np.ndarray,
    apply_spatial_bandlimiting: bool = False,
    bandlimit_method: str = "custom",
) -> np.ndarray:
    """Directional RIRs -> ambisonic RIRs via the synthesis filterbank.

    ``directional_rirs``: (num_directions, num_pos, T); returns
    (num_pos, (N+1)^2, T) (reference: spatial_sampling/inference.py:167-215).
    """
    c_n = modal_weights(beamformer_type, ambi_order)
    drirs = directional_rirs
    if apply_spatial_bandlimiting:
        drirs = spatial_bandlimiting(
            ambi_order, desired_directions, drirs, c_n, bandlimit_method
        )
    _, synthesis = design_sph_filterbank(
        ambi_order,
        desired_directions[0, :],
        np.pi / 2 - desired_directions[1, :],
        c_n,
        mode="energy",
    )
    # synthesis is (J, Q): x_sh = B^T s
    ambi = np.einsum("jn,jbt->nbt", synthesis, drirs)
    return ambi.transpose(1, 0, 2)


def get_rirs_from_common_slopes_model(
    sample_rate: float,
    rec_pos_list: np.ndarray,
    freq_bands: List[float],
    ir_len_samps: int,
    amplitudes: np.ndarray,
    common_decay_times: np.ndarray,
    ambi_order: Optional[int] = None,
    des_directions: Optional[np.ndarray] = None,
    beamformer_type: Optional[BeamformerType] = None,
    apply_spatial_bandlimiting: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """CS amplitudes -> omni or ambisonic RIRs via shaped noise.

    ``amplitudes``: (num_pos, num_slopes, num_bands) omni, or
    (num_pos, num_directions, num_slopes, num_bands) directional
    (reference: spatial_sampling/inference.py:218-294).
    ``common_decay_times``: (num_slopes,) broadband, or 2-D in the
    DATASET layout (num_bands, num_slopes) — the square num_bands ==
    num_slopes case is resolved as the dataset layout, not by a shape
    heuristic (which silently mis-paired each band's T60s).
    """
    key = jax.random.PRNGKey(seed)
    cdt = np.asarray(common_decay_times)
    nb, ns = len(freq_bands), amplitudes.shape[-2]
    if cdt.ndim == 1:
        cdt_slopes = cdt  # (S,): broadband slopes
    elif cdt.shape == (nb, ns):
        cdt_slopes = cdt.T  # dataset layout -> (S, B)
    elif cdt.shape == (ns, nb):
        cdt_slopes = cdt
    else:
        raise ValueError(
            f"common_decay_times shape {cdt.shape} matches neither "
            f"(num_bands={nb}, num_slopes={ns}) nor its transpose"
        )

    if ambi_order is not None:
        num_dirs = des_directions.shape[-1]
        num_pos = rec_pos_list.shape[0]
        drirs = np.zeros((num_dirs, num_pos, ir_len_samps), np.float32)
        for j in range(num_dirs):
            drirs[j] = shaped_wgn_multiband(
                cdt_slopes,
                amplitudes[:, j],
                sample_rate,
                ir_len_samps,
                freq_bands,
                jax.random.fold_in(key, j),
            )
        return convert_directional_rirs_to_ambisonics(
            ambi_order,
            des_directions,
            beamformer_type,
            drirs,
            apply_spatial_bandlimiting=apply_spatial_bandlimiting,
        )
    return shaped_wgn_multiband(
        cdt_slopes, amplitudes, sample_rate, ir_len_samps, freq_bands, key
    )


def calculate_energy_envelope(
    signal: np.ndarray, sample_rate: float, win_len_ms: float = 20.0
) -> np.ndarray:
    """Short-time mean-square envelope with a Hann window (host-side).

    Replaces slope2noise.calculate_energy_envelope (sound_examples.py:13).
    """
    wl = max(int(win_len_ms * 1e-3 * sample_rate), 2)
    win = np.hanning(wl)
    win = win / win.sum()
    flat = signal.reshape(-1, signal.shape[-1])
    env = np.stack(
        [fftconvolve(x ** 2, win, mode="same") for x in flat], axis=0
    )
    return env.reshape(signal.shape)
