"""JAX STFT and energy-decay-relief utilities (jit-safe, differentiable).

Reference semantics: losses.py:501-575 (torch.stft with hann window,
center=False, one-sided; EDR = cumulative backward energy per frequency bin,
in dB). The per-frame python loop of the reference's ``get_edr_from_stft``
becomes a flip-cumsum-flip.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .basic import db


def stft(
    x: jnp.ndarray,
    win_size: int = 2 ** 12,
    hop_size: int = 2 ** 11,
    window: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One-sided STFT without centering; frames on the last axis.

    ``x``: (..., T). T is zero-padded so full windows tile it exactly,
    then framed with n_frames = (T' - win)//hop + 1 full windows
    (torch.stft center=False semantics). Returns complex
    (..., F, n_frames).
    """
    t = x.shape[-1]
    # pad so the last FULL window fits exactly: tp >= win and
    # (tp - win) % hop == 0 (when hop divides win this is the plain
    # round-up-to-hop-multiple; when it doesn't, rounding to a hop
    # multiple used to over-count frames and gather past the buffer,
    # silently clamping to the final sample)
    pad = max(0, win_size - t)
    pad += (-(t + pad - win_size)) % hop_size
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    tp = x.shape[-1]
    n_frames = (tp - win_size) // hop_size + 1
    if window is None:
        # PERIODIC hann, matching torch.hann_window's default used by the
        # reference (losses.py:523); jnp.hanning alone is the symmetric
        # variant
        window = jnp.hanning(win_size + 1)[:-1].astype(x.dtype)
    if win_size == 2 * hop_size:
        # reshape-based framing (no gather — TPU gathers are slow):
        # consecutive half-window blocks, frame i = blocks[i] ++ blocks[i+1]
        blocks = x.reshape(x.shape[:-1] + (tp // hop_size, hop_size))
        frames = jnp.concatenate(
            [blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1
        )
    else:
        idx = (
            jnp.arange(win_size)[None, :]
            + hop_size * jnp.arange(n_frames)[:, None]
        )
        frames = x[..., idx]
    frames = frames * window  # (..., n_frames, win)
    spec = jnp.fft.rfft(frames, n=win_size, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, n_frames)


def edr_from_stft(s: jnp.ndarray, in_db: bool = True) -> jnp.ndarray:
    """Energy decay relief: EDR[f, m] = sum_{u>=m} |S[f, u]|^2 (optionally dB)."""
    power = jnp.abs(s) ** 2
    edr = jnp.flip(jnp.cumsum(jnp.flip(power, axis=-1), axis=-1), axis=-1)
    return db(edr, is_squared=True) if in_db else edr


def erb_filterbank(
    sample_rate: float,
    nfft: int,
    num_bands: int,
    freq_lims_hz: Tuple[float, float] = (63.0, 16e3),
) -> Tuple[np.ndarray, np.ndarray]:
    """Triangular mel-spaced filterbank over the rFFT grid (host-side).

    Stands in for librosa.filters.mel as used by the reference's ERB-grouped
    EDR loss (losses.py:18-46): triangular filters with Slaney-style area
    normalization on the mel scale.
    """
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    fft_freqs = np.fft.rfftfreq(nfft, d=1.0 / sample_rate)
    mel_pts = np.linspace(
        hz_to_mel(freq_lims_hz[0]), hz_to_mel(freq_lims_hz[1]), num_bands + 2
    )
    hz_pts = mel_to_hz(mel_pts)
    weights = np.zeros((num_bands, len(fft_freqs)))
    for b in range(num_bands):
        lo, ctr, hi = hz_pts[b], hz_pts[b + 1], hz_pts[b + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        weights[b] = np.maximum(0.0, np.minimum(up, down))
        # Slaney normalization: constant energy per band
        weights[b] *= 2.0 / (hi - lo)
    return weights, hz_pts[1:-1]
