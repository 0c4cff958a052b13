"""Spatial-sampling (common slopes) losses.

Reference behaviour: spatial_sampling/losses.py:12-168 as pure functions;
the smoothness kernel is precomputed host-side once per dataset.
"""


import jax.numpy as jnp
import numpy as np

from ..ops.basic import db, decay_kernel


def spatial_mse_loss(amps_pred: jnp.ndarray, amps_true: jnp.ndarray) -> jnp.ndarray:
    """Mean |dB| error between predicted/true CS amplitudes, summed over slopes."""
    loss = jnp.mean(jnp.abs(db(amps_pred) - db(amps_true)), axis=0)
    return jnp.sum(loss)


def make_decay_envelopes(
    common_decay_times: np.ndarray, edc_len_samps: int, fs: float
) -> jnp.ndarray:
    """(num_slopes, T) normalized decay kernels for the spatial EDC loss."""
    t_axis = np.arange(edc_len_samps) / fs
    env = decay_kernel(
        np.asarray(common_decay_times).reshape(-1),
        t_axis,
        normalize_envelope=True,
    )
    return jnp.asarray(env.T, jnp.float32)  # (num_slopes, T)


def spatial_edc_loss(
    amps_pred: jnp.ndarray, amps_true: jnp.ndarray, envelopes: jnp.ndarray
) -> jnp.ndarray:
    """EDC error between CS-amplitude-weighted decay kernels.

    Omni: amplitudes (B, num_slopes) -> per-slope envelopes compared in dB,
    averaged over batch/time and summed over slopes. Directional:
    (B, J, num_slopes) -> summed over slopes first, mean |dB| error.
    """
    if amps_true.ndim == 2:
        edc_true = db(
            jnp.einsum("bk,kt->bkt", amps_true, envelopes), is_squared=True
        )
        edc_pred = db(
            jnp.einsum("bk,kt->bkt", amps_pred, envelopes), is_squared=True
        )
        return jnp.sum(jnp.mean(jnp.abs(edc_true - edc_pred), axis=(0, -1)))
    edc_true = db(jnp.einsum("bjk,kt->bjt", amps_true, envelopes), is_squared=True)
    edc_pred = db(jnp.einsum("bjk,kt->bjt", amps_pred, envelopes), is_squared=True)
    return jnp.mean(jnp.abs(edc_true - edc_pred))


def make_smoothness_kernel(all_receiver_pos: np.ndarray) -> np.ndarray:
    """Row-normalized RBF affinity over receiver pairs (sigma = 1/sqrt(2))."""
    pos = np.asarray(all_receiver_pos, np.float64)
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    sigma = 1.0 / np.sqrt(2.0)
    k = np.exp(-(d ** 2) / (2.0 * sigma ** 2))
    k = k / (k.sum(axis=1, keepdims=True) + 1e-10)
    return k.astype(np.float32)


def find_position_idx(
    all_receiver_pos: jnp.ndarray, cur_positions: jnp.ndarray
) -> jnp.ndarray:
    """Index of each batch position in the full receiver list (nearest match)."""
    d2 = jnp.sum(
        (all_receiver_pos[None, :, :] - cur_positions[:, None, :]) ** 2, axis=-1
    )
    return jnp.argmin(d2, axis=1)


def spatial_smoothness_loss(
    kernel_weights: jnp.ndarray,
    pos_idx: jnp.ndarray,
    cur_weights: jnp.ndarray,
) -> jnp.ndarray:
    """NEGATIVE kernel-weighted pairwise weight distance (encourages variation).

    ``kernel_weights``: full (M, M) affinity; ``pos_idx``: (B,) dataset
    indices of the batch positions; ``cur_weights``: (B, num_slopes, D)
    beamformer weights (reference: spatial_sampling/losses.py:25-106).
    """
    kw = kernel_weights[pos_idx][:, pos_idx]  # (B, B)
    w = jnp.transpose(cur_weights, (1, 0, 2))  # (num_slopes, B, D)
    # pairwise euclidean distances per slope: (num_slopes, B, B)
    d2 = (
        jnp.sum(w ** 2, axis=-1)[:, :, None]
        + jnp.sum(w ** 2, axis=-1)[:, None, :]
        - 2.0 * jnp.einsum("kbd,kpd->kbp", w, w)
    )
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    return -jnp.sum(jnp.einsum("kbp,bp->k", dist, kw))
