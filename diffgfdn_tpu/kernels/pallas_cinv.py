"""Pallas TPU kernel: fused batched Gauss-Jordan complex inverse.

Inverts K independent N x N complex matrices (K ~ 65k rFFT bins, N = 12..27)
in a single VMEM-resident pass per block:

* layout (N, N, K): BINS on the lane axis (128-wide), matrix rows on
  sublanes — each elimination step is pure elementwise/VPU work across 128
  bins at once;
* all N elimination steps run on one block while it sits in VMEM, so HBM
  sees exactly one read + one write of the batch (the pure-XLA formulation
  in kernels/linalg.py re-touches HBM per step);
* complex arithmetic as separate re/im f32 planes (Mosaic-friendly);
* partial pivoting per bin via a sublane argmax + select (no gathers).

``interpret`` defaults to True (the portable interpreter, correct on any
backend). Call sites that KNOW their computation is placed on TPU pass
``interpret=False`` for the compiled kernel — placement is the caller's
knowledge; it must never be inferred from ``jax.default_backend()``, which
lies for computation placed off the process-default platform.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIN_BLOCK = 128  # bins per kernel instance; 256 SIGABRTs this env's Mosaic remote compiler


def _gj_kernel(m_re_ref, m_im_ref, out_re_ref, out_im_ref, aug_re, aug_im, *, n: int):
    bk = m_re_ref.shape[-1]
    two_n = 2 * n

    # build the augmented system [M | I]
    row_ids = lax.broadcasted_iota(jnp.int32, (n, two_n, bk), 1)
    eye_cols = row_ids == (
        lax.broadcasted_iota(jnp.int32, (n, two_n, bk), 0) + n
    )
    aug_re[...] = jnp.concatenate(
        [m_re_ref[...], eye_cols[:, n:, :].astype(jnp.float32)], axis=1
    )
    aug_im[...] = jnp.concatenate(
        [m_im_ref[...], jnp.zeros((n, n, bk), jnp.float32)], axis=1
    )

    row_iota2 = lax.broadcasted_iota(jnp.int32, (n, bk), 0)        # (N, BK)
    row_iota3 = lax.broadcasted_iota(jnp.int32, (n, two_n, bk), 0)  # (N, 2N, BK)

    for k in range(n):  # static unroll: N is tiny
        a_re = aug_re[...]
        a_im = aug_im[...]
        # pivot selection among rows >= k by |column k|
        col_re = a_re[:, k, :]
        col_im = a_im[:, k, :]
        mag = col_re * col_re + col_im * col_im  # (N, BK)
        mag = jnp.where(row_iota2 < k, -1.0, mag)
        p = jnp.argmax(mag, axis=0)  # (BK,)

        is_p2 = row_iota2 == p[None, :]                   # (N, BK)
        is_p3 = row_iota3 == p[None, None, :]             # (N, 2N, BK)
        is_k3 = row_iota3 == k

        # row p per bin via masked reduction (no gathers)
        row_p_re = jnp.sum(jnp.where(is_p3, a_re, 0.0), axis=0)  # (2N, BK)
        row_p_im = jnp.sum(jnp.where(is_p3, a_im, 0.0), axis=0)
        row_k_re = a_re[k, :, :]
        row_k_im = a_im[k, :, :]

        # swap rows k and p (no-op when p == k)
        a_re = jnp.where(is_k3, row_p_re[None], a_re)
        a_im = jnp.where(is_k3, row_p_im[None], a_im)
        swap_back = is_p3 & jnp.logical_not(is_k3)
        a_re = jnp.where(swap_back, row_k_re[None], a_re)
        a_im = jnp.where(swap_back, row_k_im[None], a_im)

        # normalize the pivot row: row_k / pivot (complex division)
        pv_re = a_re[k, k, :]
        pv_im = a_im[k, k, :]
        inv_den = 1.0 / (pv_re * pv_re + pv_im * pv_im)
        nr_re = (a_re[k] * pv_re + a_im[k] * pv_im) * inv_den  # (2N, BK)
        nr_im = (a_im[k] * pv_re - a_re[k] * pv_im) * inv_den

        # eliminate column k from every row (including k; restored below)
        f_re = a_re[:, k, :][:, None, :]  # (N, 1, BK)
        f_im = a_im[:, k, :][:, None, :]
        a_re = a_re - (f_re * nr_re[None] - f_im * nr_im[None])
        a_im = a_im - (f_re * nr_im[None] + f_im * nr_re[None])
        a_re = jnp.where(is_k3, nr_re[None], a_re)
        a_im = jnp.where(is_k3, nr_im[None], a_im)

        aug_re[...] = a_re
        aug_im[...] = a_im

    out_re_ref[...] = aug_re[:, n:, :]
    out_im_ref[...] = aug_im[:, n:, :]


def cinv_pallas(
    m: jnp.ndarray,
    bin_block: int = BIN_BLOCK,
    interpret: bool = True,
) -> jnp.ndarray:
    """Fused batched complex inverse: (K, N, N) complex64 -> same.

    Forward only — wrap with the custom VJP via
    :func:`diffgfdn_tpu.kernels.linalg.cinv_with` for training.
    ``interpret=False`` requires TPU placement (see module docstring).
    """
    k_bins, n, _ = m.shape
    k_pad = int(np.ceil(k_bins / bin_block)) * bin_block

    # (N, N, K) layout: bins on lanes; pad the tail with identity matrices
    m_re = jnp.transpose(jnp.real(m), (1, 2, 0))
    m_im = jnp.transpose(jnp.imag(m), (1, 2, 0))
    if k_pad != k_bins:
        pad = k_pad - k_bins
        eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32)[:, :, None], (n, n, pad))
        m_re = jnp.concatenate([m_re, eye], axis=-1)
        m_im = jnp.concatenate([m_im, jnp.zeros((n, n, pad), jnp.float32)], axis=-1)

    grid = (k_pad // bin_block,)
    spec = pl.BlockSpec((n, n, bin_block), lambda i: (0, 0, i))
    out_re, out_im = pl.pallas_call(
        functools.partial(_gj_kernel, n=n),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, n, k_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 2 * n, bin_block), jnp.float32),
            pltpu.VMEM((n, 2 * n, bin_block), jnp.float32),
        ],
        interpret=interpret,
    )(m_re, m_im)
    inv = (out_re[..., :k_bins] + 1j * out_im[..., :k_bins]).astype(jnp.complex64)
    return jnp.transpose(inv, (2, 0, 1))


def _ptgpt_kernel(p_re, p_im, g_re, g_im, o_re, o_im, *, n: int):
    """out = -(P^T g P^T) per bin, all operands (N, N, BK) in VMEM.

    Two N-step contractions as elementwise FMAs across the 128-bin lane
    axis — XLA lowers these batched tiny complex matmuls to MXU dots with
    poor tiling; here they are pure VPU work in one HBM pass.
    """
    pr, pi = p_re[...], p_im[...]
    gr, gi = g_re[...], g_im[...]
    bk = pr.shape[-1]
    # t[i, j] = sum_m g[i, m] p[j, m]   (= g @ P^T)
    tr = jnp.zeros((n, n, bk), jnp.float32)
    ti = jnp.zeros((n, n, bk), jnp.float32)
    for m in range(n):
        gr_m = gr[:, m, :][:, None, :]
        gi_m = gi[:, m, :][:, None, :]
        pr_m = pr[:, m, :][None, :, :]
        pi_m = pi[:, m, :][None, :, :]
        tr = tr + (gr_m * pr_m - gi_m * pi_m)
        ti = ti + (gr_m * pi_m + gi_m * pr_m)
    # out[i, j] = -sum_l p[l, i] t[l, j]   (= -P^T t)
    our = jnp.zeros((n, n, bk), jnp.float32)
    oui = jnp.zeros((n, n, bk), jnp.float32)
    for l in range(n):
        pr_l = pr[l][:, None, :]
        pi_l = pi[l][:, None, :]
        tr_l = tr[l][None, :, :]
        ti_l = ti[l][None, :, :]
        our = our - (pr_l * tr_l - pi_l * ti_l)
        oui = oui - (pr_l * ti_l + pi_l * tr_l)
    o_re[...] = our
    o_im[...] = oui


def neg_ptgpt_pallas(
    p: jnp.ndarray,
    g: jnp.ndarray,
    bin_block: int = BIN_BLOCK,
    interpret: bool = True,
) -> jnp.ndarray:
    """Fused -(P^T g P^T) for batched (K, N, N) complex64 — the cinv VJP.

    ``interpret=False`` requires TPU placement (see module docstring).
    """
    k_bins, n, _ = p.shape
    k_pad = int(np.ceil(k_bins / bin_block)) * bin_block

    def to_lanes(x):
        x = jnp.transpose(x, (1, 2, 0))
        if k_pad != k_bins:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, k_pad - k_bins)))
        return x

    args = [
        to_lanes(jnp.real(p)), to_lanes(jnp.imag(p)),
        to_lanes(jnp.real(g)), to_lanes(jnp.imag(g)),
    ]
    grid = (k_pad // bin_block,)
    spec = pl.BlockSpec((n, n, bin_block), lambda i: (0, 0, i))
    o_re, o_im = pl.pallas_call(
        functools.partial(_ptgpt_kernel, n=n),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, n, k_pad), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    out = (o_re[..., :k_bins] + 1j * o_im[..., :k_bins]).astype(jnp.complex64)
    return jnp.transpose(out, (2, 0, 1))
