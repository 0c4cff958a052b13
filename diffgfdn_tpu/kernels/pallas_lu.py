"""Pallas TPU kernel: fused batched single-RHS LU solve (pivoted).

The Gauss-Jordan inverse kernel (pallas_cinv.py) does ~2N^3 complex FMAs
per system on a width-2N augmented block. When only ``x = M^-1 b`` is
needed — every ``FeedbackLoop.drive`` call, i.e. all scalar-head and
directional training steps — a pivoted LU factorization touching ONLY the
shrinking active block does ~N^3/3: forward elimination with static
(Python-unrolled) slice bounds, then an O(N^2) back-substitution. At the
directional scale (65k bins, N = 27) the fused solve drops from ~18.7 ms
to a fraction (measured in BASELINE.md).

Pivoting uses the PRODUCT FORM: at step k only the active block
(rows k.., cols k..) and the RHS are swapped — the already-stored L
factors stay put. The factorization is then

    A = S_0 (I + f_0 e_0^T) ... S_{n-1} (I + f_{n-1} e_{n-1}^T) U

(S_k = the row-k/p_k swap, f_k = the stored multiplier column), which
solves forward as ``rhs <- E_k S_k rhs`` during elimination, and gives the
TRANSPOSED solve (the custom-VJP cotangent, JAX's plain-transpose
convention) from the same packed factors:

    A^T y = g:   solve U^T w = g (forward substitution), then for
    k = n-1..0:  w[k] -= f_k^T w,  swap w[k] <-> w[p_k].

Both kernels keep the (N, N, BK) bins-on-lanes layout of pallas_cinv, all
slice bounds static (this environment's Mosaic compiler rejects
dynamic-start vector stores), per-bin row selection as masked reductions.
``interpret=False`` is a TPU-placement assertion by the caller (see
pallas_cinv.py — never infer placement from ``jax.default_backend()``).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cinv import BIN_BLOCK


def _lu_solve_kernel(
    m_re_ref, m_im_ref, b_re_ref, b_im_ref,
    x_re_ref, x_im_ref, lu_re, lu_im, piv_ref,
    rhs_re, rhs_im, *, n: int,
):
    bk = m_re_ref.shape[-1]
    lu_re[...] = m_re_ref[...]
    lu_im[...] = m_im_ref[...]
    rhs_re[...] = b_re_ref[...]
    rhs_im[...] = b_im_ref[...]

    for k in range(n):  # static unroll: N is tiny
        nk = n - k
        ar = lu_re[k:, k:, :]  # active block (nk, nk, BK)
        ai = lu_im[k:, k:, :]
        rr = rhs_re[k:, :]     # active rhs (nk, BK)
        ri = rhs_im[k:, :]

        # pivot: max |column k| among active rows
        cr = ar[:, 0, :]
        ci = ai[:, 0, :]
        pm = jnp.argmax(cr * cr + ci * ci, axis=0)  # (BK,) in [0, nk)
        piv_ref[k, :] = (pm + k).astype(jnp.int32)

        rows2 = lax.broadcasted_iota(jnp.int32, (nk, bk), 0)
        is_p2 = rows2 == pm[None, :]
        is_p3 = is_p2[:, None, :]
        # pivot row / rhs via masked reduction (no gathers)
        prow_r = jnp.sum(jnp.where(is_p3, ar, 0.0), axis=0)  # (nk, BK)
        prow_i = jnp.sum(jnp.where(is_p3, ai, 0.0), axis=0)
        prhs_r = jnp.sum(jnp.where(is_p2, rr, 0.0), axis=0)  # (BK,)
        prhs_i = jnp.sum(jnp.where(is_p2, ri, 0.0), axis=0)

        # U row k = the pivot row; rhs row k = the pivot rhs
        lu_re[k, k:, :] = prow_r
        lu_im[k, k:, :] = prow_i
        rhs_re[k, :] = prhs_r
        rhs_im[k, :] = prhs_i
        if nk == 1:
            break

        # swap the old row k into position p (rows below k only; when
        # p == k the pivot row was row k and nothing moves)
        krow_r = ar[0]  # (nk, BK)
        krow_i = ai[0]
        is_first3 = (
            lax.broadcasted_iota(jnp.int32, (nk, nk, bk), 0) == 0
        )
        swap_back3 = is_p3 & jnp.logical_not(is_first3)
        swap_back2 = is_p2 & (rows2 > 0)
        sr = jnp.where(swap_back3, krow_r[None], ar)[1:]  # (nk-1, nk, BK)
        si = jnp.where(swap_back3, krow_i[None], ai)[1:]
        trr = jnp.where(swap_back2, rr[0][None], rr)[1:]  # (nk-1, BK)
        tri = jnp.where(swap_back2, ri[0][None], ri)[1:]

        # multipliers f = (swapped column k) / pivot
        pr = prow_r[0]
        pi = prow_i[0]
        inv_den = 1.0 / (pr * pr + pi * pi)
        ipr = pr * inv_den
        ipi = -pi * inv_den
        c1r = sr[:, 0, :]
        c1i = si[:, 0, :]
        fr = c1r * ipr - c1i * ipi  # (nk-1, BK)
        fi = c1r * ipi + c1i * ipr
        lu_re[k + 1 :, k, :] = fr
        lu_im[k + 1 :, k, :] = fi

        # trailing update: rows k+1.., cols k+1..  -=  f (x) U-row-k
        ur = prow_r[1:][None]  # (1, nk-1, BK)
        ui = prow_i[1:][None]
        fr3 = fr[:, None, :]
        fi3 = fi[:, None, :]
        lu_re[k + 1 :, k + 1 :, :] = sr[:, 1:, :] - (fr3 * ur - fi3 * ui)
        lu_im[k + 1 :, k + 1 :, :] = si[:, 1:, :] - (fr3 * ui + fi3 * ur)
        rhs_re[k + 1 :, :] = trr - (fr * prhs_r - fi * prhs_i)
        rhs_im[k + 1 :, :] = tri - (fr * prhs_i + fi * prhs_r)

    # back substitution: x[k] = (rhs[k] - sum_{j>k} U[k,j] x[j]) / U[k,k]
    for k in range(n - 1, -1, -1):
        ur = lu_re[k, k:, :]  # (n-k, BK)
        ui = lu_im[k, k:, :]
        num_r = rhs_re[k, :]
        num_i = rhs_im[k, :]
        if k < n - 1:
            xr = x_re_ref[k + 1 :, :]
            xi = x_im_ref[k + 1 :, :]
            num_r = num_r - jnp.sum(ur[1:] * xr - ui[1:] * xi, axis=0)
            num_i = num_i - jnp.sum(ur[1:] * xi + ui[1:] * xr, axis=0)
        dr = ur[0]
        di = ui[0]
        inv_den = 1.0 / (dr * dr + di * di)
        x_re_ref[k, :] = (num_r * dr + num_i * di) * inv_den
        x_im_ref[k, :] = (num_i * dr - num_r * di) * inv_den


def _lut_apply_kernel(
    lu_re_ref, lu_im_ref, piv_ref, g_re_ref, g_im_ref,
    y_re_ref, y_im_ref, *, n: int,
):
    """Transposed solve M^T y = g from the packed product-form factors."""
    bk = g_re_ref.shape[-1]
    y_re_ref[...] = g_re_ref[...]
    y_im_ref[...] = g_im_ref[...]

    # stage 1: U^T w = g (forward substitution, running column updates)
    for k in range(n):
        ur = lu_re_ref[k, k:, :]  # U row k, active cols (n-k, BK)
        ui = lu_im_ref[k, k:, :]
        dr = ur[0]
        di = ui[0]
        inv_den = 1.0 / (dr * dr + di * di)
        wr = y_re_ref[k, :]
        wi = y_im_ref[k, :]
        wkr = (wr * dr + wi * di) * inv_den
        wki = (wi * dr - wr * di) * inv_den
        y_re_ref[k, :] = wkr
        y_im_ref[k, :] = wki
        if k < n - 1:
            y_re_ref[k + 1 :, :] = y_re_ref[k + 1 :, :] - (
                ur[1:] * wkr - ui[1:] * wki
            )
            y_im_ref[k + 1 :, :] = y_im_ref[k + 1 :, :] - (
                ur[1:] * wki + ui[1:] * wkr
            )

    # stage 2: w <- S_k (I - e_k f_k^T) w for k = n-1..0
    rows_n = lax.broadcasted_iota(jnp.int32, (n, bk), 0)
    for k in range(n - 1, -1, -1):
        if k < n - 1:
            fr = lu_re_ref[k + 1 :, k, :]  # (n-k-1, BK)
            fi = lu_im_ref[k + 1 :, k, :]
            xr = y_re_ref[k + 1 :, :]
            xi = y_im_ref[k + 1 :, :]
            y_re_ref[k, :] = y_re_ref[k, :] - jnp.sum(
                fr * xr - fi * xi, axis=0
            )
            y_im_ref[k, :] = y_im_ref[k, :] - jnp.sum(
                fr * xi + fi * xr, axis=0
            )
        p = piv_ref[k, :]  # (BK,) absolute pivot row, >= k
        is_p = rows_n == p[None, :]
        is_k = rows_n == k
        wr = y_re_ref[...]
        wi = y_im_ref[...]
        vp_r = jnp.sum(jnp.where(is_p, wr, 0.0), axis=0)  # (BK,)
        vp_i = jnp.sum(jnp.where(is_p, wi, 0.0), axis=0)
        vk_r = wr[k]
        vk_i = wi[k]
        swap_back = is_p & jnp.logical_not(is_k)
        y_re_ref[...] = jnp.where(
            is_k, vp_r[None], jnp.where(swap_back, vk_r[None], wr)
        )
        y_im_ref[...] = jnp.where(
            is_k, vp_i[None], jnp.where(swap_back, vk_i[None], wi)
        )


def _to_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """(K, ...) -> (..., K): bins to the minor (lane) axis."""
    return jnp.moveaxis(x, 0, -1)


def lu_solve_pallas(
    m: jnp.ndarray,
    b: jnp.ndarray,
    bin_block: int = BIN_BLOCK,
    interpret: bool = True,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Fused single-RHS solve: (K, N, N), (K, N) complex64 -> (K, N).

    Returns ``(x, (lu_re, lu_im, piv))`` — the packed product-form factors
    feed :func:`lut_apply_pallas` for the transposed (cotangent) solve.
    Forward only; training wraps it via kernels.linalg (custom VJP).
    """
    k_bins, n, _ = m.shape
    k_pad = int(np.ceil(k_bins / bin_block)) * bin_block

    m_re = _to_lanes(jnp.real(m))
    m_im = _to_lanes(jnp.imag(m))
    b_re = _to_lanes(jnp.real(b).astype(jnp.float32))
    b_im = _to_lanes(jnp.imag(b).astype(jnp.float32))
    if k_pad != k_bins:
        pad = k_pad - k_bins
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=jnp.float32)[:, :, None], (n, n, pad)
        )
        m_re = jnp.concatenate([m_re, eye], axis=-1)
        m_im = jnp.pad(m_im, ((0, 0), (0, 0), (0, pad)))
        b_re = jnp.pad(b_re, ((0, 0), (0, pad)))
        b_im = jnp.pad(b_im, ((0, 0), (0, pad)))

    grid = (k_pad // bin_block,)
    spec3 = pl.BlockSpec((n, n, bin_block), lambda i: (0, 0, i))
    spec2 = pl.BlockSpec((n, bin_block), lambda i: (0, i))
    x_re, x_im, lu_re, lu_im, piv = pl.pallas_call(
        functools.partial(_lu_solve_kernel, n=n),
        grid=grid,
        in_specs=[spec3, spec3, spec2, spec2],
        out_specs=(spec2, spec2, spec3, spec3, spec2),
        out_shape=(
            jax.ShapeDtypeStruct((n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, bin_block), jnp.float32),
            pltpu.VMEM((n, bin_block), jnp.float32),
        ],
        interpret=interpret,
    )(m_re, m_im, b_re, b_im)
    x = (x_re[:, :k_bins] + 1j * x_im[:, :k_bins]).astype(jnp.complex64)
    return jnp.moveaxis(x, -1, 0), (lu_re, lu_im, piv)


def lut_apply_pallas(
    factors: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    g: jnp.ndarray,
    bin_block: int = BIN_BLOCK,
    interpret: bool = True,
) -> jnp.ndarray:
    """y = M^-T g from :func:`lu_solve_pallas` factors; g, y: (K, N)."""
    lu_re, lu_im, piv = factors
    n, k_pad = piv.shape
    k_bins = g.shape[0]

    g_re = _to_lanes(jnp.real(g).astype(jnp.float32))
    g_im = _to_lanes(jnp.imag(g).astype(jnp.float32))
    if k_pad != k_bins:
        pad = k_pad - k_bins
        g_re = jnp.pad(g_re, ((0, 0), (0, pad)))
        g_im = jnp.pad(g_im, ((0, 0), (0, pad)))

    grid = (k_pad // bin_block,)
    spec3 = pl.BlockSpec((n, n, bin_block), lambda i: (0, 0, i))
    spec2 = pl.BlockSpec((n, bin_block), lambda i: (0, i))
    y_re, y_im = pl.pallas_call(
        functools.partial(_lut_apply_kernel, n=n),
        grid=grid,
        in_specs=[spec3, spec3, spec2, spec2, spec2],
        out_specs=(spec2, spec2),
        out_shape=(
            jax.ShapeDtypeStruct((n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, k_pad), jnp.float32),
        ),
        interpret=interpret,
    )(lu_re, lu_im, piv, g_re, g_im)
    y = (y_re[:, :k_bins] + 1j * y_im[:, :k_bins]).astype(jnp.complex64)
    return jnp.moveaxis(y, -1, 0)
