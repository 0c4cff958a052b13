"""Pallas TPU kernel: fused biquad-cascade frequency response + VJP.

The SVF output head evaluates K-section biquad cascades at every rFFT bin
for every (batch, group): ``H[r, f] = prod_k P_k(z_f) / Q_k(z_f)`` with
second-order polynomials P, Q in z^-1 whose coefficients are TRACED (they
come from the MLP). The pure-XLA section loop (ops.biquad.
sos_frequency_response) re-reads and re-writes the (R, F) accumulator per
section — ~2K HBM passes forward and more in the VJP. This kernel fuses
all K sections into ONE pass per F-block (rows on sublanes, bins on
lanes, re/im f32 planes), and the backward kernel recomputes the
polynomials in-block and reduces the analytic coefficient gradients

    dL/dn_kj = sum_f Re[ g h z^j / P_k ],
    dL/dd_kj = -sum_f Re[ g h z^j / Q_k ]

(JAX's complex-cotangent convention: no conjugation of g)

into a (R, K*6) accumulator across the sequential TPU grid.

``interpret=True`` (default) is the portable mode; pass ``interpret=False``
only where placement is known-TPU (see kernels.pallas_cinv docstring).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

F_BLOCK = 512  # bins per kernel instance


def _poly_eval(c, zre, zim):
    """(c0 + c1 z + c2 z^2) for real coeff columns c (R, 3) and complex
    z = zre + i zim of shape (1, BF) -> (R, BF) re/im."""
    c0 = c[:, 0:1]
    c1 = c[:, 1:2]
    c2 = c[:, 2:3]
    z2re = zre * zre - zim * zim
    z2im = 2.0 * zre * zim
    pre = c0 + c1 * zre + c2 * z2re
    pim = c1 * zim + c2 * z2im
    return pre, pim


def _fwd_kernel(num_ref, den_ref, zre_ref, zim_ref, hre_ref, him_ref, *, k: int):
    zre = zre_ref[...]
    zim = zim_ref[...]
    r = num_ref.shape[0]
    hre = jnp.ones((r, zre.shape[1]), jnp.float32)
    him = jnp.zeros((r, zre.shape[1]), jnp.float32)
    for i in range(k):  # static unroll over sections
        pre, pim = _poly_eval(num_ref[:, 3 * i : 3 * i + 3], zre, zim)
        qre, qim = _poly_eval(den_ref[:, 3 * i : 3 * i + 3], zre, zim)
        inv = 1.0 / (qre * qre + qim * qim)
        sre = (pre * qre + pim * qim) * inv
        sim = (pim * qre - pre * qim) * inv
        hre, him = hre * sre - him * sim, hre * sim + him * sre
    hre_ref[...] = hre
    him_ref[...] = him


def _bwd_kernel(
    num_ref, den_ref, zre_ref, zim_ref, gre_ref, gim_ref,
    dnum_ref, dden_ref, *, k: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dnum_ref[...] = jnp.zeros_like(dnum_ref)
        dden_ref[...] = jnp.zeros_like(dden_ref)

    zre = zre_ref[...]
    zim = zim_ref[...]
    r = num_ref.shape[0]
    bf = zre.shape[1]

    # PASS 1: recompute h for this block. Pass 2 re-evaluates the cheap
    # section polynomials instead of caching K x 4 inverse planes; note
    # Mosaic's stack liveness for unrolled loops still caps F_BLOCK at 512
    # for this kernel (1024 exceeds the 16M scoped-vmem limit either way,
    # and 512 measures equal end-to-end).
    tiny = 1e-30
    hre = jnp.ones((r, bf), jnp.float32)
    him = jnp.zeros((r, bf), jnp.float32)
    for i in range(k):
        pre, pim = _poly_eval(num_ref[:, 3 * i : 3 * i + 3], zre, zim)
        qre, qim = _poly_eval(den_ref[:, 3 * i : 3 * i + 3], zre, zim)
        iq = 1.0 / jnp.maximum(qre * qre + qim * qim, tiny)
        sre = (pre * qre + pim * qim) * iq
        sim = (pim * qre - pre * qim) * iq
        hre, him = hre * sre - him * sim, hre * sim + him * sre

    # s = g * h (JAX's complex-cotangent convention: dL/dx = Re[g dh/dx],
    # NO conjugation of the cotangent — verified against jax.vjp)
    gre = gre_ref[...]
    gim = gim_ref[...]
    sre = gre * hre - gim * him
    sim = gre * him + gim * hre

    # powers of z: 1, z, z^2
    z2re = zre * zre - zim * zim
    z2im = 2.0 * zre * zim
    pows = ((jnp.ones_like(zre), jnp.zeros_like(zre)), (zre, zim), (z2re, z2im))

    # PASS 2: per-section coefficient gradients. |P|^2 / |Q|^2 are clamped
    # away from zero: the factored form (g h / P_k) is analytically finite
    # at zeros of P_k (they cancel inside h) but numerically 0 * Inf = NaN
    # — e.g. a zero-padded bin (z = 0) of a section with b0 == 0, or a
    # notch zero landing exactly on a sampled bin. Padded bins contribute
    # nothing anyway (their cotangent is zero).
    dn_cols = []
    dd_cols = []
    for i in range(k):
        pre, pim = _poly_eval(num_ref[:, 3 * i : 3 * i + 3], zre, zim)
        qre, qim = _poly_eval(den_ref[:, 3 * i : 3 * i + 3], zre, zim)
        ip = 1.0 / jnp.maximum(pre * pre + pim * pim, tiny)
        iq = 1.0 / jnp.maximum(qre * qre + qim * qim, tiny)
        # t = s / P ;  u = s / Q
        tre = (sre * pre + sim * pim) * ip
        tim = (sim * pre - sre * pim) * ip
        ure = (sre * qre + sim * qim) * iq
        uim = (sim * qre - sre * qim) * iq
        for wre, wim in pows:
            dn_cols.append(jnp.sum(tre * wre - tim * wim, axis=1))  # Re[t z^j]
            dd_cols.append(-jnp.sum(ure * wre - uim * wim, axis=1))
    # assemble (R, 3K) and accumulate across the sequential grid — no
    # scatter ops (Mosaic rejects scatter-add)
    dnum_ref[...] = dnum_ref[...] + jnp.stack(dn_cols, axis=1)
    dden_ref[...] = dden_ref[...] + jnp.stack(dd_cols, axis=1)


def _pad_cols(x, f_pad):
    f = x.shape[-1]
    if f == f_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, f_pad - f)))


def _cascade_fwd_impl(num, den, z_enc, interpret: bool):
    r, k, _ = num.shape
    f = z_enc.shape[0]
    f_pad = int(np.ceil(f / F_BLOCK)) * F_BLOCK
    zre = _pad_cols(z_enc[:, 0][None, :], f_pad)
    zim = _pad_cols(z_enc[:, 1][None, :], f_pad)
    spec_row = pl.BlockSpec((r, 3 * k), lambda i: (0, 0))
    spec_z = pl.BlockSpec((1, F_BLOCK), lambda i: (0, i))
    spec_h = pl.BlockSpec((r, F_BLOCK), lambda i: (0, i))
    hre, him = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=(f_pad // F_BLOCK,),
        in_specs=[spec_row, spec_row, spec_z, spec_z],
        out_specs=(spec_h, spec_h),
        out_shape=(
            jax.ShapeDtypeStruct((r, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((r, f_pad), jnp.float32),
        ),
        interpret=interpret,
    )(num.reshape(r, 3 * k), den.reshape(r, 3 * k), zre, zim)
    return (hre[:, :f] + 1j * him[:, :f]).astype(jnp.complex64)


def _cascade_bwd_impl(num, den, z_enc, g, interpret: bool):
    r, k, _ = num.shape
    f = z_enc.shape[0]
    f_pad = int(np.ceil(f / F_BLOCK)) * F_BLOCK
    zre = _pad_cols(z_enc[:, 0][None, :], f_pad)
    zim = _pad_cols(z_enc[:, 1][None, :], f_pad)
    # zero-padded cotangents: padded bins contribute nothing to the sums
    gre = _pad_cols(jnp.real(g), f_pad)
    gim = _pad_cols(jnp.imag(g), f_pad)
    spec_row = pl.BlockSpec((r, 3 * k), lambda i: (0, 0))
    spec_z = pl.BlockSpec((1, F_BLOCK), lambda i: (0, i))
    spec_g = pl.BlockSpec((r, F_BLOCK), lambda i: (0, i))
    dnum, dden = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(f_pad // F_BLOCK,),
        in_specs=[spec_row, spec_row, spec_z, spec_z, spec_g, spec_g],
        out_specs=(spec_row, spec_row),
        out_shape=(
            jax.ShapeDtypeStruct((r, 3 * k), jnp.float32),
            jax.ShapeDtypeStruct((r, 3 * k), jnp.float32),
        ),
        interpret=interpret,
    )(num.reshape(r, 3 * k), den.reshape(r, 3 * k), zre, zim, gre, gim)
    return dnum.reshape(r, k, 3), dden.reshape(r, k, 3)


@functools.lru_cache(maxsize=None)
def _cascade_for(interpret: bool):
    @jax.custom_vjp
    def cascade(num, den, z_enc):
        return _cascade_fwd_impl(num, den, z_enc, interpret)

    def fwd(num, den, z_enc):
        return _cascade_fwd_impl(num, den, z_enc, interpret), (num, den, z_enc)

    def bwd(res, g):
        num, den, z_enc = res
        dnum, dden = _cascade_bwd_impl(num, den, z_enc, g, interpret)
        return dnum, dden, jnp.zeros_like(z_enc)

    cascade.defvjp(fwd, bwd)
    return cascade


def sos_cascade_response_pallas(
    num: jnp.ndarray,
    den: jnp.ndarray,
    z: jnp.ndarray,
    interpret: bool = True,
) -> jnp.ndarray:
    """Fused cascade response: (..., K, 3) x2 coeffs, (F,) complex z ->
    (..., F) complex64. Differentiable wrt the (real) coefficients.
    Same contract as ops.biquad.sos_frequency_response: the polynomials
    are in z^-1, so the kernel evaluates at 1/z.
    """
    lead = num.shape[:-2]
    k = num.shape[-2]
    r = int(np.prod(lead)) if lead else 1
    # pad rows to a sublane multiple (8) with pass-through sections
    r_pad = int(np.ceil(r / 8)) * 8
    num_r = num.reshape(r, k, 3).astype(jnp.float32)
    den_r = den.reshape(r, k, 3).astype(jnp.float32)
    if r_pad != r:
        unit = jnp.zeros((r_pad - r, k, 3), jnp.float32).at[:, :, 0].set(1.0)
        num_r = jnp.concatenate([num_r, unit], axis=0)
        den_r = jnp.concatenate([den_r, unit], axis=0)
    zinv = (1.0 / z).astype(jnp.complex64)
    z_enc = jnp.stack(
        [jnp.real(zinv), jnp.imag(zinv)], axis=-1
    ).astype(jnp.float32)
    out = _cascade_for(interpret)(num_r, den_r, z_enc)[:r]
    return out.reshape(*lead, z.shape[0])
