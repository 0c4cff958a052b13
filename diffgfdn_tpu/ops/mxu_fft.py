"""MXU-friendly FFTs: batched irfft as four-step matmul transforms.

XLA:TPU lowers ``jnp.fft`` to a serial fft thunk whose throughput on large
1-D transforms is ~150 GFLOP/s — the directional trainer's loss spent 21
of 25 ms in two (144, 131072) transforms (measured, round 3). The MXU
view: a length-``n`` DFT factors as ``n = n1 * n2`` into two BATCHED
matmuls with small DFT matrices plus a twiddle multiply (four-step
Cooley-Tukey) — ~(n1 + n2)/log2(n) more FLOPs, but they run at MXU rates.

Design notes (what made it fast):
* complex matmuls run as ONE real block matmul per step — planes stacked
  along the contraction axis against [[Wr, Wi], [-Wi, Wr]] — instead of
  four separate einsums;
* a length-n irfft is one length-n/2 complex inverse DFT plus O(n)
  twiddles (z[t] = x[2t] + i x[2t+1] packing);
* ``out_start/out_stop`` compute only the needed output rows (the EDC
  losses read ~27% of the IR), shrinking the second matmul and every
  downstream elementwise op.

Pure jnp: autodiff gives the exact transpose with the same MXU structure.
With ``precision=HIGHEST`` the result matches ``np.fft.irfft`` to f32
roundoff (~3e-7 relative at n = 131072).

Derivation (inverse kernel w = exp(+2i pi / m), j = j1*n2 + j2,
t = t2*n1 + t1):

    Z[t2*n1 + t1] = sum_{j2} W2[j2,t2] * T[t1,j2] *
                    sum_{j1} z[j1*n2 + j2] W1[j1,t1]

with W1[j1,t1] = exp(2i pi j1 t1 / n1), W2[j2,t2] = exp(2i pi j2 t2 / n2),
T[t1,j2] = exp(2i pi j2 t1 / m).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def _split(n: int) -> Tuple[int, int]:
    """n = n1 * n2 with n1, n2 near sqrt(n) (n must be a power of two)."""
    assert n & (n - 1) == 0 and n >= 4, "power-of-two length required"
    p = n.bit_length() - 1
    n1 = 1 << ((p + 1) // 2)
    return n1, n // n1


def _block(w: np.ndarray) -> np.ndarray:
    """[[Wr, Wi], [-Wi, Wr]] (2a, 2c) — one real matmul per complex one.

    With planes stacked on the contraction axis ([zr; zi], length 2a),
    the product's two output halves are the result's re/im planes.
    """
    wr, wi = w.real, w.imag
    return np.block([[wr, wi], [-wi, wr]]).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _ifft_constants(m: int, t2_lo: int, t2_hi: int):
    """Constants for the unscaled inverse DFT of length m, restricted to
    output rows t = t2*n1 + t1 with t2 in [t2_lo, t2_hi)."""
    n1, n2 = _split(m)
    w1 = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    t2 = np.arange(t2_lo, t2_hi)
    w2 = np.exp(2j * np.pi * np.outer(np.arange(n2), t2) / n2)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / m)
    return (
        n1,
        n2,
        _block(w1),
        np.ascontiguousarray(tw.real, np.float32),
        np.ascontiguousarray(tw.imag, np.float32),
        _block(w2),
    )


def ifft_matmul_unscaled(
    z: jnp.ndarray,
    m: int,
    t2_lo: int = 0,
    t2_hi: Optional[int] = None,
) -> jnp.ndarray:
    """Unscaled inverse DFT (sum_j z[j] e^{+2i pi jt/m}) over the last axis.

    Returns rows t = t2*n1 + t1 for t2 in [t2_lo, t2_hi) as complex64 of
    shape (..., (t2_hi - t2_lo) * n1); full transform by default.
    """
    n1, n2 = _split(m)
    if t2_hi is None:
        t2_hi = n2
    n1, n2, w1b, twr, twi, w2b = _ifft_constants(m, t2_lo, t2_hi)
    batch = z.shape[:-1]
    zr = jnp.real(z).reshape(batch + (n1, n2)).astype(jnp.float32)
    zi = jnp.imag(z).reshape(batch + (n1, n2)).astype(jnp.float32)
    # step 1 — contract j1: planes stacked on the j1 axis, ONE matmul.
    # A2[..., (t1 | plane), j2] = sum_{j1|plane} Z2[..., (j1 | plane), j2]
    z2 = jnp.concatenate([zr, zi], axis=-2)  # (..., 2 n1, n2)
    a2 = jnp.einsum("...aj,ac->...cj", z2, jnp.asarray(w1b), precision=_HI)
    ar, ai = a2[..., :n1, :], a2[..., n1:, :]
    # step 2 — twiddle T[t1, j2] (elementwise)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # step 3 — contract j2 (minor axis): planes stacked on j2, ONE matmul
    b2 = jnp.concatenate([br, bi], axis=-1)  # (..., n1, 2 n2)
    x2 = jnp.einsum("...cb,bd->...cd", b2, jnp.asarray(w2b), precision=_HI)
    k = t2_hi - t2_lo
    out = jax.lax.complex(x2[..., :k], x2[..., k:])  # (..., t1, t2)
    # Z[t2*n1 + t1]: transpose to (..., t2, t1) then flatten
    return jnp.swapaxes(out, -1, -2).reshape(batch + (k * n1,))


def irfft_matmul(
    h: jnp.ndarray,
    n: int,
    out_start: int = 0,
    out_stop: Optional[int] = None,
) -> jnp.ndarray:
    """``np.fft.irfft(h, n)[..., out_start:out_stop]`` as MXU matmuls.

    ``h``: (..., n//2 + 1) complex half-spectrum, power-of-two ``n``.
    The output window is rounded out to the transform's internal row
    granularity, so exactly ``out_stop - out_start`` samples return.
    """
    m = n // 2
    assert h.shape[-1] == m + 1, (h.shape, n)
    if out_stop is None:
        out_stop = n
    # The matmul factorization needs a power-of-two length (>= 8 so m
    # splits) and a non-empty window; anything else falls back to the
    # native irfft with identical slicing semantics. All static ints, so
    # the branch resolves at trace time.
    if n & (n - 1) or n < 8 or not 0 <= out_start < out_stop <= n:
        return jnp.fft.irfft(h, n, axis=-1)[..., out_start:out_stop]
    h = h.astype(jnp.complex64)
    h_k = h[..., :m]
    h_mk = h[..., m:0:-1]  # H[m-k], k = 0..m-1
    a = 0.5 * (h_k + jnp.conj(h_mk))
    k = jnp.arange(m, dtype=jnp.float32)
    rot = jnp.exp(1j * (2.0 * np.pi / n) * k).astype(jnp.complex64)
    b = (-0.5j) * (jnp.conj(h_mk) - h_k) * rot
    # z[t] = x[2t] + i x[2t+1] = (1/m) * unscaled_ifft(a + b); the output
    # window [out_start, out_stop) maps to z rows t in [start//2, stop//2)
    n1, n2_ = _split(m)
    t2_lo = (out_start // 2) // n1
    t2_hi = min(((out_stop - 1) // 2) // n1 + 1, n2_)
    z = ifft_matmul_unscaled(a + b, m, t2_lo, t2_hi) * (1.0 / m)
    x = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)
    x = x.reshape(h.shape[:-1] + ((t2_hi - t2_lo) * n1 * 2,))
    lo = out_start - t2_lo * n1 * 2
    return x[..., lo : lo + (out_stop - out_start)].astype(jnp.float32)
