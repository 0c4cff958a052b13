"""Orthonormal / paraunitary matrix parametrizations (jit-safe, differentiable).

Covers the reference's feedback-matrix constructions
(feedback_loop.py:16-143) with vectorized JAX equivalents:

* ``skew`` + ``orthogonal_from_skew`` — matrix-exponential orthogonal
  parametrization (works batched over leading axes);
* ``nd_unitary`` — N-D rotation from N(N-1)/2 Givens angles (the recursion in
  the reference becomes a static unrolled product — N here is the number of
  rooms, <= ~4, so trace-time unrolling is cheap and exact);
* ``fir_paraunitary`` — cascade of order-1 Householder factors
  I - (1 - z^-1) v v^T times a unitary matrix, producing an (order, N, N)
  polynomial matrix. The cascade is a static loop of matmuls (MXU friendly)
  rather than generic polynomial matrix convolution;
* ``matrix_convolution`` — general polynomial-matrix product (utils.py:216-239)
  vectorized as a sum over lag diagonals;
* ``is_unitary`` / ``is_paraunitary`` checks for tests (utils.py:242-279).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def skew(x: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric part built from the strict upper triangle of ``x``."""
    a = jnp.triu(x, k=1)
    return a - jnp.swapaxes(a, -1, -2)


def orthogonal_from_skew(x: jnp.ndarray) -> jnp.ndarray:
    """Orthogonal matrix exp(skew(x)); batched over leading axes."""
    s = skew(x)
    if s.ndim == 2:
        return jsl.expm(s)
    flat = s.reshape((-1,) + s.shape[-2:])
    out = jax.vmap(jsl.expm)(flat)
    return out.reshape(s.shape)


def planar_rotation(alpha: jnp.ndarray, n: int, i: int) -> jnp.ndarray:
    """N x N planar rotation in the (i, n-1) plane by angle alpha."""
    eye = jnp.eye(n)
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    r = eye.at[i, i].set(c)
    r = r.at[i, n - 1].set(-s)
    r = r.at[n - 1, i].set(s)
    r = r.at[n - 1, n - 1].set(c)
    return r


def nd_unitary(alpha: jnp.ndarray, n: int) -> jnp.ndarray:
    """N x N rotation matrix from N(N-1)/2 Givens angles.

    U_n = R_{n-2} ... R_0 @ blockdiag(U_{n-1}, 1), built iteratively from
    U_1 = [1] (reference: feedback_loop.py:39-87, recursive). ``n`` is static
    (number of rooms), so the loops unroll at trace time.
    """
    assert alpha.shape[0] == n * (n - 1) // 2
    u = jnp.eye(1)
    for m in range(2, n + 1):
        start = (m - 1) * (m - 2) // 2
        cur = alpha[start : start + (m - 1)]
        rot = jnp.eye(m)
        for i in range(m - 1):
            rot = planar_rotation(cur[i], m, i) @ rot
        big = jnp.eye(m).at[: m - 1, : m - 1].set(u)
        u = rot @ big
    return u


def householder_pu_factor(unit_vector: jnp.ndarray) -> jnp.ndarray:
    """Order-1 paraunitary Householder factor I - (1 - z^-1) v v^T.

    Returns the two polynomial taps stacked as (2, N, N):
    tap0 = I - v v^T, tap1 = v v^T (reference: feedback_loop.py:103-115).
    """
    vv = jnp.outer(unit_vector, unit_vector)
    eye = jnp.eye(unit_vector.shape[0], dtype=vv.dtype)
    return jnp.stack([eye - vv, vv], axis=0)


def fir_paraunitary(
    unitary_matrix: jnp.ndarray, unit_vectors: jnp.ndarray
) -> jnp.ndarray:
    """FIR paraunitary polynomial matrix from Householder factors.

    ``unitary_matrix``: (N, N) zeroth-order unitary; ``unit_vectors``:
    (N, order-1), unit-norm columns. Returns (order, N, N) polynomial taps
    (the reference returns (N, N, order); we keep the polynomial axis leading
    for natural einsum with frequency grids).

    Cascade of K = order-1 two-tap factors: each step convolves the running
    (p, N, N) polynomial with (2, N, N): C[t] = H0 @ P[t] + H1 @ P[t-1]. The
    loop is static (order ~ 32) and each step is a batched matmul.
    """
    n = unitary_matrix.shape[0]
    order = unit_vectors.shape[1] + 1
    poly = jnp.eye(n)[None, :, :]  # (1, N, N)
    for k in range(order - 1):
        h = householder_pu_factor(unit_vectors[:, k])  # (2, N, N)
        ext = jnp.concatenate([poly, jnp.zeros((1, n, n), poly.dtype)], axis=0)
        shifted = jnp.concatenate([jnp.zeros((1, n, n), poly.dtype), poly], axis=0)
        poly = jnp.einsum("ij,tjk->tik", h[0], ext) + jnp.einsum(
            "ij,tjk->tik", h[1], shifted
        )
    # final multiplication by the zeroth-order unitary matrix
    return jnp.einsum("tij,jk->tik", poly, unitary_matrix)


def matrix_convolution(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Product of two polynomial matrices.

    ``a``: (K, M, N), ``b``: (R, N, Q) with polynomial taps on the leading
    axis. Returns (K+R-1, M, Q): C[t] = sum_{u+v=t} A[u] @ B[v].
    (Reference: utils.py:216-239 loops over rows/cols/terms; here each lag is
    a single batched matmul.)
    """
    k = a.shape[0]
    r = b.shape[0]
    out = jnp.zeros((k + r - 1, a.shape[1], b.shape[2]), dtype=jnp.result_type(a, b))
    for u in range(k):
        prod = jnp.einsum("ij,tjk->tik", a[u], b)  # (R, M, Q)
        out = out.at[u : u + r].add(prod)
    return out


def hermitian_conjugate_polynomial_matrix(a: jnp.ndarray) -> jnp.ndarray:
    """For polynomial matrix A(z) (taps leading), compute A(z^-1)^H."""
    return jnp.conj(jnp.flip(a, axis=0)).transpose(0, 2, 1)


def is_unitary(a: jnp.ndarray, max_tol: float = 1e-6) -> Tuple[bool, float]:
    """Check A A^H = I."""
    n = a.shape[0]
    t = a @ jnp.conj(a).T - jnp.eye(n, dtype=a.dtype)
    err = float(jnp.max(jnp.abs(t)))
    return err < max_tol, err


def is_paraunitary(a: jnp.ndarray, max_tol: float = 1e-6) -> Tuple[bool, float]:
    """Check A(z) A(z^-1)^H = I for polynomial matrix (taps leading)."""
    n = a.shape[1]
    p = a.shape[0]
    aconj = hermitian_conjugate_polynomial_matrix(a)
    t = matrix_convolution(a, aconj)
    t = t.at[p - 1].add(-jnp.eye(n, dtype=t.dtype))
    err = float(jnp.max(jnp.abs(t)))
    return err < max_tol, err


def paraunitary_frequency_response(
    poly: jnp.ndarray, z: jnp.ndarray
) -> jnp.ndarray:
    """Evaluate a polynomial matrix at complex points: sum_t P[t] z^{-t}.

    ``poly``: (order, N, N); ``z``: (F,). Returns (F, N, N).
    """
    order = poly.shape[0]
    zinv_pow = (1.0 / z[:, None]) ** jnp.arange(order)[None, :]  # (F, order)
    return jnp.einsum(
        "ft,tij->fij", zinv_pow.astype(jnp.complex64), poly.astype(jnp.complex64)
    )
