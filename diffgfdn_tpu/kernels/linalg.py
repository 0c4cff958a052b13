"""Batched small complex inverse/solve for the FDN feedback loop.

The hottest kernel in training is inverting (D(z) Gamma^-1(z) - A(z)) at
every rFFT bin — K ~ 65k independent N x N complex matrices with N = 12..27
(reference: feedback_loop.py:376-391 uses torch.linalg.inv on complex64).

TPU-native strategy: **batched Gauss-Jordan elimination with partial
pivoting, unrolled over the (static, tiny) matrix dimension** — every step
is an elementwise rank-1 update over the huge bin batch, which maps
perfectly onto the VPU. XLA's stock `linalg.inv`/`solve` lower to batched
LU whose sequential triangular solves run ~1.3 s for this workload on the
TPU backend here; the Gauss-Jordan formulation is two orders of magnitude
faster (measured) and differentiates cleanly (it's plain jnp arithmetic).

Complex arithmetic stays native complex64 inside the program (the jit
boundary carries re/im pairs — see diffgfdn_tpu.utils.cio).
"""

import functools

import jax
import jax.numpy as jnp


def _gauss_jordan(aug: jnp.ndarray, n: int) -> jnp.ndarray:
    """Row-reduce augmented batch (..., N, N+R) to (..., N, R) solution.

    Partial pivoting per elimination step: the pivot row is chosen by
    max |column| among the not-yet-eliminated rows. Row selection and swap
    are masked reductions/selects — TPU gathers (take_along_axis) measured
    noticeably slower than a masked sum over the tiny row axis.
    """
    row_idx = jnp.arange(n)
    for k in range(n):
        # pivot selection among rows >= k
        col = jnp.abs(aug[..., :, k])
        col = jnp.where(row_idx < k, -1.0, col)
        p = jnp.argmax(col, axis=-1)  # (...,)

        is_k = (row_idx == k)[:, None]
        is_p = (row_idx[None, :] == p[..., None])[..., :, None]
        # row p via masked reduction over the (tiny) row axis — no gather
        row_p = jnp.sum(jnp.where(is_p, aug, 0.0), axis=-2, keepdims=True)
        row_k = aug[..., k : k + 1, :]
        aug = jnp.where(is_k, row_p, aug)
        aug = jnp.where(is_p & ~is_k, row_k, aug)

        # normalize pivot row, eliminate the column everywhere else
        pivot = aug[..., k : k + 1, k : k + 1]
        norm_row = aug[..., k : k + 1, :] / pivot
        factors = aug[..., :, k : k + 1]
        aug = aug - factors * norm_row
        aug = jnp.where(is_k, norm_row, aug)
    return aug[..., n:]


def _cinv_impl(m: jnp.ndarray) -> jnp.ndarray:
    n = m.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=m.dtype), m.shape)
    aug = jnp.concatenate([m, eye], axis=-1)
    return _gauss_jordan(aug, n)


@jax.custom_vjp
def cinv(m: jnp.ndarray) -> jnp.ndarray:
    """Batched complex matrix inverse, (..., N, N) -> (..., N, N).

    Custom VJP: differentiating through the unrolled elimination would emit
    a long chain of scatter ops in the backward pass (~1 s measured); the
    analytic rule d(M^-1) = -M^-1 dM M^-1 turns it into two batched matmuls.
    """
    return _cinv_impl(m)


def _cinv_fwd(m):
    p = _cinv_impl(m)
    return p, p


def _cinv_bwd(p, g):
    # transpose of the JVP dP = -P dM P (JAX's linear-transpose convention
    # for complex: plain transpose, no conjugation).
    # explicit f32 precision: TPU's default matmul precision is bf16, which
    # would put ~0.7% noise on every gradient through the inverse
    pt = jnp.swapaxes(p, -1, -2)
    t = jnp.matmul(g, pt, precision=jax.lax.Precision.HIGHEST)
    return (-jnp.matmul(pt, t, precision=jax.lax.Precision.HIGHEST),)


def _make_cinv_bwd_pallas(interpret: bool):
    """Fused-Pallas -(P^T g P^T): one HBM pass, full f32.

    Paired ONLY with a Pallas forward (cinv_with(..., pallas_bwd=True)),
    in the SAME interpret mode: if the forward kernel runs on the
    executing device, the backward kernel will too — the pairing avoids
    any process-global backend check (jax.default_backend() lies when
    computation is placed on CPU devices of a process whose default
    platform is a TPU). XLA lowers these batched tiny complex matmuls to
    bf16 MXU dots; the fused kernel measured ~3x faster end-to-end on the
    flagship train step (21.5 -> 7.4 ms).
    """

    def bwd(p, g):
        from .pallas_cinv import neg_ptgpt_pallas

        n = p.shape[-1]
        out = neg_ptgpt_pallas(
            p.reshape(-1, n, n), g.reshape(-1, n, n), interpret=interpret
        )
        return (out.reshape(p.shape),)

    return bwd


cinv.defvjp(_cinv_fwd, _cinv_bwd)


def csolve(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M X = B for batched complex M (..., N, N), B (..., N, R).

    Implemented as cinv(m) @ b: the augmented-column Gauss-Jordan variant
    produced pathological layouts on TPU (odd trailing dims), while the
    inverse path reuses the fast kernel plus one batched matmul.
    """
    return cinv(m) @ b.astype(m.dtype)


def _solve1_impl(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Single-RHS Gauss-Jordan solve: (..., N, N) x (..., N) -> (..., N).

    The RHS is padded to 4 columns so the augmented width N+4 keeps a
    friendly (multiple-of-8) sublane layout on TPU (a width-13 augmented
    system measured ~40x slower than width-16). TPU callers should prefer
    :func:`csolve1_pallas` (fused Pallas inverse + f32 matvec).
    """
    n = m.shape[-1]
    rhs = jnp.broadcast_to(b.astype(m.dtype), m.shape[:-1])[..., None]
    pad = jnp.zeros(m.shape[:-1] + (3,), m.dtype)
    aug = jnp.concatenate([m, rhs, pad], axis=-1)
    return _gauss_jordan(aug, n)[..., 0]


@jax.custom_vjp
def csolve1(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable single-RHS solve x = M^-1 b (batched complex).

    ``b`` of shape (N,) or m.shape[:-1]; broadcast over the bin batch.
    Training cost: ONE solve forward + ONE transposed solve backward —
    replaces the full inverse when only P b is needed (the scalar-head
    transfer-function fast paths). VJP (JAX linear-transpose convention):
        y = M^-T g;   db = sum-over-broadcast(y);   dM = -y x^T.
    """
    return _solve1_impl(m, b)


def _csolve1_fwd(m, b):
    x = _solve1_impl(m, b)
    return x, (m, x, b.shape)


def _csolve1_bwd(res, g):
    m, x, b_shape = res
    mt = jnp.swapaxes(m, -1, -2)
    y = _solve1_impl(mt, g)
    dm = -(y[..., :, None] * x[..., None, :])
    db = y
    # undo broadcasting of b over the bin batch
    while db.ndim > len(b_shape):
        db = jnp.sum(db, axis=0)
    return dm, db


csolve1.defvjp(_csolve1_fwd, _csolve1_bwd)


def cinv_with(
    impl, pallas_bwd: bool = False, interpret: bool = True
) -> "callable":
    """Wrap an inverse implementation with the analytic VJP.

    ``pallas_bwd=True`` pairs a Pallas forward with the fused Pallas
    backward kernel in the given ``interpret`` mode (valid exactly where
    the forward is — see :func:`_make_cinv_bwd_pallas`).
    """

    @jax.custom_vjp
    def inv(m):
        return impl(m)

    def fwd(m):
        p = impl(m)
        return p, p

    inv.defvjp(fwd, _make_cinv_bwd_pallas(interpret) if pallas_bwd else _cinv_bwd)
    return inv


@functools.lru_cache(maxsize=None)
def _csolve1_pallas_for(interpret: bool):
    """custom-vjp'd Pallas solve specialized to an interpret mode.

    Forward: the fused pivoted-LU solve (kernels/pallas_lu.py) — ~N^3/3
    work on the shrinking active block vs the inverse kernel's ~2N^3 on a
    width-2N augmented system (2.6x measured at the N=27 directional
    scale, BASELINE.md). Backward: the transposed solve from the SAME
    packed factors (two O(N^2) triangular passes) — no second elimination,
    preserving the solve-once property the inverse-based VJP had.
    """

    def fwd_impl(m, b):
        from .pallas_lu import lu_solve_pallas

        n = m.shape[-1]
        bc = jnp.broadcast_to(b.astype(m.dtype), m.shape[:-1])
        x2, facs = lu_solve_pallas(
            m.reshape(-1, n, n), bc.reshape(-1, n), interpret=interpret
        )
        x = x2.reshape(m.shape[:-1])
        return x, (facs, x, b.shape)

    @jax.custom_vjp
    def solve(m, b):
        return fwd_impl(m, b)[0]

    def bwd(res, g):
        from .pallas_lu import lut_apply_pallas

        facs, x, b_shape = res
        n = x.shape[-1]
        # y = M^-T g; dm = -y x^T; db = sum-over-broadcast(y)
        y = lut_apply_pallas(facs, g.reshape(-1, n), interpret=interpret)
        y = y.reshape(x.shape)
        dm = -(y[..., :, None] * x[..., None, :])
        db = y
        while db.ndim > len(b_shape):
            db = jnp.sum(db, axis=0)
        return dm, db

    solve.defvjp(fwd_impl, bwd)
    return solve


def csolve1_pallas(
    m: jnp.ndarray, b: jnp.ndarray, interpret: bool = True
) -> jnp.ndarray:
    """x = M^-1 b via the fused Pallas inverse + f32 matvec.

    Same contract as :func:`csolve1`. ``interpret=False`` is a TPU-placement
    assertion by the caller (never resolve it from
    ``jax.default_backend()`` — that lies for CPU-placed computations).
    """
    return _csolve1_pallas_for(interpret)(m, b)
