"""Fused pivoted-LU solve kernel (kernels/pallas_lu.py, interpret mode).

The kernel is the forward of csolve1_pallas (kernels/linalg.py): x = M^-1 b
with packed product-form factors reused by the transposed-solve backward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.kernels.linalg import csolve1, csolve1_pallas
from diffgfdn_tpu.kernels.pallas_lu import lu_solve_pallas, lut_apply_pallas


def _random_systems(k, n, seed=0, cond="good"):
    rng = np.random.RandomState(seed)
    m = (
        2.0 * np.eye(n)[None]
        + 0.4 * rng.randn(k, n, n)
        + 0.4j * rng.randn(k, n, n)
    ).astype(np.complex64)
    if cond == "pivot":
        # zero leading pivots: unpivoted elimination divides by ~0
        m[:, 0, 0] = 0.0
    b = (rng.randn(k, n) + 1j * rng.randn(k, n)).astype(np.complex64)
    return m, b


def test_lu_solve_matches_numpy():
    m, b = _random_systems(137, 9)
    x, _ = jax.jit(lambda a, c: lu_solve_pallas(a, c))(m, b)
    ref = np.stack([np.linalg.solve(m[i], b[i]) for i in range(len(m))])
    assert np.allclose(np.asarray(x), ref, atol=2e-5 * np.abs(ref).max())


def test_lu_solve_needs_pivoting():
    m, b = _random_systems(64, 7, seed=1, cond="pivot")
    x, _ = lu_solve_pallas(m, b)
    ref = np.stack([np.linalg.solve(m[i], b[i]) for i in range(len(m))])
    assert np.isfinite(np.asarray(x)).all()
    assert np.allclose(np.asarray(x), ref, atol=5e-5 * np.abs(ref).max())


def test_lut_apply_is_transposed_solve():
    m, g = _random_systems(96, 8, seed=2)
    _, facs = lu_solve_pallas(m, g)
    y = lut_apply_pallas(facs, g)
    ref = np.stack(
        [np.linalg.solve(m[i].T, g[i]) for i in range(len(m))]
    )
    assert np.allclose(np.asarray(y), ref, atol=5e-5 * np.abs(ref).max())


def test_csolve1_pallas_gradients_match_xla():
    """The LU-backed csolve1_pallas VJP == the XLA Gauss-Jordan solve VJP."""
    m, b = _random_systems(33, 6, seed=3)
    b1 = b[0]  # broadcast RHS, as FeedbackLoop.drive uses it

    def loss_pallas(mm, bb):
        x = csolve1_pallas(mm, bb)
        return jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2)

    def loss_xla(mm, bb):
        x = csolve1(mm, bb)
        return jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(m), jnp.asarray(b1))
    gx = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(m), jnp.asarray(b1))
    for a, c in zip(gp, gx):
        assert np.allclose(
            np.asarray(a), np.asarray(c), atol=5e-4 * np.abs(np.asarray(c)).max()
        )


def test_csolve1_pallas_block_shapes():
    """(G, F, nper, nper) batched shapes as the block-diagonal drive uses."""
    g, f, n = 3, 70, 4
    rng = np.random.RandomState(4)
    m = (
        2.0 * np.eye(n)[None, None]
        + 0.3 * rng.randn(g, f, n, n)
        + 0.3j * rng.randn(g, f, n, n)
    ).astype(np.complex64)
    b = (rng.randn(g, n) + 1j * rng.randn(g, n)).astype(np.complex64)
    x = csolve1_pallas(m, jnp.broadcast_to(b[:, None, :], (g, f, n)))
    ref = np.stack(
        [
            np.stack([np.linalg.solve(m[i, j], b[i]) for j in range(f)])
            for i in range(g)
        ]
    )
    assert np.allclose(np.asarray(x), ref, atol=2e-5 * np.abs(ref).max())
