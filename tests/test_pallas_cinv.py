"""Fused Pallas Gauss-Jordan inverse: correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.kernels.linalg import cinv_with
from diffgfdn_tpu.kernels.pallas_cinv import cinv_pallas


def _random_loop_matrices(k, n, seed=0):
    """Well-conditioned FDN-style loop matrices D - A."""
    rng = np.random.RandomState(seed)
    a = np.linalg.qr(rng.randn(n, n))[0]
    phase = rng.uniform(0, np.pi, (k, n))
    d = (1.05 + 0.3 * rng.rand(k, n)) * np.exp(1j * phase)
    m = d[:, :, None] * np.eye(n)[None] - a[None]
    return m.astype(np.complex64)


def test_pallas_cinv_matches_numpy():
    m = _random_loop_matrices(300, 12)  # forces tail padding (300 < 2*256)
    inv = np.asarray(cinv_pallas(jnp.asarray(m), bin_block=256))
    ref = np.linalg.inv(m)
    assert np.max(np.abs(inv - ref)) < 1e-3, np.max(np.abs(inv - ref))


def test_pallas_cinv_needs_pivoting():
    """Matrices whose leading diagonal entry is ~0 exercise the pivot path."""
    rng = np.random.RandomState(1)
    n = 6
    m = _random_loop_matrices(64, n, seed=2)
    m[:, 0, 0] = 1e-8  # force a pivot swap at the first elimination step
    inv = np.asarray(cinv_pallas(jnp.asarray(m), bin_block=64))
    ref = np.linalg.inv(m)
    assert np.max(np.abs(inv - ref)) < 2e-2


def test_pallas_cinv_gradient_via_custom_vjp():
    m = _random_loop_matrices(64, 4, seed=3)
    menc = np.stack([m.real, m.imag], -1).astype(np.float32)
    inv_fn = cinv_with(lambda x: cinv_pallas(x, bin_block=64))

    def f(me, impl):
        mm = (me[..., 0] + 1j * me[..., 1]).astype(jnp.complex64)
        return jnp.sum(jnp.abs(impl(mm)) ** 2)

    g_pl = np.asarray(jax.grad(lambda me: f(me, inv_fn))(menc))
    g_ref = np.asarray(jax.grad(lambda me: f(me, jnp.linalg.inv))(menc))
    assert np.allclose(g_pl, g_ref, rtol=1e-2, atol=1e-3)


def test_pallas_cinv_odd_bin_count():
    """65537-style odd K: padding + unpadding is transparent."""
    m = _random_loop_matrices(257, 4, seed=4)
    inv = np.asarray(cinv_pallas(jnp.asarray(m), bin_block=128))
    assert inv.shape == (257, 4, 4)
    assert np.max(np.abs(inv @ m - np.eye(4)[None])) < 1e-3


def test_neg_ptgpt_matches_xla():
    """Fused VJP kernel == -(P^T g P^T) (interpret mode off-TPU)."""
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.pallas_cinv import neg_ptgpt_pallas

    rng = np.random.RandomState(0)
    for k, n in ((200, 4), (130, 12)):
        p = (rng.randn(k, n, n) + 1j * rng.randn(k, n, n)).astype(np.complex64)
        g = (rng.randn(k, n, n) + 1j * rng.randn(k, n, n)).astype(np.complex64)
        out = np.asarray(neg_ptgpt_pallas(jnp.asarray(p), jnp.asarray(g)))
        pt = np.swapaxes(p, -1, -2)
        truth = -(pt @ g @ pt)
        err = np.abs(out - truth).max() / np.abs(truth).max()
        assert err < 1e-5, (k, n, err)


def test_csolve1_pallas_matches_gj_and_grads():
    """Pallas solve (fwd + custom VJP) == the Gauss-Jordan csolve1."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.linalg import csolve1, csolve1_pallas

    rng = np.random.RandomState(1)
    k, n = 48, 4
    m = (rng.randn(k, n, n) + 1j * rng.randn(k, n, n)).astype(np.complex64)
    m += 4 * np.eye(n, dtype=np.complex64)
    b = (rng.randn(n) + 1j * rng.randn(n)).astype(np.complex64)

    x1 = np.asarray(csolve1_pallas(jnp.asarray(m), jnp.asarray(b)))
    x2 = np.asarray(csolve1(jnp.asarray(m), jnp.asarray(b)))
    np.testing.assert_allclose(x1, x2, rtol=2e-4, atol=1e-5)

    mr, mi = np.real(m).copy(), np.imag(m).copy()

    def loss(fn, mr, mi):
        mm = (mr + 1j * mi).astype(jnp.complex64)
        return jnp.sum(jnp.abs(fn(mm, jnp.asarray(b))) ** 2)

    g1 = jax.grad(lambda a, c: loss(csolve1_pallas, a, c), argnums=(0, 1))(mr, mi)
    g2 = jax.grad(lambda a, c: loss(csolve1, a, c), argnums=(0, 1))(mr, mi)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-3, atol=1e-4)
