"""MXU matmul-irfft: parity with numpy, output slicing, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.losses import directional_edc_loss_from_sh
from diffgfdn_tpu.ops.mxu_fft import ifft_matmul_unscaled, irfft_matmul


def test_irfft_matmul_matches_numpy():
    rng = np.random.RandomState(0)
    # 16 exercises the square four-step split, 128 the unequal
    # (n1 != n2) split; longer powers add only compile time
    for n in (16, 128):
        x = rng.randn(3, n)
        h = np.fft.rfft(x, n).astype(np.complex64)
        ref = np.fft.irfft(h, n)
        got = np.asarray(irfft_matmul(jnp.asarray(h), n))
        assert np.abs(got - ref).max() < 5e-6 * max(np.abs(ref).max(), 1)


def test_irfft_matmul_sliced_windows():
    rng = np.random.RandomState(1)
    n = 128
    h = np.fft.rfft(rng.randn(2, n), n).astype(np.complex64)
    ref = np.fft.irfft(h, n)
    for s, e in ((0, n), (n // 8, n // 2), (1, 7), (n // 2 + 1, n - 3)):
        got = np.asarray(irfft_matmul(jnp.asarray(h), n, s, e))
        assert got.shape == (2, e - s)
        np.testing.assert_allclose(got, ref[:, s:e], atol=5e-6)


def test_ifft_matmul_unscaled_matches_numpy():
    rng = np.random.RandomState(2)
    m = 64
    z = (rng.randn(2, m) + 1j * rng.randn(2, m)).astype(np.complex64)
    ref = np.fft.ifft(z, m) * m
    got = np.asarray(ifft_matmul_unscaled(jnp.asarray(z), m))
    assert np.abs(got - ref).max() < 1e-4


def test_directional_loss_matmul_irfft_matches_native():
    """The loss flag changes the fft implementation, not the value."""
    rng = np.random.RandomState(3)
    f = 257
    h_ri = rng.randn(2, 4, f, 2).astype(np.float32) * 0.1
    analysis = rng.randn(6, 4).astype(np.float32)
    amps = rng.rand(2, 6, 3).astype(np.float32)
    env = jnp.asarray(
        np.exp(-np.arange(300)[None, :] / (50.0 * (1 + np.arange(3))[:, None])),
        jnp.float32,
    )

    def loss(h_ri, flag):
        h = h_ri[..., 0] + 1j * h_ri[..., 1]
        return directional_edc_loss_from_sh(
            h, analysis, jnp.asarray(amps), env, 32, 300,
            use_matmul_irfft=flag,
        )

    v0 = float(jax.jit(lambda x: loss(x, False))(jnp.asarray(h_ri)))
    v1 = float(jax.jit(lambda x: loss(x, True))(jnp.asarray(h_ri)))
    assert abs(v0 - v1) < 1e-3 * max(abs(v0), 1.0)
    g = jax.grad(lambda x: loss(x, True))(jnp.asarray(h_ri))
    assert np.isfinite(np.asarray(g)).all()


def test_irfft_matmul_non_power_of_two_falls_back():
    """Non-power-of-two lengths (any nfft the config allows) fall back to
    the native irfft instead of tripping the factorization assert."""
    rng = np.random.RandomState(0)
    for n, lo, hi in ((96, 10, 80), (100, 0, None), (128, 130, 200)):
        h = (rng.randn(3, n // 2 + 1) + 1j * rng.randn(3, n // 2 + 1)).astype(
            np.complex64
        )
        want = np.fft.irfft(h, n, axis=-1)[..., lo:hi]
        got = np.asarray(irfft_matmul(jnp.asarray(h), n, lo, hi))
        np.testing.assert_allclose(got, want, atol=2e-6)
