"""Fused Pallas biquad-cascade response: fwd + analytic VJP parity with the
XLA section loop (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.kernels.pallas_sos import sos_cascade_response_pallas
from diffgfdn_tpu.ops.biquad import sos_frequency_response


def _random_cascades(r, k, seed=0):
    """Stable-ish random biquads: normalized a0, poles inside the circle."""
    rng = np.random.RandomState(seed)
    num = rng.randn(r, k, 3).astype(np.float32)
    # denominators via conjugate pole pairs with radius < 0.95
    rad = 0.3 + 0.6 * rng.rand(r, k)
    th = np.pi * rng.rand(r, k)
    den = np.stack(
        [np.ones((r, k)), -2.0 * rad * np.cos(th), rad ** 2], axis=-1
    ).astype(np.float32)
    return num, den


def test_pallas_sos_forward_matches_xla():
    num, den = _random_cascades(6, 10)
    z = np.exp(1j * np.linspace(0, np.pi, 700)).astype(np.complex64)
    ref = np.asarray(sos_frequency_response(jnp.asarray(num), jnp.asarray(den),
                                            jnp.asarray(z)))
    out = np.asarray(sos_cascade_response_pallas(
        jnp.asarray(num), jnp.asarray(den), jnp.asarray(z)))
    scale = np.abs(ref).max()
    assert np.max(np.abs(out - ref)) < 1e-4 * scale


def test_pallas_sos_leading_dims_and_odd_bins():
    num, den = _random_cascades(12, 4, seed=1)
    num = num.reshape(3, 4, 4, 3)
    den = den.reshape(3, 4, 4, 3)
    z = np.exp(1j * np.linspace(0, np.pi, 513)).astype(np.complex64)
    out = np.asarray(sos_cascade_response_pallas(
        jnp.asarray(num), jnp.asarray(den), jnp.asarray(z)))
    assert out.shape == (3, 4, 513)
    ref = np.asarray(sos_frequency_response(jnp.asarray(num), jnp.asarray(den),
                                            jnp.asarray(z)))
    assert np.max(np.abs(out - ref)) < 1e-4 * np.abs(ref).max()


def test_pallas_sos_gradients_match_xla():
    num, den = _random_cascades(4, 6, seed=2)
    z = np.exp(1j * np.linspace(0, np.pi, 640)).astype(np.complex64)
    zj = jnp.asarray(z)
    tgt = np.asarray(
        sos_frequency_response(jnp.asarray(num * 1.1), jnp.asarray(den), zj)
    )

    def loss(fn, n, d):
        h = fn(n, d, zj)
        return jnp.mean(jnp.abs(h - tgt) ** 2)

    g_pl = jax.grad(lambda n, d: loss(sos_cascade_response_pallas, n, d),
                    argnums=(0, 1))(jnp.asarray(num), jnp.asarray(den))
    g_ref = jax.grad(lambda n, d: loss(sos_frequency_response, n, d),
                     argnums=(0, 1))(jnp.asarray(num), jnp.asarray(den))
    for a, b in zip(g_pl, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-9
        assert np.max(np.abs(a - b)) < 1e-3 * scale, np.max(np.abs(a - b)) / scale


def test_gradients_finite_with_zero_b0_section():
    """A section whose numerator response vanishes at a (padded) bin used
    to produce 0 * Inf = NaN in the factored backward — clamped now."""
    num, den = _random_cascades(3, 4, seed=5)
    num[:, 1, 0] = 0.0  # b0 == 0: P(z=0) = 0 on zero-padded bins
    z = np.exp(1j * np.linspace(0, np.pi, 700)).astype(np.complex64)

    def loss(n, d):
        h = sos_cascade_response_pallas(n, d, jnp.asarray(z))
        return jnp.sum(jnp.abs(h) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(num), jnp.asarray(den))
    for arr in g:
        assert np.isfinite(np.asarray(arr)).all()
