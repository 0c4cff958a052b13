"""Time-domain GFDN kernel tests: exactness vs the sample-serial recursion
and consistency with the frequency-sampled transfer function."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffgfdn_tpu.config.schema import CouplingMatrixType
from diffgfdn_tpu.kernels.tdgfdn import (
    delay_line_outputs,
    delay_line_outputs_pallas,
    synthesize_rirs_time_domain,
    time_domain_gfdn,
)
from diffgfdn_tpu.models import FeedbackLoop
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
from diffgfdn_tpu.ops.basic import get_frequency_samples


def _simulate_fdn(delays, gains, a, b, n_samples, u=None):
    """Sample-serial reference recursion; returns delay-line outputs (T, N)."""
    n = len(delays)
    buf = np.zeros((n, max(delays)))
    y_out = np.zeros((n_samples, n))
    g = np.asarray(gains, np.float64)
    for t in range(n_samples):
        ut = (1.0 if t == 0 else 0.0) if u is None else u[t]
        y = np.array([g[i] * buf[i, t % delays[i]] for i in range(n)])
        y_out[t] = y
        x = a @ y + b * ut
        for i in range(n):
            buf[i, t % delays[i]] = x[i]
    return y_out


@pytest.fixture(scope="module")
def fdn_setup():
    delays = (37, 41, 43, 53)  # small so the numpy sim stays fast
    fs = 4000.0
    gains = np.asarray(
        decay_times_to_gain_per_sample(0.08, np.asarray(delays), fs)
    )
    rng = np.random.RandomState(0)
    a = np.linalg.qr(rng.randn(4, 4))[0] * 0.999
    b = rng.randn(4)
    return delays, gains, a, b


def test_block_scan_matches_sample_recursion(fdn_setup):
    delays, gains, a, b = fdn_setup
    n_samples = 512
    ref = _simulate_fdn(delays, gains, a, b, n_samples)
    y = np.asarray(
        delay_line_outputs(
            delays, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b),
            jnp.zeros(n_samples).at[0].set(1.0),
        )
    )
    assert np.allclose(y, ref, atol=1e-5)


def test_block_scan_arbitrary_input(fdn_setup):
    delays, gains, a, b = fdn_setup
    rng = np.random.RandomState(1)
    u = rng.randn(400).astype(np.float32)
    ref = _simulate_fdn(delays, gains, a, b, len(u), u)
    y = np.asarray(
        delay_line_outputs(
            delays, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(u),
        )
    )
    assert np.allclose(y, ref, atol=1e-4)


def test_pallas_kernel_matches_scan(fdn_setup):
    delays, gains, a, b = fdn_setup
    impulse = jnp.zeros(512).at[0].set(1.0)
    y_scan = np.asarray(
        delay_line_outputs(
            delays, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b), impulse
        )
    )
    y_pl = np.asarray(
        delay_line_outputs_pallas(
            delays, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b), impulse
        )
    )
    assert np.allclose(y_pl, y_scan, atol=1e-5)


def test_time_domain_matches_frequency_sampled_h(fdn_setup):
    """irfft(H) == time-domain synthesis for the same GFDN parameters."""
    delays, gains, a, b = fdn_setup
    nfft = 2048
    rng = np.random.RandomState(2)
    c_batch = rng.randn(3, 4).astype(np.float32)

    rirs_td = np.asarray(
        synthesize_rirs_time_domain(
            delays, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(c_batch), nfft,
        )
    )

    # frequency-sampled: H = c^T (D Gamma^-1 - A)^-1 b at the rfft grid
    z = get_frequency_samples(nfft // 2 + 1)
    d = np.asarray(z)[:, None] ** np.asarray(delays)[None, :] / gains[None, :]
    m = d[:, :, None] * np.eye(4)[None] - a[None]
    p = np.linalg.inv(m)
    h = np.einsum("cn,fnm,m->cf", c_batch, p, b)
    rirs_fd = np.fft.irfft(h, nfft, axis=-1)

    assert np.max(np.abs(rirs_td - rirs_fd)) < 1e-3 * max(
        1.0, np.max(np.abs(rirs_fd))
    )


def test_batched_output_gains(fdn_setup):
    delays, gains, a, b = fdn_setup
    rng = np.random.RandomState(3)
    u = rng.randn(300).astype(np.float32)
    c = rng.randn(5, 4).astype(np.float32)
    out = np.asarray(
        time_domain_gfdn(
            delays, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(c), jnp.asarray(u), direct_gain=0.5,
        )
    )
    assert out.shape == (5, 300)
    y = _simulate_fdn(delays, gains, a, b, len(u), u)
    ref = y @ c.T + 0.5 * u[:, None]
    assert np.allclose(out, ref.T, atol=1e-4)
