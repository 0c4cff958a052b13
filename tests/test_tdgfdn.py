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


# -------------------- filtered absorption / FILTER coupling --------------------


def _simulate_fdn_filtered(delays, spaces, a_poly, b, n_samples):
    """Sample-serial reference with per-line state-space absorption filters
    and (optionally polynomial) coupling. ``spaces``: list of (T, B, C, D);
    ``a_poly``: (order, N, N) or (N, N)."""
    n = len(delays)
    buf = np.zeros((n, max(delays)))
    states = [np.zeros(t.shape[0]) for t, *_ in spaces]
    y_out = np.zeros((n_samples, n))
    if a_poly.ndim == 2:
        a_poly = a_poly[None]
    order = a_poly.shape[0]
    for t in range(n_samples):
        ut = 1.0 if t == 0 else 0.0
        y = np.zeros(n)
        for i in range(n):
            u_del = buf[i, t % delays[i]]
            ti, bi, ci, di = spaces[i]
            y[i] = ci @ states[i] + di * u_del
            states[i] = ti @ states[i] + bi * u_del
        y_out[t] = y
        x = b * ut
        for o in range(order):
            if t - o >= 0:
                x = x + a_poly[o] @ y_out[t - o]
        for i in range(n):
            buf[i, t % delays[i]] = x[i]
    return y_out


def test_filtered_scan_matches_sample_recursion():
    """Block state-space filtering == per-sample recursion (exactness)."""
    from diffgfdn_tpu.kernels.tdgfdn import (
        delay_line_outputs_filtered,
        filter_bank_from_sos,
        sos_cascade_to_statespace,
    )
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_filters_geq

    delays = (37, 41, 43, 53)
    fs = 4000.0
    sos = decay_times_to_gain_filters_geq(
        np.array([250.0, 500.0, 1000.0]),
        np.array([0.08, 0.1, 0.06]),
        np.asarray(delays),
        fs,
    )  # (4, 6, 3, 2)
    rng = np.random.RandomState(0)
    a = np.linalg.qr(rng.randn(4, 4))[0] * 0.999
    b = rng.randn(4)

    spaces = [sos_cascade_to_statespace(sos[i]) for i in range(4)]
    ref = _simulate_fdn_filtered(delays, spaces, a, b, 400)

    bank = filter_bank_from_sos(sos, delays)
    y = np.asarray(
        delay_line_outputs_filtered(
            delays, bank, jnp.asarray(a), jnp.asarray(b),
            jnp.zeros(400).at[0].set(1.0),
        )
    )
    assert np.max(np.abs(y - ref)) < 1e-5, np.max(np.abs(y - ref))


def test_filtered_scan_trivial_bank_matches_scalar_path():
    """A gains-only bank reproduces the scalar fast path exactly."""
    from diffgfdn_tpu.kernels.tdgfdn import (
        delay_line_outputs_filtered,
        filter_bank_from_gains,
    )

    delays = (37, 41, 43, 53)
    gains = np.asarray([0.99, 0.985, 0.992, 0.98])
    rng = np.random.RandomState(1)
    a = np.linalg.qr(rng.randn(4, 4))[0] * 0.999
    b = rng.randn(4)
    u = jnp.zeros(300).at[0].set(1.0)
    y_scalar = np.asarray(
        delay_line_outputs(delays, jnp.asarray(gains), jnp.asarray(a),
                           jnp.asarray(b), u)
    )
    bank = filter_bank_from_gains(gains, delays)
    y_filt = np.asarray(
        delay_line_outputs_filtered(delays, bank, jnp.asarray(a),
                                    jnp.asarray(b), u)
    )
    assert np.max(np.abs(y_scalar - y_filt)) < 1e-6


def test_tdgfdn_filtered_absorption_matches_H():
    """EDC parity: alias-free filtered time-domain synthesis vs the
    frequency-sampled H irfft path (the training formulation)."""
    from diffgfdn_tpu.kernels.tdgfdn import (
        filter_bank_from_sos,
        synthesize_rirs_time_domain_filtered,
    )
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_filters_geq
    from diffgfdn_tpu.ops.basic import db, schroeder_backward_int

    delays = (163, 179, 191, 211)
    fs = 8000.0
    nfft = 8192
    band_centre_hz = np.array([125.0, 250.0, 500.0, 1000.0, 2000.0])
    t60s = np.array([0.14, 0.11, 0.09, 0.07, 0.05])
    sos = decay_times_to_gain_filters_geq(
        band_centre_hz, t60s, np.asarray(delays), fs
    )

    loop = FeedbackLoop(
        sample_rate=fs,
        num_groups=2,
        num_delay_lines_per_group=2,
        delays=delays,
        coupling_matrix_type=CouplingMatrixType.SCALAR,
        use_zero_coupling=False,
        sos_coeffs=sos,
    )
    z = get_frequency_samples(nfft // 2 + 1)
    params = loop.init(jax.random.PRNGKey(0), z)
    a = np.asarray(
        loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix)
    )
    rng = np.random.RandomState(0)
    b = rng.randn(4).astype(np.float32)
    c = rng.randn(2, 4).astype(np.float32)

    p = np.asarray(loop.apply(params, z))
    h = np.einsum("cn,fnm,m->cf", c, p, b)
    rir_fd = np.fft.irfft(h, nfft, axis=-1)

    bank = filter_bank_from_sos(sos, delays)
    rir_td = np.asarray(
        synthesize_rirs_time_domain_filtered(
            delays, bank, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), nfft
        )
    )

    # sample-level agreement
    peak = np.max(np.abs(rir_fd))
    assert np.max(np.abs(rir_td - rir_fd)) < 1e-3 * peak

    # EDC parity <= 1e-3 dB (mean |delta dB| over the decay range)
    end = int(0.4 * fs)
    edc_fd = np.asarray(db(schroeder_backward_int(
        jnp.asarray(rir_fd[:, :end])), is_squared=True))
    edc_td = np.asarray(db(schroeder_backward_int(
        jnp.asarray(rir_td[:, :end])), is_squared=True))
    mean_err = np.mean(np.abs(edc_fd - edc_td))
    assert mean_err < 1e-3, mean_err


def test_filtered_scan_filter_mode_coupling_matches_H():
    """Polynomial (FIR-paraunitary) coupling in the time-domain core matches
    the frequency-sampled formulation."""
    from diffgfdn_tpu.kernels.tdgfdn import (
        delay_line_outputs_filtered,
        filter_bank_from_gains,
    )

    delays = (163, 179, 191, 211)
    fs = 8000.0
    nfft = 8192
    gains = np.asarray(
        decay_times_to_gain_per_sample(0.08, np.asarray(delays), fs)
    )
    loop = FeedbackLoop(
        sample_rate=fs,
        num_groups=2,
        num_delay_lines_per_group=2,
        delays=delays,
        coupling_matrix_type=CouplingMatrixType.FILTER,
        coupling_matrix_order=8,
        gains=gains,
    )
    z = get_frequency_samples(nfft // 2 + 1)
    params = loop.init(jax.random.PRNGKey(1), z)
    a_poly = np.asarray(
        loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix)
    )  # (order, N, N)
    assert a_poly.ndim == 3

    rng = np.random.RandomState(2)
    b = rng.randn(4).astype(np.float32)
    c = rng.randn(4).astype(np.float32)
    p = np.asarray(loop.apply(params, z))
    h = np.einsum("n,fnm,m->f", c, p, b)
    rir_fd = np.fft.irfft(h, nfft)

    bank = filter_bank_from_gains(gains, delays)
    y = np.asarray(
        delay_line_outputs_filtered(
            delays, bank, jnp.asarray(a_poly), jnp.asarray(b),
            jnp.zeros(nfft).at[0].set(1.0),
        )
    )
    rir_td = y @ c

    peak = np.max(np.abs(rir_fd))
    assert np.max(np.abs(rir_td - rir_fd)) < 2e-3 * peak


def test_pallas_wide_spread_falls_back_to_scan(fdn_setup):
    """A delay spread whose selection tensor cannot fit the VMEM budget at
    any block size silently uses the XLA scan (identical recursion)."""
    from diffgfdn_tpu.kernels.tdgfdn import (
        _pallas_block_size,
        delay_line_outputs,
        delay_line_outputs_pallas,
    )

    del fdn_setup
    rng = np.random.RandomState(2)
    # 12 lines spanning ~50k samples: 12 * spread * 8 * 4 B > 12 MB budget
    wide = tuple(np.linspace(100, 50000, 12).astype(int))
    assert _pallas_block_size(wide) is None
    a = jnp.asarray(np.linalg.qr(rng.randn(12, 12))[0] * 0.999, jnp.float32)
    b = jnp.asarray(rng.randn(12), jnp.float32)
    g = jnp.asarray(np.full(12, 0.9995, np.float32))
    u = jnp.zeros(2048, jnp.float32).at[0].set(1.0)
    got = np.asarray(
        delay_line_outputs_pallas(wide, g, a, b, u, interpret=True)
    )
    want = np.asarray(delay_line_outputs(wide, g, a, b, u))
    np.testing.assert_allclose(got, want, atol=1e-6)
