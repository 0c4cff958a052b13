"""Tests for the GFDN model family: shapes, physics, time-domain equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.config.schema import CouplingMatrixType
from diffgfdn_tpu.kernels.linalg import cinv, csolve
from diffgfdn_tpu.models import (
    ColorlessFDN,
    DiffDirectionalFDNVarReceiverPos,
    DiffGFDNSinglePos,
    DiffGFDNVarReceiverPos,
    DiffGFDNVarSourceReceiverPos,
    FeedbackLoop,
    build_analysis_matrix,
)
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
from diffgfdn_tpu.ops.basic import get_frequency_samples, schroeder_backward_int
from diffgfdn_tpu.ops.sph import t_design_directions

FS = 16000.0
DELAYS = (233, 311, 421, 461, 587, 613)  # 3 groups x 2 lines
NUM_GROUPS = 3
T60S = (0.25, 0.45, 0.35)


def _gains():
    g = []
    for k in range(NUM_GROUPS):
        d = np.asarray(DELAYS[2 * k : 2 * k + 2])
        g.append(np.asarray(decay_times_to_gain_per_sample(T60S[k], d, FS)))
    return np.concatenate(g)


def test_cinv_matches_numpy():
    rng = np.random.RandomState(0)
    m = rng.randn(5, 4, 4) + 1j * rng.randn(5, 4, 4)
    inv = np.asarray(cinv(jnp.asarray(m.astype(np.complex64))))
    ref = np.linalg.inv(m)
    assert np.allclose(inv, ref, atol=1e-4)


def test_csolve_matches_numpy():
    rng = np.random.RandomState(1)
    m = rng.randn(3, 4, 4) + 1j * rng.randn(3, 4, 4)
    b = rng.randn(3, 4, 2) + 1j * rng.randn(3, 4, 2)
    x = np.asarray(csolve(jnp.asarray(m.astype(np.complex64)), jnp.asarray(b.astype(np.complex64))))
    assert np.allclose(m @ x, b, atol=1e-4)


def _make_loop(**kwargs):
    defaults = dict(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        num_delay_lines_per_group=2,
        delays=DELAYS,
        coupling_matrix_type=CouplingMatrixType.SCALAR,
        gains=_gains(),
    )
    defaults.update(kwargs)
    return FeedbackLoop(**defaults)


def test_feedback_loop_shapes_and_finite():
    loop = _make_loop()
    z = get_frequency_samples(64)
    params = loop.init(jax.random.PRNGKey(0), z)
    p = loop.apply(params, z)
    assert p.shape == (64, 6, 6)
    assert np.all(np.isfinite(np.asarray(p)))


def test_coupled_feedback_matrix_zero_coupling_is_block_diagonal_scaled():
    loop = _make_loop(use_zero_coupling=True)
    z = get_frequency_samples(4)
    params = loop.init(jax.random.PRNGKey(0), z)
    a = loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix)
    a = np.asarray(a)
    # zero coupling angles -> identity coupling matrix -> off-diagonal blocks 0
    assert np.allclose(a[0:2, 2:4], 0.0, atol=1e-6)
    assert np.allclose(a[2:4, 4:6], 0.0, atol=1e-6)
    # diagonal blocks are products of two orthogonal matrices -> orthogonal
    blk = a[0:2, 0:2]
    assert np.allclose(blk @ blk.T, np.eye(2), atol=1e-5)


def test_coupled_feedback_matrix_nonzero_coupling_is_orthogonal():
    loop = _make_loop(use_zero_coupling=False)
    z = get_frequency_samples(4)
    params = loop.init(jax.random.PRNGKey(3), z)
    a = np.asarray(loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix))
    assert np.allclose(a @ a.T, np.eye(6), atol=1e-4)


def test_filter_coupling_paraunitary_loop():
    loop = _make_loop(
        coupling_matrix_type=CouplingMatrixType.FILTER, coupling_matrix_order=8
    )
    z = get_frequency_samples(16)
    params = loop.init(jax.random.PRNGKey(1), z)
    p = loop.apply(params, z)
    assert p.shape == (16, 6, 6)
    assert np.all(np.isfinite(np.asarray(p)))
    a = loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix)
    assert np.asarray(a).shape == (8, 6, 6)


def test_learned_decay_times_gamma():
    loop = _make_loop(
        gains=None,
        learn_common_decay_times=True,
        common_decay_times_init=T60S,
    )
    z = get_frequency_samples(8)
    params = loop.init(jax.random.PRNGKey(2), z)
    gamma = loop.apply(params, method=FeedbackLoop.gamma_scalar)
    assert np.allclose(np.asarray(gamma), _gains(), atol=1e-5)


# ----------------------- time-domain equivalence --------------------------


def _simulate_fdn(delays, gains, a, b, c, n_samples):
    """Reference time-domain FDN recursion (numpy, ring buffers)."""
    n = len(delays)
    max_d = max(delays)
    buf = np.zeros((n, max_d + 1))
    out = np.zeros(n_samples)
    # ``gains`` are whole-delay attenuations 10^(-3 d_i/(fs T60)) already
    g_m = np.asarray(gains, dtype=np.float64)
    for t in range(n_samples):
        u = 1.0 if t == 0 else 0.0
        y = np.array([g_m[i] * buf[i, t % delays[i]] for i in range(n)])
        out[t] = c @ y
        x = a @ y + b * u
        for i in range(n):
            buf[i, t % delays[i]] = x[i]
    return out


def test_frequency_sampled_h_matches_time_domain_sim():
    """irfft of the sampled H equals the explicit FDN recursion (SURVEY §4)."""
    delays = (13, 19, 23, 29)
    t60 = 0.04  # very short so nfft=4096 has no time aliasing
    fs = 8000.0
    gains = np.asarray(
        decay_times_to_gain_per_sample(t60, np.asarray(delays), fs)
    ).astype(np.float64)

    loop = FeedbackLoop(
        sample_rate=fs,
        num_groups=2,
        num_delay_lines_per_group=2,
        delays=delays,
        coupling_matrix_type=CouplingMatrixType.SCALAR,
        use_zero_coupling=False,
        gains=gains,
    )
    nfft = 4096
    z = get_frequency_samples(nfft // 2 + 1)
    params = loop.init(jax.random.PRNGKey(4), z)
    p = loop.apply(params, z)  # (F, N, N)
    a = np.asarray(
        loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix)
    ).astype(np.float64)

    rng = np.random.RandomState(0)
    b = rng.randn(4)
    c = rng.randn(4)
    h_f = np.einsum("n,fnm,m->f", c, np.asarray(p), b)
    h_t = np.fft.irfft(h_f, nfft)

    sim = _simulate_fdn(delays, gains, a, b, c, nfft)
    assert np.max(np.abs(h_t - sim)) < 1e-3 * max(1.0, np.max(np.abs(sim)))


# ------------------------------ model family ------------------------------


def _features(batch=3, nbins=33):
    rng = np.random.RandomState(0)
    pos = rng.rand(batch, 3).astype(np.float32) * 4
    return {
        "z_values": get_frequency_samples(nbins),
        "source_position": jnp.asarray(rng.rand(batch, 3).astype(np.float32)),
        "listener_position": jnp.asarray(pos),
        "norm_listener_position": jnp.asarray(pos / 4),
        "target_early_response": jnp.zeros((batch, nbins), jnp.complex64),
    }


def test_var_receiver_pos_svf_forward():
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=_gains(),
        use_svf_in_output=True,
        num_hidden_layers=1,
        num_neurons=16,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    h = model.apply(params, x)
    assert h.shape == (3, 33)
    assert np.all(np.isfinite(np.asarray(h).view(np.float32)))


def test_group_pooled_transfer_function_matches_generic():
    """transfer_function_group_heads == transfer_function with expanded heads.

    The group-pooled path contracts P with the io gains into (F, G, G)
    before touching the batch; it must be EXACT vs the generic (B, N, F)
    einsum formulation for per-group heads.
    """
    from diffgfdn_tpu.models.gain_heads import expand_groups_to_delay_lines

    model = DiffGFDNVarSourceReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=_gains(),
        use_svf_in_output=True,
        use_svf_in_input=True,
        num_hidden_layers=1,
        num_neurons=16,
        input_num_hidden_layers=1,
        input_num_neurons=16,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    rng = np.random.RandomState(3)
    batch, f = 3, 33
    nper = len(DELAYS) // NUM_GROUPS
    c_g = jnp.asarray(
        (rng.randn(batch, NUM_GROUPS, f) + 1j * rng.randn(batch, NUM_GROUPS, f))
        .astype(np.complex64)
    )
    b_g = jnp.asarray(
        (rng.randn(batch, NUM_GROUPS, f) + 1j * rng.randn(batch, NUM_GROUPS, f))
        .astype(np.complex64)
    )

    def run(p, x):
        z = x["z_values"]

        def inner(mdl):
            pooled = mdl.transfer_function_group_heads(z, c_g, b_g)
            pooled_c_only = mdl.transfer_function_group_heads(z, c_g, None)
            c = expand_groups_to_delay_lines(c_g, nper) * mdl.output_gains.astype(
                jnp.complex64
            )
            b = expand_groups_to_delay_lines(b_g, nper) * mdl.input_gains.astype(
                jnp.complex64
            )
            generic = mdl.transfer_function(z, c, b)
            b1 = jnp.broadcast_to(
                mdl.input_gains.astype(jnp.complex64), (batch, len(DELAYS), f)
            )
            generic_c_only = mdl.transfer_function(z, c, b1)
            return pooled, generic, pooled_c_only, generic_c_only

        return model.apply(p, method=inner)

    pooled, generic, pooled1, generic1 = run(params, x)
    scale = float(jnp.abs(generic).max())
    assert float(jnp.abs(pooled - generic).max()) < 1e-5 * max(scale, 1.0)
    scale1 = float(jnp.abs(generic1).max())
    assert float(jnp.abs(pooled1 - generic1).max()) < 1e-5 * max(scale1, 1.0)


def test_var_receiver_pos_scalar_forward_and_colorless():
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=_gains(),
        use_svf_in_output=False,
        num_hidden_layers=1,
        num_neurons=16,
        use_colorless_loss=True,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    h, (h_sub, h_per_del) = model.apply(params, x)
    assert h.shape == (3, 33)
    assert h_sub.shape == (33, NUM_GROUPS)
    assert h_per_del.shape == (NUM_GROUPS, 2, 33)


def test_var_receiver_pos_external_output_scalars():
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=_gains(),
        use_svf_in_output=False,
        num_hidden_layers=1,
        num_neurons=16,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    amps = jnp.ones((3, NUM_GROUPS)) * 0.5
    h = model.apply(params, x, output_scalars=amps)
    assert h.shape == (3, 33)


def test_var_source_receiver_pos_forward():
    model = DiffGFDNVarSourceReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=_gains(),
        use_svf_in_output=True,
        use_svf_in_input=False,
        num_hidden_layers=1,
        num_neurons=16,
        input_num_hidden_layers=1,
        input_num_neurons=16,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    h = model.apply(params, x)
    assert h.shape == (3, 33)


def test_single_pos_forward():
    model = DiffGFDNSinglePos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=_gains(),
        use_svf_in_output=True,
        use_svf_in_input=False,
    )
    x = _features(batch=1)
    x["target_early_response"] = jnp.zeros(33, jnp.complex64)
    params = model.init(jax.random.PRNGKey(0), x)
    h = model.apply(params, x)
    assert h.shape == (33,)


def test_directional_fdn_forward():
    ambi_order = 1
    nper = (ambi_order + 1) ** 2
    delays = tuple(int(p) for p in (233, 311, 421, 461, 587, 613, 683, 761))
    dirs = t_design_directions(5)
    desired = np.stack([dirs[0], np.pi / 2 - dirs[1]])  # (azi, elevation)
    analysis = build_analysis_matrix(ambi_order, desired, None)
    gains = np.asarray(
        decay_times_to_gain_per_sample(0.3, np.asarray(delays), FS)
    )
    model = DiffDirectionalFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=2,
        delays=delays,
        gains=gains,
        ambi_order=ambi_order,
        num_hidden_layers=1,
        num_neurons=16,
        analysis_matrix=analysis,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    h_sh = model.apply(params, x)
    assert h_sh.shape == (3, nper, 33)
    h_dir = model.apply(params, h_sh, method=DiffDirectionalFDNVarReceiverPos.directional_response)
    assert h_dir.shape == (3, 12, 33)


def test_colorless_fdn_forward():
    delays = (233, 311, 421, 461)
    model = ColorlessFDN(sample_rate=FS, delays=delays)
    z = get_frequency_samples(65)
    params = model.init(jax.random.PRNGKey(0), z)
    h, h_per_del = model.apply(params, z)
    assert h.shape == (65,)
    assert h_per_del.shape == (4, 65)


def test_gfdn_edc_matches_prescribed_t60():
    """With zero coupling and scalar absorption, each group's energy decays
    at its prescribed T60 (fundamental GFDN physics)."""
    fs = 8000.0
    delays = (233, 311, 421, 461, 587, 613)
    t60s = (0.2, 0.4, 0.3)
    gains = []
    for k in range(3):
        d = np.asarray(delays[2 * k : 2 * k + 2])
        gains.append(np.asarray(decay_times_to_gain_per_sample(t60s[k], d, fs)))
    gains = np.concatenate(gains)

    nfft = 2 ** 13
    model = DiffGFDNSinglePos(
        sample_rate=fs,
        num_groups=3,
        delays=delays,
        gains=gains,
        use_svf_in_output=False,
        use_svf_in_input=False,
    )
    z = get_frequency_samples(nfft // 2 + 1)
    x = {
        "z_values": z,
        "listener_position": jnp.zeros((1, 3)),
        "norm_listener_position": jnp.zeros((1, 3)),
    }
    params = model.init(jax.random.PRNGKey(0), x)
    h = model.apply(params, x)
    rir = np.fft.irfft(np.asarray(h), nfft)
    edc = np.asarray(schroeder_backward_int(jnp.asarray(rir), normalize=True))
    edc_db = 10 * np.log10(edc + 1e-12)
    # the slowest group (0.4s) dominates the late tail: slope between
    # 0.15s and 0.3s should correspond to T60 ~ 0.4s (-150 dB/s)
    i0, i1 = int(0.15 * fs), int(0.3 * fs)
    slope = (edc_db[i1] - edc_db[i0]) / ((i1 - i0) / fs)
    t60_est = -60.0 / slope
    assert 0.32 < t60_est < 0.48, t60_est


def test_block_diagonal_inverse_matches_general():
    """Zero-coupling block inversion == inverting the full loop matrix."""
    from diffgfdn_tpu.kernels.linalg import cinv

    loop = _make_loop(use_zero_coupling=True)
    z = get_frequency_samples(33)
    params = loop.init(jax.random.PRNGKey(9), z)
    p_block = np.asarray(loop.apply(params, z))
    m_full = loop.apply(params, z, method=FeedbackLoop.loop_matrix)
    p_full = np.asarray(cinv(m_full))
    assert np.max(np.abs(p_block - p_full)) < 1e-4

    # drive paths agree too (both orientations)
    b = jnp.asarray(np.random.RandomState(0).randn(6).astype(np.float32))
    q_block = np.asarray(loop.apply(params, z, b, method=FeedbackLoop.drive))
    q_ref = np.einsum("fnm,m->fn", p_full, np.asarray(b))
    assert np.max(np.abs(q_block - q_ref)) < 1e-4
    q_t = np.asarray(
        loop.apply(params, z, b, True, method=FeedbackLoop.drive)
    )
    q_t_ref = np.einsum("fnm,n->fm", p_full, np.asarray(b))
    assert np.max(np.abs(q_t - q_t_ref)) < 1e-4
