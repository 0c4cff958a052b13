"""Tests for diffgfdn_tpu.ops.basic."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.ops import basic


def test_db_roundtrip():
    x = jnp.array([0.001, 0.1, 1.0, 10.0])
    assert np.allclose(basic.db2lin(basic.db(x)), x, rtol=1e-3)
    # squared quantities use 10log10
    assert np.allclose(basic.db(jnp.array([100.0]), is_squared=True), 20.0, atol=1e-4)


def test_db_floor():
    # db(0) hits the float32-eps regularizer: 20*log10(eps) ~ -138.5 dB
    assert np.isclose(float(basic.db(jnp.array(0.0))), -138.47, atol=0.1)
    # genuine floor applies below min_value
    assert float(basic.db(jnp.array(0.0), min_value=-100.0)) == -100.0


def test_ms_to_samps():
    assert basic.ms_to_samps(20.0, 32000.0) == 640
    arr = basic.ms_to_samps(np.array([20.0, 50.0]), 32000.0)
    assert arr.dtype == np.int32
    assert list(arr) == [640, 1600]


def test_frequency_samples_cover_half_circle():
    z = basic.get_frequency_samples(5)
    assert np.allclose(np.abs(np.asarray(z)), 1.0, atol=1e-6)
    angles = np.abs(np.angle(np.asarray(z)))
    assert np.allclose(angles, np.linspace(0, np.pi, 5), atol=1e-5)


def test_frequency_samples_radius():
    z = basic.get_frequency_samples(8, radius=1.01)
    assert np.allclose(np.abs(np.asarray(z)), 1.01, atol=1e-5)


def test_schroeder_backward_int():
    sig = jnp.array([1.0, 2.0, 3.0])
    edc = np.asarray(basic.schroeder_backward_int(sig))
    assert np.allclose(edc, [14.0, 13.0, 9.0])
    edc_norm = np.asarray(basic.schroeder_backward_int(sig, normalize=True))
    assert np.isclose(edc_norm[0], 1.0)


def test_decay_kernel_60db_at_t60():
    t60 = 0.5
    fs = 1000.0
    t = np.arange(int(t60 * fs) + 1) / fs
    env = basic.decay_kernel([t60], t)
    # energy envelope: drops 60 dB at t = T60
    assert np.isclose(10 * np.log10(env[-1, 0] / env[0, 0]), -60.0, atol=0.1)


def test_decay_kernel_noise_and_norm():
    t = np.arange(100) / 1000.0
    env = basic.decay_kernel([0.2, 1.0], t, normalize_envelope=True, add_noise=True)
    assert env.shape == (100, 3)
    assert np.allclose(np.sum(env ** 2, axis=0), 1.0, atol=1e-5)


def test_shaped_wgn_edc_follows_amplitudes():
    fs = 8000.0
    n = 8192
    t60 = [0.25]
    amps = jnp.array([[1.0]])
    key = jax.random.PRNGKey(0)
    rir = basic.shaped_wgn(amps, t60, n, fs, key)[0]
    edc = np.asarray(basic.schroeder_backward_int(rir, normalize=True))
    edc_db = 10 * np.log10(edc + 1e-12)
    # at t = T60/2 the EDC of the target envelope is ~-30 dB
    idx = int(0.125 * fs)
    assert abs(edc_db[idx] - (-30.0)) < 2.0


def test_spectral_flatness():
    flat = basic.spectral_flatness(np.ones(128))
    assert np.isclose(flat, 1.0, atol=1e-6)
    tonal = np.zeros(128)
    tonal[3] = 1.0
    assert basic.spectral_flatness(tonal) < 0.1


def test_normalized_echo_density_gaussian():
    rng = np.random.RandomState(0)
    rir = rng.randn(4000)
    ned = basic.normalized_echo_density(rir, fs=8000.0)
    # for Gaussian noise the NED approaches 1
    assert abs(np.median(ned[200:]) - 1.0) < 0.15
