"""Native C++ streaming renderer: sample-exact vs the JAX core."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from diffgfdn_tpu.kernels.tdgfdn import time_domain_gfdn
from diffgfdn_tpu.native import native_available, NativeGFDNRenderer
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable"
)

DELAYS = (163, 179, 191, 211, 223, 227)
FS = 8000.0


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    gains = []
    for k, t60 in enumerate((0.05, 0.08, 0.06)):
        d = np.asarray(DELAYS[2 * k : 2 * k + 2])
        gains.append(np.asarray(decay_times_to_gain_per_sample(t60, d, FS)))
    a = np.linalg.qr(rng.randn(6, 6))[0].astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    c = rng.randn(3, 6).astype(np.float32)
    return np.concatenate(gains).astype(np.float32), a, b, c


def test_native_matches_jax_core():
    gains, a, b, c = _setup()
    rng = np.random.RandomState(1)
    u = rng.randn(4000).astype(np.float32)
    ref = np.asarray(
        time_domain_gfdn(
            DELAYS, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(c), jnp.asarray(u), direct_gain=0.3,
        )
    )
    renderer = NativeGFDNRenderer(DELAYS, gains, a, b)
    out = renderer.process(u, c, direct_gain=0.3)
    assert np.allclose(out, ref, atol=1e-4)


def test_native_streaming_statefulness():
    """Block-wise streaming equals one-shot processing (state carries over)."""
    gains, a, b, c = _setup(seed=2)
    rng = np.random.RandomState(3)
    u = rng.randn(3000).astype(np.float32)
    r1 = NativeGFDNRenderer(DELAYS, gains, a, b)
    whole = r1.process(u, c)
    r2 = NativeGFDNRenderer(DELAYS, gains, a, b)
    parts = [r2.process(u[i : i + 700], c) for i in range(0, 3000, 700)]
    streamed = np.concatenate(parts, axis=-1)
    assert np.allclose(streamed, whole, atol=1e-5)


def test_native_reset():
    gains, a, b, c = _setup(seed=4)
    impulse = np.zeros(1000, np.float32)
    impulse[0] = 1.0
    r = NativeGFDNRenderer(DELAYS, gains, a, b)
    first = r.process(impulse, c)
    r.reset()
    second = r.process(impulse, c)
    assert np.allclose(first, second)


def test_native_realtime_factor():
    """The host renderer must comfortably beat real time (streaming use)."""
    gains, a, b, c = _setup(seed=5)
    u = np.random.RandomState(6).randn(int(FS)).astype(np.float32)  # 1 s
    r = NativeGFDNRenderer(DELAYS, gains, a, b)
    r.process(u[:256], c)  # warm up
    t0 = time.perf_counter()
    r.process(u, c[:1])
    dt = time.perf_counter() - t0
    assert 1.0 / dt > 5.0, f"only {1.0 / dt:.1f}x realtime"


def test_native_filtered_absorption_matches_jax_filtered_core():
    """SOS absorption in the streaming renderer == the TPU core's block
    state-space filtering (both realize the same TDF-II cascades)."""
    from diffgfdn_tpu.kernels.tdgfdn import (
        delay_line_outputs_filtered,
        filter_bank_from_sos,
    )
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_filters_geq

    rng = np.random.RandomState(4)
    sos = decay_times_to_gain_filters_geq(
        np.array([250.0, 500.0, 1000.0, 2000.0]),
        np.array([0.08, 0.07, 0.06, 0.05]),
        np.asarray(DELAYS),
        FS,
    )  # (6, 7, 3, 2)
    a = np.linalg.qr(rng.randn(6, 6))[0].astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    c = rng.randn(2, 6).astype(np.float32)
    u = rng.randn(3000).astype(np.float32)

    bank = filter_bank_from_sos(sos, DELAYS)
    y = np.asarray(
        delay_line_outputs_filtered(
            DELAYS, bank, jnp.asarray(a), jnp.asarray(b), jnp.asarray(u)
        )
    )
    ref = (y @ c.T).T  # (2, T)

    renderer = NativeGFDNRenderer(DELAYS, None, a, b, sos_coeffs=sos)
    out = renderer.process(u, c)
    assert np.allclose(out, ref, atol=5e-4), np.abs(out - ref).max()

    # streaming in blocks keeps filter state
    renderer2 = NativeGFDNRenderer(DELAYS, None, a, b, sos_coeffs=sos)
    parts = [renderer2.process(u[i : i + 640], c) for i in range(0, 3000, 640)]
    streamed = np.concatenate(parts, axis=-1)
    assert np.allclose(streamed, out, atol=1e-5)
