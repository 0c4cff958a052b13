"""Unit tests for the complex-I/O codec (diffgfdn_tpu/utils/cio.py).

The codec is the jit boundary for every trainer (complex64 cannot cross
host<->device on the TPU backend), and at production scale its host cost
matters: encode_complex must be a zero-copy reinterpret view for
C-contiguous complex64 planes (~440 MB each at 838 x 65537).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from diffgfdn_tpu.utils.cio import (
    decode_batch,
    device_early_response_ri,
    device_target_spectra_ri,
    encode_batch,
    encode_complex,
)


def test_encode_complex_contiguous_is_zero_copy_view():
    rng = np.random.RandomState(0)
    x = (rng.randn(5, 17) + 1j * rng.randn(5, 17)).astype(np.complex64)
    ri = encode_complex(x)
    assert ri.dtype == np.float32 and ri.shape == (5, 17, 2)
    # complex64 IS the interleaved (re, im) float32 pair: no copy
    assert ri.base is not None
    assert np.shares_memory(ri, x)
    np.testing.assert_array_equal(ri[..., 0], x.real)
    np.testing.assert_array_equal(ri[..., 1], x.imag)


@pytest.mark.parametrize(
    "make",
    [
        # non-contiguous complex64 (sliced) -> stack fallback, still exact
        lambda r: (r.randn(6, 9) + 1j * r.randn(6, 9)).astype(np.complex64)[
            ::2
        ],
        # complex128 -> downcast stack fallback
        lambda r: (r.randn(4, 9) + 1j * r.randn(4, 9)),
        # jnp complex input (device-side encode)
        lambda r: jnp.asarray(
            (r.randn(3, 5) + 1j * r.randn(3, 5)).astype(np.complex64)
        ),
    ],
)
def test_encode_complex_fallbacks_exact(make):
    x = make(np.random.RandomState(1))
    ri = np.asarray(encode_complex(x))
    assert ri.dtype == np.float32
    xs = np.asarray(x)
    np.testing.assert_allclose(ri[..., 0], xs.real.astype(np.float32))
    np.testing.assert_allclose(ri[..., 1], xs.imag.astype(np.float32))


def test_encode_decode_batch_round_trip():
    rng = np.random.RandomState(2)
    batch = {
        "z_values": (rng.randn(33) + 1j * rng.randn(33)).astype(np.complex64),
        "listener_position": rng.randn(4, 3).astype(np.float32),
    }
    enc = encode_batch(batch)
    assert set(enc) == {"z_values__ri", "listener_position"}
    assert not any(np.iscomplexobj(v) for v in enc.values())
    dec = decode_batch({k: jnp.asarray(v) for k, v in enc.items()})
    np.testing.assert_allclose(np.asarray(dec["z_values"]), batch["z_values"])
    np.testing.assert_array_equal(
        np.asarray(dec["listener_position"]), batch["listener_position"]
    )


def test_device_early_response_ri_matches_host_rfft():
    rng = np.random.RandomState(3)
    nfft = 256
    early = rng.randn(5, 48).astype(np.float32)
    ri = np.asarray(device_early_response_ri(early, nfft))
    ref = np.fft.rfft(early, n=nfft, axis=-1)
    assert ri.shape == (5, nfft // 2 + 1, 2)
    np.testing.assert_allclose(ri[..., 0], ref.real, atol=1e-3)
    np.testing.assert_allclose(ri[..., 1], ref.imag, atol=1e-3)


def test_device_target_spectra_ri_cached_per_arrays_object():
    class _Arrays:
        pass

    rng = np.random.RandomState(4)
    a = _Arrays()
    a.target_rir_response = (
        rng.randn(3, 9) + 1j * rng.randn(3, 9)
    ).astype(np.complex64)
    first = device_target_spectra_ri(a)
    assert device_target_spectra_ri(a) is first  # upload happens once
    np.testing.assert_allclose(
        np.asarray(first)[..., 0], a.target_rir_response.real
    )
