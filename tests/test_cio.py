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


def test_quantize_int8_blocks_round_trip_snr():
    from diffgfdn_tpu.utils.cio import quantize_int8_blocks

    rng = np.random.RandomState(5)
    # decaying noise like an RIR, plus an exactly-zero block
    t = np.arange(4096, dtype=np.float32)
    x = (rng.randn(3, 4096) * np.exp(-t / 800.0)[None]).astype(np.float32)
    x[:, 1024:1280] = 0.0
    q, scale, T = quantize_int8_blocks(x, block=256)
    assert q.dtype == np.int8 and T == 4096
    deq = (q.astype(np.float32) * scale).reshape(3, -1)[:, :T]
    # zero blocks come back exactly zero
    np.testing.assert_array_equal(deq[:, 1024:1280], 0.0)
    # per-sample error bounded by half an LSB of the block scale
    err = np.abs(deq - x)
    bound = np.repeat(scale[..., 0], 256, axis=-1)[:, :T] * 0.5 + 1e-12
    assert np.all(err <= bound)
    # energy SNR comfortably above 38 dB for noise-like blocks
    snr = 10 * np.log10(np.sum(x**2) / max(np.sum((deq - x) ** 2), 1e-30))
    assert snr > 38.0


def test_device_target_rir_time_quantized_edc_parity(monkeypatch):
    from diffgfdn_tpu.utils import cio

    rng = np.random.RandomState(6)
    T = 2048
    decay = np.exp(-np.arange(T, dtype=np.float32) / 400.0)
    rirs = (rng.randn(4, T) * decay[None]).astype(np.float32)

    class _Arrays:
        pass

    a = _Arrays()
    a.target_rir_time = rirs
    monkeypatch.setattr(cio, "_QUANT_MIN_BYTES", 0)  # force the int8 path
    dev = np.asarray(cio.device_target_rir_time(a))
    assert dev.shape == rirs.shape
    # Schroeder EDC targets (the actual consumer) must match within
    # a far tighter tolerance than any loss cares about
    def edc_db(x):
        e = np.cumsum((x**2)[..., ::-1], axis=-1)[..., ::-1]
        return 10 * np.log10(np.maximum(e, 1e-12))

    d_exact, d_quant = edc_db(rirs), edc_db(dev)
    keep = d_exact > (d_exact[..., :1] - 60.0)  # above the -60 dB knee
    # worst case sits at the knee itself, where the remaining integral is
    # a handful of samples; even there the bias stays ~0.06 dB — invisible
    # against the ~50 dB EDC loss scale
    assert np.max(np.abs(d_quant - d_exact)[keep]) < 0.1


def test_device_target_spectra_ri_from_time_matches_host_rfft():
    from diffgfdn_tpu.utils.cio import device_target_spectra_ri

    class _Arrays:
        pass

    rng = np.random.RandomState(7)
    T = 128
    a = _Arrays()
    a.target_rir_time = rng.randn(3, 96).astype(np.float32)
    a.z_values = np.exp(
        2j * np.pi * np.fft.rfftfreq(T)
    ).astype(np.complex64)
    ri = np.asarray(device_target_spectra_ri(a))
    ref = np.fft.rfft(a.target_rir_time, n=T, axis=-1)
    assert ri.shape == (3, T // 2 + 1, 2)
    np.testing.assert_allclose(ri[..., 0], ref.real, atol=1e-3)
    np.testing.assert_allclose(ri[..., 1], ref.imag, atol=1e-3)
