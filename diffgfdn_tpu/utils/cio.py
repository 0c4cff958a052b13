"""Complex I/O codec for the jit boundary.

The TPU backend in this environment does not support complex64 arrays
crossing the host<->device boundary (device_put and fetch both fail with
UNIMPLEMENTED), while complex math *inside* jitted programs is fully
supported. Every trainer therefore encodes batches before a jitted call —
complex arrays become float32 ``(..., 2)`` re/im stacks under a ``__ri``
key suffix — and decodes them as the first traced operation.
"""

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

RI_SUFFIX = "__ri"


def encode_complex(x):
    """complex array -> float32 (..., 2) re/im stack (numpy or jnp).

    For C-contiguous numpy complex64 input this is a ZERO-COPY view:
    complex64's memory layout is exactly the interleaved (re, im) float32
    pair, so the ``__ri`` encoding is a reinterpret-cast, not a ~2x-sized
    host copy (at the 838 x 65537 production scale the stack cost ~8 s of
    single-core memcpy per plane). The view aliases the input — callers
    treat encoded batches as read-only.
    """
    if (
        isinstance(x, np.ndarray)
        and x.dtype == np.complex64
        and x.flags.c_contiguous
    ):
        return x.view(np.float32).reshape(*x.shape, 2)
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return xp.stack([xp.real(x), xp.imag(x)], axis=-1).astype(xp.float32)


def to_real_pair(x):
    """Alias used for returning complex results out of jit."""
    return encode_complex(x)


def encode_batch(batch: Dict) -> Dict:
    """Encode every complex entry of a batch dict (host side)."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v) if not isinstance(v, jnp.ndarray) else v
        if np.iscomplexobj(v):
            out[k + RI_SUFFIX] = encode_complex(v)
        else:
            out[k] = v
    return out


def decode_batch(batch: Dict) -> Dict:
    """Inverse of :func:`encode_batch`; call as the first traced op."""
    out = {}
    for k, v in batch.items():
        if k.endswith(RI_SUFFIX):
            out[k[: -len(RI_SUFFIX)]] = (v[..., 0] + 1j * v[..., 1]).astype(
                jnp.complex64
            )
        else:
            out[k] = v
    return out


def device_early_response_ri(early_time, num_freq_bins: int, sharding=None):
    """Early-RIR spectrum computed ON DEVICE from its time samples.

    The faded early segment is only mixing_time samples long, so shipping
    it (~2 MB at production scale) and running the rfft on device replaces
    a ~440 MB (R, F) complex-spectrum upload over the tunnel. Returns the
    float32 ``(R, F, 2)`` re/im stack ``target_early_response__ri``
    expects (complex64 cannot cross the jit boundary on this backend).
    """
    x = np.ascontiguousarray(np.asarray(early_time), dtype=np.float32)
    dev = fast_device_put(x, sharding)

    @jax.jit
    def _rfft_ri(t):
        s = jnp.fft.rfft(t, n=num_freq_bins, axis=-1)
        return jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1).astype(
            jnp.float32
        )

    return _rfft_ri(dev)


def fast_device_put(x, sharding=None):
    """Single choke point for host->device uploads of large planes.

    MEASURED on this environment's tunneled TPU: the transport sustains
    anywhere from ~2 to ~40 MB/s depending on load windows, and float16 /
    int16 payloads consistently hit a pathologically slow serialization
    path (~0.8-2.5 MB/s even in windows where int8/int32/float32 move at
    10-40 MB/s) — so large payloads must never cross as 16-bit dtypes.
    Kept as a named wrapper so upload policy stays changeable in one
    place.
    """
    x = np.asarray(x) if not isinstance(x, jnp.ndarray) else x
    return (
        jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)
    )


# int8 block quantization of the big RIR-target payload: below this byte
# count a plain float32 upload is sub-second even in a slow window
_QUANT_MIN_BYTES = 64 * 1024 * 1024
_QUANT_BLOCK = 256


def quantize_int8_blocks(x: np.ndarray, block: int = _QUANT_BLOCK):
    """(q, scale, T): per-block max-scaled int8 quantization of (R, T).

    Each length-``block`` slice is scaled by its own |max| and rounded to
    int8 — 4x fewer bytes than float32 over the tunnel. For noise-like
    RIR blocks (peak/rms ~3-4) the per-sample SNR is ~42 dB, and uniform
    quantization noise biases the Schroeder EDC by 10*log10(1+10^-4.2)
    < 0.0003 dB — invisible against the ~50 dB loss scale. All-zero
    blocks stay exactly zero.
    """
    R, T = x.shape
    pad = (-T) % block
    if pad:
        x = np.pad(x, ((0, 0), (0, pad)))
    blocks = x.reshape(R, -1, block)
    scale = np.abs(blocks).max(axis=-1, keepdims=True).astype(np.float32)
    safe = np.where(scale == 0, np.float32(1.0), scale)
    q = np.clip(np.round(blocks / safe * 127.0), -127, 127).astype(np.int8)
    return q, (safe / np.float32(127.0)), T


def device_target_rir_time(arrays):
    """Device-resident float32 time-domain target RIRs, cached.

    Production-scale grids ship as per-block int8 (quantize_int8_blocks):
    ~110 MB instead of the ~440 MB complex64 spectra the reference-style
    flow would upload, over a tunnel measured as low as ~2 MB/s in bad
    windows — bytes are the only reliable lever. Dequantization and the
    target rfft run on device. Small grids upload exact float32.
    """
    cached = getattr(arrays, "_device_rir_time", None)
    if cached is not None:
        return cached
    t = np.ascontiguousarray(np.asarray(arrays.target_rir_time), np.float32)
    if t.nbytes >= _QUANT_MIN_BYTES:
        q, scale, T = quantize_int8_blocks(t)
        dq = jnp.asarray(q)
        ds = jnp.asarray(scale)

        @jax.jit
        def _dequant(qd, sd):
            x = qd.astype(jnp.float32) * sd
            return x.reshape(qd.shape[0], -1)[:, :T]

        dev = _dequant(dq, ds)
    else:
        dev = jnp.asarray(t)
    arrays._device_rir_time = dev
    return dev


def device_target_spectra_ri(arrays):
    """Device-resident re/im stack of ``arrays.target_rir_response``.

    When the arrays carry raw time samples (``target_rir_time``), the
    spectra are computed ON DEVICE from the int8-shipped time upload
    (device_target_rir_time) — 4x fewer tunnel bytes, and the host never
    runs its full-grid rfft at all (the dataset's spectra are lazy).
    Otherwise falls back to uploading the host spectra directly.

    Cached on the arrays object: the subband pipeline precomputes target
    features once per ARCHITECTURE GROUP, and re-uploading the full
    (R, F) spectra per group costs ~440 MB of tunnel traffic each at
    production scale. The arrays object is treated as immutable by every
    trainer (it is rebuilt from the dataset on any change), so the cache
    cannot go stale.
    """
    cached = getattr(arrays, "_device_spectra_ri", None)
    if cached is not None:
        return cached
    t = getattr(arrays, "target_rir_time", None)
    if t is not None:
        nfft = 2 * (arrays.z_values.shape[0] - 1)
        dev_t = device_target_rir_time(arrays)

        @jax.jit
        def _rfft_ri(x):
            s = jnp.fft.rfft(x, n=nfft, axis=-1)
            return jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1).astype(
                jnp.float32
            )

        dev = _rfft_ri(dev_t)
    else:
        tgt = np.ascontiguousarray(arrays.target_rir_response, np.complex64)
        dev = jnp.asarray(encode_complex(tgt))  # zero-copy re/im view
    arrays._device_spectra_ri = dev
    return dev


INIT_FREQ_BINS = 2049


def shrink_init_batch(batch: Dict, nbins: int = INIT_FREQ_BINS) -> Dict:
    """Copy of a batch with the frequency axis truncated, for init only.

    Parameter shapes AND initializer draws are independent of the
    frequency-axis length, so tracing ``model.init`` on a short z grid
    yields bit-identical parameters while the init compile drops from
    ~18 s (nfft=131072) to ~1 s. Only the z grid and the spectral target
    planes are truncated; every other entry is passed through.
    """
    if "z_values" not in batch:
        return batch
    f = np.asarray(batch["z_values"]).shape[0]
    if not nbins or f <= nbins:
        return batch
    out = dict(batch)
    out["z_values"] = batch["z_values"][:nbins]
    for k in (
        "target_early_response",
        "target_late_response",
        "target_rir_response",
    ):
        v = batch.get(k)
        if v is not None and np.asarray(v).shape[-1] == f:
            out[k] = v[..., :nbins]
    return out


def init_with_batch(model, key, batch: Dict):
    """model.init under jit with complex-free inputs (TPU-safe).

    Init traces on a frequency-truncated copy of the batch (see
    :func:`shrink_init_batch`) — parameters are identical, the one-shot
    compile is ~20x cheaper at production nfft.
    """
    enc = encode_batch(shrink_init_batch(batch))

    @jax.jit
    def _init(k, b):
        return model.init(k, decode_batch(b))

    return _init(key, enc)
