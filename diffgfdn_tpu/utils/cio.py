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
    dev = jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)

    @jax.jit
    def _rfft_ri(t):
        s = jnp.fft.rfft(t, n=num_freq_bins, axis=-1)
        return jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1).astype(
            jnp.float32
        )

    return _rfft_ri(dev)


def device_target_spectra_ri(arrays):
    """Device-resident re/im stack of ``arrays.target_rir_response``.

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
