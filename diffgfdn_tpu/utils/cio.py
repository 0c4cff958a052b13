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
    """complex array -> float32 (..., 2) re/im stack (numpy or jnp)."""
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


def init_with_batch(model, key, batch: Dict):
    """model.init under jit with complex-free inputs (TPU-safe)."""
    enc = encode_batch(batch)

    @jax.jit
    def _init(k, b):
        return model.init(k, decode_batch(b))

    return _init(key, enc)
