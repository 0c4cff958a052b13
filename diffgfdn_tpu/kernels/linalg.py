"""Complex batched small-matrix inverse/solve for the FDN feedback loop.

The hottest kernel in training is inverting (D(z) Gamma^-1(z) - A(z)) at
every rFFT bin — K ~ 65k independent N x N complex matrices with N = 12..27
(reference: feedback_loop.py:376-391 uses torch.linalg.inv on complex64).

TPU-native strategy: embed each complex matrix M = Mr + i Mi into the real
2N x 2N block matrix [[Mr, -Mi], [Mi, Mr]] and invert that with XLA's real
batched LU. The top-left / bottom-left N x N blocks of the result are the
real / imaginary parts of M^-1. This keeps the whole computation in f32 on
hardware paths XLA tiles well, avoids complex-decomposition support gaps,
and differentiates cleanly. A fused Pallas Gauss-Jordan kernel (bins across
lanes) is the planned follow-up for the same interface.
"""

import jax.numpy as jnp


def _real_embed(m: jnp.ndarray) -> jnp.ndarray:
    """(..., N, N) complex -> (..., 2N, 2N) real block embedding."""
    mr = jnp.real(m)
    mi = jnp.imag(m)
    top = jnp.concatenate([mr, -mi], axis=-1)
    bot = jnp.concatenate([mi, mr], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cinv(m: jnp.ndarray) -> jnp.ndarray:
    """Batched complex matrix inverse via the real 2N x 2N embedding."""
    n = m.shape[-1]
    big = jnp.linalg.inv(_real_embed(m))
    re = big[..., :n, :n]
    im = big[..., n:, :n]
    return (re + 1j * im).astype(jnp.complex64)


def csolve(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M X = B for batched complex M (..., N, N), B (..., N, K)."""
    n = m.shape[-1]
    rhs = jnp.concatenate([jnp.real(b), jnp.imag(b)], axis=-2)
    big = jnp.linalg.solve(_real_embed(m), rhs)
    return (big[..., :n, :] + 1j * big[..., n:, :]).astype(jnp.complex64)
