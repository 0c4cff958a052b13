"""Colorless-FDN losses (reference: colorless_fdn/losses.py:7-73)."""

import jax.numpy as jnp
import numpy as np


def mse_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between |y_pred| and |y_true|."""
    return jnp.mean((jnp.abs(y_pred) - jnp.abs(y_true)) ** 2)


def amse_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric MSE: the power-4 penalty kicks in once the magnitude
    overshoot exceeds 1 (NOT for any overshoot — this mirrors the
    reference's ``p_loss`` threshold, colorless_fdn/losses.py:66-68:
    ``gT = 2 + 2*(|y_pred|-|y_true| > 1)``)."""
    diff = jnp.abs(y_pred) - jnp.abs(y_true)
    exponent = 2.0 + 2.0 * (diff > 1.0).astype(jnp.float32)
    return jnp.mean(jnp.power(jnp.abs(diff), exponent))


def sparsity_loss(a: jnp.ndarray) -> jnp.ndarray:
    """Rewards dense (hadamard-like) orthogonal feedback matrices.

    -(sum|A| - N sqrt(N)) / (N (sqrt(N) - 1)) in [-1, 0] for orthogonal A.
    """
    n = a.shape[-1]
    return -(jnp.sum(jnp.abs(a)) - n * np.sqrt(n)) / (n * (np.sqrt(n) - 1.0))
