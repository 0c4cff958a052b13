"""DNN building blocks: constraints, feature encodings, MLPs, CNN (flax.linen).

Functional parity with the reference's dnn.py (constraints :13-83, encodings
:89-189, CNN :192-264, MLPs :267-400), rewritten as pure functions + linen
modules with vectorized (loop-free) encodings.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# He/Kaiming-uniform init for ReLU stacks (matches the reference's
# ``init.kaiming_uniform_(..., nonlinearity='relu')``).
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


# ------------------------------- constraints ---------------------------------


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Plain logistic sigmoid in (0, 1)."""
    return 1.0 / (1.0 + jnp.exp(-x))


def scaled_sigmoid(x: jnp.ndarray, lower: float, upper: float) -> jnp.ndarray:
    """Sigmoid rescaled to (lower, upper)."""
    return lower + (upper - lower) * sigmoid(x)


def softplus(x: jnp.ndarray) -> jnp.ndarray:
    """log(1 + e^x), always positive."""
    return jnp.log1p(jnp.exp(x))


def scaled_softplus(x: jnp.ndarray, lower: float, upper: float) -> jnp.ndarray:
    """Softplus squashed into (lower, upper)."""
    sp = softplus(x)
    return lower + (upper - lower) * sp / (1.0 + sp)


def tan_sigmoid(x: jnp.ndarray, scale_factor: float = 1.0) -> jnp.ndarray:
    """tan(pi/2 * sigmoid(x)) — positive, unbounded above (SVF frequencies)."""
    return jnp.tan(np.pi * sigmoid(scale_factor * x) * 0.5)


# -------------------------------- encodings ----------------------------------


class SinusoidalEncoding(nn.Module):
    """Fourier-feature position encoding.

    log-spaced frequencies in [1, 32]; emits [sin(f pi x), cos(f pi x)] per
    frequency, so 3 coords -> 3 * num_fourier_features * 2 features
    (reference: dnn.py:89-126). Fully vectorized.
    """

    num_fourier_features: int

    @nn.compact
    def __call__(self, pos: jnp.ndarray) -> jnp.ndarray:
        freqs = jnp.exp(
            jnp.linspace(np.log(1.0), np.log(32.0), self.num_fourier_features)
        )
        # (B, F, D): f_k * pi * x_d
        phase = freqs[None, :, None] * np.pi * pos[:, None, :]
        enc = jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)
        return enc.reshape(pos.shape[0], -1)


def one_hot_mesh_encoding(
    mesh_2d: jnp.ndarray, receiver_pos: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-hot receiver encoding over the floor-plan meshgrid.

    ``mesh_2d``: (L, 2) flattened (x, y) mesh; ``receiver_pos``: (B, >=2).
    Returns (input_tensor (L, 3), closest_points (B, 2), rec_idx (B,)) —
    x, y, and a 1 at the mesh point nearest each receiver
    (reference: dnn.py:129-189, vectorized — no per-receiver loop).
    """
    d2 = (
        (mesh_2d[None, :, 0] - receiver_pos[:, None, 0]) ** 2
        + (mesh_2d[None, :, 1] - receiver_pos[:, None, 1]) ** 2
    )
    rec_idx = jnp.argmin(d2, axis=1)  # (B,)
    one_hot = jnp.zeros((mesh_2d.shape[0],), mesh_2d.dtype).at[rec_idx].set(1.0)
    closest = mesh_2d[rec_idx, :2]
    inp = jnp.concatenate([mesh_2d[:, :2], one_hot[:, None]], axis=1)
    return inp.astype(jnp.float32), closest, rec_idx


# ----------------------------------- MLPs ------------------------------------


class MLP(nn.Module):
    """Linear + LayerNorm + ReLU stack emitting (B, G, K, P) parameters.

    Output reshaped to (batch, num_groups, num_biquads, num_params)
    (reference: dnn.py:331-400).
    """

    num_hidden_layers: int
    num_neurons: int
    num_groups: int
    num_biquads: int = 1
    num_params: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.num_neurons, kernel_init=kaiming_uniform)(x)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        for _ in range(self.num_hidden_layers):
            h = nn.Dense(self.num_neurons, kernel_init=kaiming_uniform)(h)
            h = nn.LayerNorm()(h)
            h = nn.relu(h)
        out = nn.Dense(
            self.num_groups * self.num_biquads * self.num_params,
            kernel_init=kaiming_uniform,
        )(h)
        return out.reshape(
            x.shape[0], self.num_groups, self.num_biquads, self.num_params
        )


class ResidualBlock(nn.Module):
    """Dense + LayerNorm + ReLU with an additive skip."""

    num_neurons: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.num_neurons, kernel_init=kaiming_uniform)(x)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        return h + x


class MLPSkipConnections(nn.Module):
    """ResNet-style MLP (reference: dnn.py:284-328)."""

    num_hidden_layers: int
    num_neurons: int
    num_groups: int
    num_biquads: int = 1
    num_params: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.num_neurons, kernel_init=kaiming_uniform)(x)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        for _ in range(self.num_hidden_layers):
            h = ResidualBlock(self.num_neurons)(h)
        out = nn.Dense(
            self.num_groups * self.num_biquads * self.num_params,
            kernel_init=kaiming_uniform,
        )(h)
        return out.reshape(
            x.shape[0], self.num_groups, self.num_biquads, self.num_params
        )


class ConvNet(nn.Module):
    """2-D CNN over the floor-plan grid (reference: dnn.py:192-264).

    Input (H, W, in_channels); output (H, W, num_groups, out_channels).
    Channels-last (NHWC) — the natural TPU conv layout.
    """

    out_channels: int
    num_groups: int
    hidden_channels: int
    num_layers: int = 3
    kernel_size: Sequence[int] = (3, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x[None]  # add batch dim
        ks = tuple(self.kernel_size)
        h = nn.Conv(self.hidden_channels, ks, padding="SAME")(h)
        h = nn.relu(h)
        for _ in range(self.num_layers - 2):
            h = nn.Conv(self.hidden_channels, ks, padding="SAME")(h)
            h = nn.relu(h)
        h = nn.Conv(self.num_groups * self.out_channels, ks, padding="SAME")(h)
        h = h[0]
        hh, ww, _ = h.shape
        return h.reshape(hh, ww, self.num_groups, self.out_channels)
