"""Common-slopes spatial-sampling models (directional + omni amplitude DNNs).

Reference behaviour: spatial_sampling/model.py:17-332. The SH analysis
matrix is built host-side from our own SH machinery
(:mod:`diffgfdn_tpu.ops.sph`, replacing spaudiopy) and baked into the jit
program as a constant.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config.schema import BeamformerType
from ..ops.sph import design_sph_filterbank, modal_weights
from .dnn import (
    ConvNet,
    MLP,
    MLPSkipConnections,
    scaled_sigmoid,
    sigmoid,
    SinusoidalEncoding,
)


def build_analysis_matrix(
    ambi_order: int,
    desired_directions: np.ndarray,
    beamformer_type: Optional[BeamformerType],
) -> np.ndarray:
    """SH-domain analysis (beamforming) matrix, (num_directions, (N+1)^2).

    ``desired_directions``: (2, J) stacked (azimuth, polar/elevation-from-
    zenith measured as latitude in the reference convention). The reference
    passes (azi, pi/2 - polar) to spaudiopy (spatial_sampling/model.py:66-76);
    we accept (azi, colat) directly via ``sph.design_sph_filterbank``.
    """
    c_n = modal_weights(beamformer_type, ambi_order)
    azi = desired_directions[0]
    colat = np.pi / 2 - desired_directions[1]
    analysis, _ = design_sph_filterbank(ambi_order, azi, colat, c_n, mode="energy")
    return analysis.astype(np.float32)


def normalise_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """Unit-energy normalization along the SH-component axis."""
    return weights / (jnp.linalg.norm(weights, axis=-1, keepdims=True) + 1e-6)


def directional_amplitudes(
    analysis_matrix: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """sigmoid(Y_analysis @ w): (B, num_directions, num_slopes).

    ``weights``: (B, num_slopes, (N+1)^2). Reference:
    spatial_sampling/model.py:82-93.
    """
    out = jnp.einsum("jn,bkn->bjk", analysis_matrix, weights)
    return sigmoid(out)


class DirectionalBeamformerWeightsMLP(nn.Module):
    """MLP: receiver position -> SH beamforming weights per slope.

    Output (B, num_groups, (ambi_order+1)^2). Reference:
    spatial_sampling/model.py:119-190.
    """

    num_groups: int
    ambi_order: int
    num_fourier_features: int
    num_hidden_layers: int
    num_neurons: int
    use_skip_connections: bool = False

    @nn.compact
    def __call__(self, x: dict, normalise: bool = False) -> jnp.ndarray:
        position = x["norm_listener_position"]
        feats = SinusoidalEncoding(self.num_fourier_features)(position)
        num_out = (self.ambi_order + 1) ** 2
        mlp_cls = MLPSkipConnections if self.use_skip_connections else MLP
        out = mlp_cls(
            self.num_hidden_layers, self.num_neurons, self.num_groups, 1, num_out
        )(feats)
        weights = out.reshape(position.shape[0], self.num_groups, num_out)
        if normalise:
            weights = normalise_weights(weights)
        return weights


class DirectionalBeamformerWeightsCNN(nn.Module):
    """CNN over the floor-plan mesh -> SH beamforming weights per slope.

    Input mesh (H, W, 2); output (H*W, num_groups, (N+1)^2). Reference:
    spatial_sampling/model.py:193-249.
    """

    num_groups: int
    ambi_order: int
    num_fourier_features: int
    num_hidden_channels: int
    num_layers: int = 3
    kernel_size: Sequence[int] = (3, 3)

    @nn.compact
    def __call__(self, x: dict) -> jnp.ndarray:
        mesh = x["mesh_2d"]  # (H, W, 2)
        h, w, ncoord = mesh.shape
        flat = mesh.reshape(h * w, ncoord)
        feats = SinusoidalEncoding(self.num_fourier_features)(flat)
        feats = feats.reshape(h, w, -1)
        num_out = (self.ambi_order + 1) ** 2
        out = ConvNet(
            num_out,
            self.num_groups,
            self.num_hidden_channels,
            self.num_layers,
            tuple(self.kernel_size),
        )(feats)
        return out.reshape(h * w, self.num_groups, num_out)


class OmniAmplitudesMLP(nn.Module):
    """MLP: receiver position -> per-slope omni CS amplitudes (B, num_groups).

    Reference: spatial_sampling/model.py:252-332.
    """

    num_groups: int
    num_fourier_features: int
    num_hidden_layers: int
    num_neurons: int
    gain_limits: Tuple[float, float] = (-1.0, 1.0)

    @nn.compact
    def __call__(self, x: dict) -> jnp.ndarray:
        position = x["norm_listener_position"]
        feats = SinusoidalEncoding(self.num_fourier_features)(position)
        out = MLP(self.num_hidden_layers, self.num_neurons, self.num_groups, 1, 1)(
            feats
        )
        gains = out[..., 0, 0]
        return scaled_sigmoid(gains, self.gain_limits[0], self.gain_limits[1])
