"""Position-conditioned gain / filter heads.

Reference behaviour: gain_filters.py:262-555 (SVF_from_MLP, Gains_from_MLP),
rebuilt without the reference's per-(batch, group) python loops: the MLP
emits SVF (resonance, gain-dB) grids that are converted to biquad cascades
and evaluated at all z points in one batched closed form
(:func:`diffgfdn_tpu.ops.biquad.svf_to_biquad`).
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config.schema import FeatureEncodingType
from ..ops.biquad import (
    SVF_HIGHSHELF,
    SVF_LOWSHELF,
    SVF_PEAKING,
    sos_frequency_response,
    svf_to_biquad,
)
from ..ops.geq import eq_freqs
from .dnn import MLP, one_hot_mesh_encoding, scaled_sigmoid, SinusoidalEncoding


def svf_cutoff_frequencies(sample_rate: float) -> np.ndarray:
    """Normalized SVF cutoffs: pi * [low-shelf xover, octave centres, high xover] / fs.

    Reference: model.py:714-719 — the GEQ octave grid drives the SVF cascade.
    """
    centre, shelving = eq_freqs()
    freqs = np.concatenate(([shelving[0]], centre, [shelving[-1]]))
    return np.pi * freqs / sample_rate


def svf_filter_types(num_biquads: int) -> np.ndarray:
    """Cascade types: low shelf, peaking ... peaking, high shelf."""
    types = np.full(num_biquads, SVF_PEAKING, dtype=np.int32)
    types[0] = SVF_LOWSHELF
    types[-1] = SVF_HIGHSHELF
    return types


def svf_params_to_biquads(
    svf_params: jnp.ndarray,
    cutoffs: np.ndarray,
    compress_pole_factor: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Constrained SVF params -> biquad (num, den) triples (..., K, 3)."""
    res = scaled_sigmoid(svf_params[..., 0], 1e-6, 1.0)
    g_db = scaled_sigmoid(svf_params[..., 1], -6.0, 6.0)
    k = svf_params.shape[-2]
    ftypes = jnp.asarray(svf_filter_types(k))
    cut = jnp.asarray(cutoffs, jnp.float32)
    shape = (1,) * (svf_params.ndim - 2) + (k,)
    return svf_to_biquad(
        cut.reshape(shape), res, ftypes.reshape(shape), g_db, compress_pole_factor
    )


def svf_params_to_response(
    svf_params: jnp.ndarray,
    cutoffs: np.ndarray,
    z: jnp.ndarray,
    compress_pole_factor: float = 1.0,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Constrained SVF params -> cascade frequency response.

    ``svf_params``: (..., K, 2) raw MLP outputs; channel 0 is resonance
    (constrained to (1e-6, 1)), channel 1 gain in dB (constrained to
    (-6, 6)). Returns (response (..., F), num (..., K, 3), den (..., K, 3)).
    ``use_pallas`` is a TPU-placement assertion (fused cascade kernel,
    kernels.pallas_sos).
    """
    res = scaled_sigmoid(svf_params[..., 0], 1e-6, 1.0)
    g_db = scaled_sigmoid(svf_params[..., 1], -6.0, 6.0)
    k = svf_params.shape[-2]
    ftypes = jnp.asarray(svf_filter_types(k))
    cut = jnp.asarray(cutoffs, jnp.float32)
    shape = (1,) * (svf_params.ndim - 2) + (k,)
    num, den = svf_to_biquad(
        cut.reshape(shape), res, ftypes.reshape(shape), g_db, compress_pole_factor
    )
    if use_pallas:
        from ..kernels.pallas_sos import sos_cascade_response_pallas

        bshape = jnp.broadcast_shapes(num.shape, den.shape)
        resp = sos_cascade_response_pallas(
            jnp.broadcast_to(num, bshape),
            jnp.broadcast_to(den, bshape),
            z,
            interpret=False,
        )
    else:
        resp = sos_frequency_response(num, den, z)
    return resp, num, den


class SVFFromMLP(nn.Module):
    """MLP: position -> SVF cascade per group -> per-group filter response.

    Returns (B, G, F) complex responses (the caller broadcasts groups to
    delay lines). Reference: gain_filters.py:262-433.
    """

    sample_rate: float
    num_groups: int
    num_fourier_features: int
    num_hidden_layers: int
    num_neurons: int
    encoding_type: FeatureEncodingType = FeatureEncodingType.SINE
    compress_pole_factor: float = 1.0
    position_key: str = "listener_position"
    # fused Pallas cascade kernel; a TPU-placement assertion resolved at
    # model build time (see utils.placement)
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: dict, return_params: bool = False):
        z = x["z_values"]
        position = x[self.position_key]
        cutoffs = svf_cutoff_frequencies(self.sample_rate)
        num_biquads = len(cutoffs)

        if self.encoding_type == FeatureEncodingType.SINE:
            feats = SinusoidalEncoding(self.num_fourier_features)(position)
            svf = MLP(
                self.num_hidden_layers,
                self.num_neurons,
                self.num_groups,
                num_biquads,
                2,
            )(feats)
        else:
            mesh_inp, _, rec_idx = one_hot_mesh_encoding(x["mesh_2d"], position)
            svf_all = MLP(
                self.num_hidden_layers,
                self.num_neurons,
                self.num_groups,
                num_biquads,
                2,
            )(mesh_inp)
            svf = svf_all[rec_idx]

        resp, num, den = svf_params_to_response(
            svf, cutoffs, z, self.compress_pole_factor,
            use_pallas=self.use_pallas,
        )
        if return_params:
            res = scaled_sigmoid(svf[..., 0], 1e-6, 1.0)
            g_db = scaled_sigmoid(svf[..., 1], -6.0, 6.0)
            return resp, {
                "svf_params": jnp.stack([res, g_db], axis=-1),
                "biquad_num": num,
                "biquad_den": den,
            }
        return resp


class GainsFromMLP(nn.Module):
    """MLP: position -> bounded scalar gain per group, shape (B, G).

    Reference: gain_filters.py:436-555.
    """

    num_groups: int
    num_fourier_features: int
    num_hidden_layers: int
    num_neurons: int
    encoding_type: FeatureEncodingType = FeatureEncodingType.SINE
    position_key: str = "norm_listener_position"
    gain_limits: Tuple[float, float] = (-1.0, 1.0)

    @nn.compact
    def __call__(self, x: dict) -> jnp.ndarray:
        position = x[self.position_key]
        if self.encoding_type == FeatureEncodingType.SINE:
            feats = SinusoidalEncoding(self.num_fourier_features)(position)
            out = MLP(
                self.num_hidden_layers, self.num_neurons, self.num_groups, 1, 1
            )(feats)
        else:
            # mesh_2d is in METERS: the nearest-point lookup must use the
            # raw listener position (this head's default position_key is
            # the [0,1]-normalized one, which collapsed every receiver
            # onto the origin-corner mesh point)
            mesh_inp, _, rec_idx = one_hot_mesh_encoding(
                x["mesh_2d"], x["listener_position"]
            )
            out_all = MLP(
                self.num_hidden_layers, self.num_neurons, self.num_groups, 1, 1
            )(mesh_inp)
            out = out_all[rec_idx]
        gains = out[..., 0, 0]  # (B, G)
        return scaled_sigmoid(gains, self.gain_limits[0], self.gain_limits[1])


def expand_groups_to_delay_lines(
    per_group: jnp.ndarray, num_delay_lines_per_group: int, axis: int = 1
) -> jnp.ndarray:
    """Repeat per-group values so each delay line in a group shares them."""
    return jnp.repeat(per_group, num_delay_lines_per_group, axis=axis)
