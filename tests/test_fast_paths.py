"""Scalar-head fast paths are numerically identical to the general route."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.models import DiffGFDNVarReceiverPos, DiffGFDNVarSourceReceiverPos
from diffgfdn_tpu.models.gain_heads import expand_groups_to_delay_lines
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
from diffgfdn_tpu.ops.basic import get_frequency_samples

FS = 8000.0
DELAYS = (163, 179, 191, 211, 223, 227)


def _gains():
    out = []
    for k, t60 in enumerate((0.05, 0.08, 0.06)):
        d = np.asarray(DELAYS[2 * k : 2 * k + 2])
        out.append(np.asarray(decay_times_to_gain_per_sample(t60, d, FS)))
    return np.concatenate(out)


def _features(batch=4, nbins=129):
    rng = np.random.RandomState(0)
    pos = rng.rand(batch, 3).astype(np.float32)
    return {
        "z_values": get_frequency_samples(nbins),
        "source_position": jnp.asarray(rng.rand(batch, 3).astype(np.float32)),
        "listener_position": jnp.asarray(pos),
        "norm_listener_position": jnp.asarray(pos),
        "target_early_response": jnp.asarray(
            (rng.randn(batch, nbins) * 0.01).astype(np.complex64)
        ),
    }


def test_var_receiver_scalar_fast_path_matches_general():
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS, num_groups=3, delays=DELAYS, gains=_gains(),
        use_svf_in_output=False, num_hidden_layers=1, num_neurons=16,
        num_fourier_features=4,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(0), x)
    h_fast = model.apply(params, x)

    # general-path reference: broadcast C/B over frequency explicitly
    def general(params, x):
        def run(mdl):
            z = x["z_values"]
            batch = x["listener_position"].shape[0]
            f = z.shape[0]
            nper = mdl.num_delay_lines_per_group
            g = mdl.output_scalars(x)
            c_mod = expand_groups_to_delay_lines(g, nper).astype(jnp.complex64)[
                ..., None
            ]
            c = jnp.broadcast_to(
                c_mod * mdl.output_gains.astype(jnp.complex64)[None],
                (batch, mdl.num_delay_lines, f),
            )
            b = jnp.broadcast_to(
                mdl.input_gains.astype(jnp.complex64)[None],
                (batch, mdl.num_delay_lines, f),
            )
            return mdl.transfer_function(z, c, b, x["target_early_response"])

        return model.apply(params, method=run)

    h_gen = general(params, x)
    assert np.max(np.abs(np.asarray(h_fast) - np.asarray(h_gen))) < 1e-4


def test_var_source_receiver_scalar_fast_path_matches_general():
    model = DiffGFDNVarSourceReceiverPos(
        sample_rate=FS, num_groups=3, delays=DELAYS, gains=_gains(),
        use_svf_in_output=False, use_svf_in_input=False,
        num_hidden_layers=1, num_neurons=16, num_fourier_features=4,
        input_num_hidden_layers=1, input_num_neurons=16,
        input_num_fourier_features=4,
    )
    x = _features()
    params = model.init(jax.random.PRNGKey(1), x)
    h_fast = model.apply(params, x)

    def general(params, x):
        def run(mdl):
            z = x["z_values"]
            batch = x["listener_position"].shape[0]
            f = z.shape[0]
            nper = mdl.num_delay_lines_per_group
            n = mdl.num_delay_lines
            c_mod = expand_groups_to_delay_lines(
                mdl.output_scalars(x), nper
            ).astype(jnp.complex64)[..., None]
            b_mod = expand_groups_to_delay_lines(
                mdl.input_scalars(x), nper
            ).astype(jnp.complex64)[..., None]
            c = jnp.broadcast_to(
                c_mod * mdl.output_gains.astype(jnp.complex64)[None],
                (batch, n, f),
            )
            b = jnp.broadcast_to(
                b_mod * mdl.input_gains.astype(jnp.complex64)[None],
                (batch, n, f),
            )
            return mdl.transfer_function(z, c, b, x["target_early_response"])

        return model.apply(params, method=run)

    h_gen = general(params, x)
    assert np.max(np.abs(np.asarray(h_fast) - np.asarray(h_gen))) < 1e-4
