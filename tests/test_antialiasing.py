"""Reduced-pole-radius anti-aliasing round trip (SURVEY §5.7).

Sampling H on |z| = 1/rho > 1 then multiplying the IR by (1/rho)^n must
reproduce the unit-circle IR (for an alias-free configuration), and the
TrainerConfig must derive rho from the alias attenuation.
"""

import jax
import numpy as np

from diffgfdn_tpu.config.schema import TrainerConfig
from diffgfdn_tpu.models import FeedbackLoop
from diffgfdn_tpu.config.schema import CouplingMatrixType
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
from diffgfdn_tpu.ops.basic import get_frequency_samples


def test_reduced_pole_radius_from_config():
    cfg = TrainerConfig(num_freq_bins=131072, alias_attenuation_db=60)
    assert np.isclose(cfg.reduced_pole_radius, 10 ** (-60 / 131072 / 20))
    cfg2 = TrainerConfig(num_freq_bins=131072)
    assert cfg2.reduced_pole_radius == 1.0


def test_radius_sampling_roundtrip():
    fs = 8000.0
    delays = (163, 179, 191, 211)
    nfft = 8192
    gains = np.asarray(
        decay_times_to_gain_per_sample(0.08, np.asarray(delays), fs)
    )
    loop = FeedbackLoop(
        sample_rate=fs, num_groups=2, num_delay_lines_per_group=2,
        delays=delays, coupling_matrix_type=CouplingMatrixType.SCALAR,
        use_zero_coupling=False, gains=gains,
    )
    f = nfft // 2 + 1
    z1 = get_frequency_samples(f)
    params = loop.init(jax.random.PRNGKey(0), z1)
    rho = 10 ** (-60 / nfft / 20)
    zr = get_frequency_samples(f, radius=1.0 / rho)

    rng = np.random.RandomState(0)
    b = rng.randn(4)
    c = rng.randn(4)

    def rir_from(z, envelope):
        p = np.asarray(loop.apply(params, z))
        h = np.einsum("n,fnm,m->f", c, p, b)
        r = np.fft.irfft(h, nfft)
        if envelope:
            r = r * (1.0 / rho) ** np.arange(nfft)
        return r

    rir_unit = rir_from(z1, False)
    rir_radius = rir_from(zr, True)
    scale = np.max(np.abs(rir_unit))
    assert np.max(np.abs(rir_unit - rir_radius)) < 2e-3 * scale
