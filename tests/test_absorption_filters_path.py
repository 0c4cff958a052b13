"""Frequency-dependent absorption (GEQ / Prony filters) in the feedback loop."""

import jax
import jax.numpy as jnp
import numpy as np

from diffgfdn_tpu.config.schema import (
    ColorlessFDNConfig,
    CouplingMatrixType,
    DiffGFDNConfig,
    OutputFilterConfig,
    TrainerConfig,
)
from diffgfdn_tpu.models import FeedbackLoop
from diffgfdn_tpu.ops.absorption import (
    decay_times_to_gain_filters_geq,
    decay_times_to_gain_filters_prony,
)
from diffgfdn_tpu.ops.basic import get_frequency_samples

FS = 8000.0
DELAYS = (499, 601, 727, 809)
BANDS = np.array([125.0, 250.0, 500.0, 1000.0, 2000.0])


def test_feedback_loop_with_geq_absorption():
    t60 = np.linspace(0.5, 0.2, len(BANDS))
    coeffs = decay_times_to_gain_filters_geq(BANDS, t60, DELAYS, FS)
    loop = FeedbackLoop(
        sample_rate=FS, num_groups=2, num_delay_lines_per_group=2,
        delays=DELAYS, coupling_matrix_type=CouplingMatrixType.SCALAR,
        sos_coeffs=coeffs,
    )
    z = get_frequency_samples(257)
    params = loop.init(jax.random.PRNGKey(0), z)
    p = loop.apply(params, z)
    assert p.shape == (257, 4, 4)
    assert np.all(np.isfinite(np.asarray(jnp.abs(p))))
    # the absorption response at the band centres matches the target decay
    gamma = np.asarray(
        loop.apply(params, z, method=FeedbackLoop.gamma_response)
    )
    freqs_hz = np.angle(np.asarray(z)) * FS / (2 * np.pi)
    for b, fc in enumerate(BANDS):
        idx = int(np.argmin(np.abs(freqs_hz - fc)))
        target = (10 ** (-3 / FS / t60[b])) ** DELAYS[0]
        assert abs(
            20 * np.log10(abs(gamma[0, idx])) - 20 * np.log10(target)
        ) < 3.0


def test_feedback_loop_with_prony_absorption():
    t60 = np.linspace(0.5, 0.25, len(BANDS))
    coeffs = decay_times_to_gain_filters_prony(
        BANDS, t60, DELAYS, FS, filter_order=8, num_freq_bins=1024
    )
    loop = FeedbackLoop(
        sample_rate=FS, num_groups=2, num_delay_lines_per_group=2,
        delays=DELAYS, coupling_matrix_type=CouplingMatrixType.SCALAR,
        iir_coeffs=coeffs,
    )
    z = get_frequency_samples(129)
    params = loop.init(jax.random.PRNGKey(0), z)
    p = loop.apply(params, z)
    assert np.all(np.isfinite(np.asarray(jnp.abs(p))))


def test_var_receiver_training_with_absorption_filters(tmp_path):
    """End-to-end: the config's use_absorption_filters=True path trains."""
    from diffgfdn_tpu.data import synthetic_three_room_dataset
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    room = synthetic_three_room_dataset(
        tmp_path, nfft=1024, num_rec_per_room=4, rir_len_s=0.12,
        decay_times=(0.05, 0.08, 0.06),
    )
    # per-band decay times (num_bands, num_groups) trigger the GEQ fit
    room.common_decay_times = np.stack(
        [np.array([0.05, 0.08, 0.06])] * 4
    ) * np.linspace(1.2, 0.8, 4)[:, None]
    room.band_centre_hz = [250.0, 500.0, 1000.0, 2000.0]
    cfg = DiffGFDNConfig(
        seed=21, num_groups=3, sample_rate=8000.0, num_delay_lines=6,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=4, num_freq_bins=1024, max_epochs=1, lr=1e-3,
            train_dir=str(tmp_path / "absf"), ir_dir=str(tmp_path / "absf_a"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": True,
                             "learn_common_decay_times": False},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    assert np.isfinite(trainer.train_loss).all()


def test_learnable_decay_times_training(tmp_path):
    """learn_common_decay_times=True: T60s are trainable parameters."""
    from diffgfdn_tpu.data import synthetic_three_room_dataset
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    room = synthetic_three_room_dataset(
        tmp_path, nfft=1024, num_rec_per_room=4, rir_len_s=0.12,
        decay_times=(0.05, 0.08, 0.06),
    )
    cfg = DiffGFDNConfig(
        seed=22, num_groups=3, sample_rate=8000.0, num_delay_lines=6,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=4, num_freq_bins=1024, max_epochs=2, lr=1e-2,
            train_dir=str(tmp_path / "lct"), ir_dir=str(tmp_path / "lct_a"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": False,
                             "learn_common_decay_times": True,
                             "initialise_with_opt_values": True},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    cdt = np.asarray(params["params"]["feedback_loop"]["common_decay_times"])
    assert cdt.shape == (3,)
    # initialized from the dataset values, then updated by training
    assert not np.allclose(cdt, [0.05, 0.08, 0.06], atol=1e-6)
    # stays plausible (lr=1e-2 Adam moves ~0.01/step; the exact drift is
    # trajectory-dependent, e.g. on how many batches an epoch contains)
    assert np.all(cdt > 0.0) and np.all(cdt < 0.3), cdt
    assert np.allclose(cdt, [0.05, 0.08, 0.06], atol=0.1)
