"""E2E: subband training config factory, band-parallel CLI path, colorless
warm start through the solver, NAF comparison tools."""

import numpy as np
import pytest

from diffgfdn_tpu.cli.run_subband_training import (
    create_config,
    inferencing,
    training_band_parallel,
)
from diffgfdn_tpu.data import generate_three_room_pickle, synthetic_three_room_dataset
from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    return generate_three_room_pickle(
        tmp_path_factory.mktemp("sb") / "srirs.pkl",
        fs=8000.0,
        num_rec_per_room=6,
        rir_len_s=0.2,
        decay_times=(0.05, 0.09, 0.07),
    )


def test_create_config_per_band(dataset_path, tmp_path):
    cfg = create_config(
        1000.0, str(dataset_path), str(tmp_path), num_freq_bins=1024,
        sample_rate=8000.0,
    )
    sb = cfg.trainer_config.subband_process_config
    assert sb.centre_frequency == 1000.0
    assert cfg.output_filter_config.num_neurons_per_layer == 128
    assert "band_1000Hz" in cfg.trainer_config.train_dir


def test_band_parallel_cli_and_inference(dataset_path, tmp_path):
    freqs = [500.0, 1000.0]
    configs = [
        create_config(
            f, str(dataset_path), str(tmp_path), num_freq_bins=1024,
            sample_rate=8000.0, max_epochs=2, batch_size=8,
            use_colorless_loss=False,
        )
        for f in freqs
    ]
    room = ThreeRoomDataset(dataset_path, nfft=1024)
    histories = training_band_parallel(configs, room_data=room)
    # both bands share one architecture -> one vmapped group
    assert len(histories) == 1
    history = histories[0]
    assert history.shape == (2, 2)
    assert np.isfinite(history).all()

    # per-band checkpoints written; reconstruction runs
    rirs = inferencing(configs, room_data=room, rec_indices=np.arange(4))
    assert rirs.shape == (4, 1024)
    assert np.isfinite(rirs).all()


def test_colorless_warm_start_through_solver(tmp_path):
    from diffgfdn_tpu.config.schema import (
        ColorlessFDNConfig,
        DiffGFDNConfig,
        OutputFilterConfig,
        TrainerConfig,
    )
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    room = synthetic_three_room_dataset(
        tmp_path, nfft=512, num_rec_per_room=6, rir_len_s=0.06,
        decay_times=(0.02, 0.035, 0.025),
    )
    cfg = DiffGFDNConfig(
        seed=11,
        num_groups=3,
        sample_rate=8000.0,
        num_delay_lines=6,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=6, num_freq_bins=512, max_epochs=1, lr=1e-3,
            train_dir=str(tmp_path / "train"), ir_dir=str(tmp_path / "audio"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": False},
        colorless_fdn_config=ColorlessFDNConfig(
            use_colorless_prototype=True, max_epochs=1, batch_size=64, lr=0.02
        ),
    )
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    # io gains are fixed from the prototype -> not trainable parameters
    assert "input_gains" not in params["params"]
    assert "output_gains" not in params["params"]
    # colorless results cached per group
    for g in range(3):
        assert (
            tmp_path / "train" / "colorless-fdn" /
            f"parameters_opt_group={g + 1}.pkl"
        ).exists()
    assert np.isfinite(trainer.train_loss).all()


def test_colorless_matrix_roundtrip(tmp_path):
    """Warm-started feedback matrices equal the colorless optima exactly."""

    from diffgfdn_tpu.ops.unitary import orthogonal_from_skew
    from diffgfdn_tpu.training.build import colorless_to_init, ColorlessFDNResults

    rng = np.random.RandomState(0)
    results = []
    for g in range(3):
        import jax.numpy as jnp

        q = np.asarray(
            orthogonal_from_skew(jnp.asarray(rng.randn(2, 2), jnp.float32))
        )
        results.append(
            ColorlessFDNResults(
                opt_input_gains=rng.randn(2),
                opt_output_gains=rng.randn(2),
                opt_feedback_matrix=q,
            )
        )
    b, c, m_skew = colorless_to_init(results)
    assert b.shape == (6, 1) and c.shape == (6, 1)
    import jax.numpy as jnp

    for g in range(3):
        q2 = np.asarray(orthogonal_from_skew(jnp.asarray(m_skew[g])))
        assert np.allclose(q2, results[g].opt_feedback_matrix, atol=1e-4)


def test_naf_tools(tmp_path):
    from diffgfdn_tpu.data.naf import (
        barycentric_interpolate,
        load_pickle_tolerant,
        NAFDatasetTrain,
    )
    import pickle

    rng = np.random.RandomState(0)
    pos = np.array([[0, 0, 1.5], [1, 0, 1.5], [0, 1, 1.5], [1, 1, 1.5]], float)
    rirs = rng.randn(4, 64)
    interp = barycentric_interpolate(pos, rirs, np.array([[0.5, 0.5, 1.5]]))
    assert interp.rirs.shape == (1, 64)
    assert np.allclose(interp.weights.sum(axis=-1), 1.0)

    ds = NAFDatasetTrain(receiver_position=pos, rirs=rirs, sample_rate=8000.0)
    p = tmp_path / "naf.pkl"
    with open(p, "wb") as f:
        pickle.dump(ds, f)
    loaded = load_pickle_tolerant(p)
    assert np.allclose(loaded.rirs, rirs)
