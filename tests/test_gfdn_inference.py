"""E2E tests: checkpoint-driven GFDN inference, IR export, directional solver."""

import glob

import numpy as np
import pytest

from diffgfdn_tpu.config.schema import (
    ColorlessFDNConfig,
    DiffGFDNConfig,
    OutputFilterConfig,
    TrainerConfig,
)
from diffgfdn_tpu.data import synthetic_three_room_dataset
from diffgfdn_tpu.inference import InferDiffGFDN
from diffgfdn_tpu.training.solver import (
    run_training_anisotropic_decay_var_receiver_pos,
    run_training_var_receiver_pos,
)


@pytest.fixture(scope="module")
def room(tmp_path_factory):
    return synthetic_three_room_dataset(
        tmp_path_factory.mktemp("inf_data"),
        nfft=2048,
        num_rec_per_room=6,
        rir_len_s=0.25,
        decay_times=(0.08, 0.12, 0.1),
    )


def _config(tmp_path, **kw):
    trainer = dict(
        batch_size=4, num_freq_bins=2048, max_epochs=1, lr=1e-3,
        train_dir=str(tmp_path / "train"), ir_dir=str(tmp_path / "audio"),
    )
    trainer.update(kw)
    return DiffGFDNConfig(
        seed=7,
        num_groups=3,
        sample_rate=8000.0,
        num_delay_lines=6,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(**trainer),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": False},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )


def test_infer_from_checkpoint_and_export(tmp_path, room):
    cfg = _config(tmp_path)
    trainer, params = run_training_var_receiver_pos(
        cfg, room_data=room, export_irs=True
    )
    # wavs exported with position-encoded filenames
    wavs = glob.glob(str(tmp_path / "audio" / "*.wav"))
    assert len(wavs) > 0
    assert any("valid_ir" in w for w in wavs)

    infer = InferDiffGFDN(cfg, room, variant="var_receiver")
    rirs = infer.rirs_at(np.arange(5), batch_size=4)
    assert rirs.shape == (5, 2048)
    assert np.isfinite(rirs).all()
    heads = infer.head_outputs(np.arange(5))
    assert heads["gains"].shape == (5, 3)
    assert np.all(np.abs(heads["gains"]) <= 1.0)


def test_synthesized_rirs_decay(tmp_path, room):
    """Inference RIRs from a trained model decay over time (stability)."""
    cfg = _config(tmp_path, max_epochs=2)
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    infer = InferDiffGFDN(cfg, room, variant="var_receiver", params=params)
    rirs = infer.rirs_at(np.arange(4), batch_size=4)
    early_e = np.sum(rirs[:, 200:800] ** 2, axis=-1)
    late_e = np.sum(rirs[:, -600:] ** 2, axis=-1)
    assert np.all(late_e < early_e)


def test_directional_solver_runs(tmp_path):
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    path = generate_spatial_three_room_pickle(
        tmp_path / "sp.pkl", fs=4000.0, grid_spacing_m=1.2, rir_len_s=0.15,
        decay_times=(0.04, 0.06, 0.05),
    )
    room = SpatialThreeRoomDataset(path)
    cfg = DiffGFDNConfig(
        seed=3,
        num_groups=3,
        sample_rate=4000.0,
        ambi_order=1,  # -> 4 delay lines per group, 12 total
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=8, num_freq_bins=512, max_epochs=1, lr=1e-3,
            train_dir=str(tmp_path / "dir_train"),
            ir_dir=str(tmp_path / "dir_audio"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": False},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )
    trainer, params = run_training_anisotropic_decay_var_receiver_pos(cfg, room)
    assert len(trainer.train_loss) == 1
    assert np.isfinite(trainer.train_loss).all()
