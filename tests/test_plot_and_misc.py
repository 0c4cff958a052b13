"""Smoke tests: plotting module, SVF-head + reg-loss training, profiling."""

import numpy as np
import pytest

from diffgfdn_tpu.data import THREE_ROOM_APERTURES, THREE_ROOM_DIMS, THREE_ROOM_START
from diffgfdn_tpu.utils import plot as dplot
from diffgfdn_tpu.utils.profiling import (
    emit_metric,
    get_str_results,
    StepTimer,
    x_realtime,
)


def test_plot_smoke(tmp_path):
    rng = np.random.RandomState(0)
    dplot.plot_loss_curves(
        [3.0, 2.0, 1.5], [3.2, 2.4, 1.9],
        individual=[{"edc": 2.0, "edr": 1.0}] * 3,
        save_path=str(tmp_path / "loss.png"),
    )
    rirs = rng.randn(2, 2000) * np.exp(-np.arange(2000) / 300)[None]
    dplot.plot_edc_comparison(
        rirs, ["true", "approx"], 8000.0, save_path=str(tmp_path / "edc.png")
    )
    dplot.plot_magnitude_response(
        np.abs(rng.randn(2, 257)) + 0.1,
        np.linspace(20, 4000, 257),
        ["a", "b"],
        save_path=str(tmp_path / "mag.png"),
    )
    dplot.plot_spectrogram(rirs[0], 8000.0, save_path=str(tmp_path / "spec.png"))
    pos = rng.rand(30, 2) * np.array([10, 8])
    dplot.plot_position_map(
        pos, rng.rand(30), THREE_ROOM_DIMS, THREE_ROOM_START,
        THREE_ROOM_APERTURES, title="amps", save_path=str(tmp_path / "map.png"),
    )
    dplot.plot_matrix(rng.randn(6, 6), save_path=str(tmp_path / "mat.png"))
    for name in ("loss", "edc", "mag", "spec", "map", "mat"):
        assert (tmp_path / f"{name}.png").exists()


def test_plot_t60_filter_response(tmp_path):
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_filters_geq

    bands = np.array([125.0, 250, 500, 1000, 2000])
    coeffs = decay_times_to_gain_filters_geq(
        bands, np.linspace(0.8, 0.3, 5), [499, 601], 8000.0
    )
    target = (10 ** (-3 / 8000.0 / np.linspace(0.8, 0.3, 5))) ** 499
    dplot.plot_t60_filter_response(
        bands, target[None], coeffs[..., 0].transpose(1, 0, 2),
        coeffs[..., 1].transpose(1, 0, 2), 8000.0,
        save_path=str(tmp_path / "t60.png"),
    )
    assert (tmp_path / "t60.png").exists()


def test_order_position_matrices():
    pos = np.array([[1.0, 2.0], [0.0, 1.0], [2.0, 1.0]])
    vals = np.array([10, 20, 30])
    p, v = dplot.order_position_matrices(pos, vals)
    assert list(v) == [20, 30, 10]


def test_profiling_utils():
    timer = StepTimer(warmup=1)
    for _ in range(3):
        with timer:
            sum(range(1000))
    assert timer.steps_per_sec > 0
    assert x_realtime(2.0, 0.001) == 2000.0
    s = get_str_results(epoch=3, train_loss=[1.0, 0.5], time_s=2.0,
                        individual_losses=[{"edc": 0.4}])
    assert "epoch:   3" in s and "edc" in s
    line = emit_metric("m", 1.0, "u", 2.0)
    assert '"vs_baseline": 2.0' in line


def test_single_pos_svf_head_with_reg_loss(tmp_path):
    """Exercise the SVF-head + aliasing-regularizer training path."""
    from diffgfdn_tpu.config.schema import (
        ColorlessFDNConfig, DiffGFDNConfig, OutputFilterConfig, TrainerConfig,
    )
    from diffgfdn_tpu.data import synthetic_three_room_dataset
    from diffgfdn_tpu.data.room_dataset import RIRData
    from diffgfdn_tpu.training.solver import run_training_single_pos

    room = synthetic_three_room_dataset(
        tmp_path, nfft=2048, num_rec_per_room=2, rir_len_s=0.2,
        decay_times=(0.06, 0.1, 0.08),
    )
    cfg = DiffGFDNConfig(
        seed=5, num_groups=3, sample_rate=8000.0, num_delay_lines=6,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=1, num_freq_bins=2048, max_epochs=2, lr=1e-3,
            use_reg_loss=True, output_filt_ir_len_ms=100.0,
            train_dir=str(tmp_path / "sp_train"), ir_dir=str(tmp_path / "sp_audio"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=True, compress_pole_factor=0.999,
        ),
        decay_filter_config={"use_absorption_filters": False},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )
    rir_data = RIRData(
        rir=room.rirs[0], sample_rate=8000.0,
        common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz, nfft=2048,
    )
    trainer, params = run_training_single_pos(cfg, rir_data=rir_data)
    assert np.isfinite(trainer.train_loss).all()
    assert "output_svf_params" in params["params"]


def test_flops_cost_models():
    """Cost models match the reference notebook's closed forms (BASELINE.md)."""
    from diffgfdn_tpu.utils.flops import (
        conv_flops,
        dir_gfdn_flops,
        gfdn_flops,
        mlp_flops,
    )

    assert gfdn_flops(12, 8) == 2 * 144 + 12 + 27 * 12 * 8 + 1
    assert gfdn_flops(12, 8, is_parallel=True) == 8 * (2 * 144 + 48 + 1)
    assert mlp_flops(3, 128, 60) == 3 * (2 * 128 * 128 + 128) + 60 * (257)
    # the directional GFDN's cost is flat in RIR length while partitioned
    # convolution grows with it (the reference's headline deployment
    # comparison) — for long reverbs the GFDN wins
    assert dir_gfdn_flops(2, 3, 8, 12) < conv_flops(9, 4000.0, 512)
    assert conv_flops(9, 4000.0, 512) > conv_flops(9, 1000.0, 512)
