"""Smoke tests: plotting module, SVF-head + reg-loss training, profiling."""

import numpy as np

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

    from diffgfdn_tpu.utils.flops import gfdn_mems, mlp_mems

    assert mlp_mems(3, 128, 3) == 3 * (128 ** 2 + 128) + 3 * (128 + 1)
    assert gfdn_mems(32000.0, 12, 40.0, 3) == 1280 * 12 + 16 + 24 + 9


def test_compare_flops_example(tmp_path):
    """The compare_flops.ipynb-equivalent example runs and writes its figure."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "compare_flops_example",
        Path(__file__).resolve().parents[1] / "examples" / "compare_flops.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "cf.png"
    mod.main(["--out", str(out)])
    assert out.exists() and out.stat().st_size > 0


# ------------------------ plot-parity suite (round 2) ------------------------


def test_polynomial_matrix_plots(tmp_path):
    import jax
    import numpy as np

    from diffgfdn_tpu.config.schema import CouplingMatrixType
    from diffgfdn_tpu.models import FeedbackLoop
    from diffgfdn_tpu.ops.basic import get_frequency_samples
    from diffgfdn_tpu.utils.plot import (
        plot_polynomial_matrix_ir,
        plot_polynomial_matrix_magnitude,
        polynomial_matrix_response,
    )

    loop = FeedbackLoop(
        sample_rate=8000.0, num_groups=2, num_delay_lines_per_group=2,
        delays=(163, 179, 191, 211),
        coupling_matrix_type=CouplingMatrixType.FILTER,
        coupling_matrix_order=6,
        gains=np.full(4, 0.99, np.float32),
    )
    z = get_frequency_samples(64)
    params = loop.init(jax.random.PRNGKey(0), z)
    poly = np.asarray(
        loop.apply(params, method=FeedbackLoop.coupled_feedback_matrix)
    )
    resp, w = polynomial_matrix_response(poly, 128)
    assert resp.shape == (128, 4, 4) and np.isfinite(resp).all()
    # response at w=0 equals the sum over orders
    np.testing.assert_allclose(
        resp[0].real, poly.sum(axis=0), rtol=1e-5, atol=1e-6
    )
    plot_polynomial_matrix_ir(
        poly, 8000.0, save_path=str(tmp_path / "poly_ir.png")
    )
    plot_polynomial_matrix_magnitude(
        poly, 8000.0, 128, save_path=str(tmp_path / "poly_mag.png")
    )
    assert (tmp_path / "poly_ir.png").exists()
    assert (tmp_path / "poly_mag.png").exists()


def test_animate_coupled_feedback_matrix(tmp_path):
    import numpy as np

    from diffgfdn_tpu.utils.plot import animate_coupled_feedback_matrix

    rng = np.random.RandomState(0)
    mats = [rng.randn(6, 6) for _ in range(3)]
    coup = [rng.rand(2, 2) for _ in range(3)]
    out = tmp_path / "anim.gif"
    animate_coupled_feedback_matrix(mats, coup, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_subband_edc_and_amplitude_figures(tmp_path):
    import numpy as np

    from diffgfdn_tpu.utils.plot import (
        plot_subband_amplitudes,
        plot_subband_edc,
    )

    fs = 8000.0
    t = np.arange(int(0.3 * fs)) / fs
    rng = np.random.RandomState(0)
    true_rir = rng.randn(len(t)) * np.exp(-t * 20.0)
    approx = [true_rir * 0.8, true_rir * 0.95]
    bands = [500.0, 1000.0, 2000.0]
    plot_subband_edc(
        true_rir, approx, fs, bands, pos_to_investigate=(1.0, 2.0, 1.5),
        save_path=str(tmp_path / "sub_edc.png"),
    )
    assert (tmp_path / "sub_edc.png").exists()

    cdt = np.tile(np.array([[0.1, 0.15]]), (3, 1))  # (bands, groups)
    amps = np.full((3, 1, 2), 0.5)
    plot_subband_amplitudes(
        true_rir, approx[0], fs, 2, amps, cdt, bands,
        save_path=str(tmp_path / "sub_amps.png"),
    )
    assert (tmp_path / "sub_amps.png").exists()


def test_beamformer_map(tmp_path):
    import numpy as np

    from diffgfdn_tpu.ops.sph import t_design_directions
    from diffgfdn_tpu.utils.plot import plot_beamformer_map

    tdes = t_design_directions(5)  # (2, J): (azimuth, colatitude)
    # plot_beamformer_map takes the dataset convention (azimuth, ELEVATION)
    dirs = np.stack([tdes[0], np.pi / 2 - tdes[1]])
    rng = np.random.RandomState(0)
    amps = rng.rand(dirs.shape[1], 3)
    limits = plot_beamformer_map(
        amps, dirs, ambi_order=2, num_groups=3,
        save_path=str(tmp_path / "beam.png"),
    )
    assert (tmp_path / "beam.png").exists()
    assert limits.shape == (2, 3)
    # limits reusable across figures
    plot_beamformer_map(
        amps * 0.5, dirs, ambi_order=2, num_groups=3,
        save_path=str(tmp_path / "beam2.png"), db_limits=limits,
    )


def test_animate_moving_listener(tmp_path):
    import numpy as np

    from diffgfdn_tpu.utils.plot import animate_moving_listener

    path = np.stack([np.linspace(0.5, 3.5, 8), np.full(8, 2.0)], axis=-1)
    yaw = np.linspace(0, np.pi / 2, 8)
    out = tmp_path / "walk.mp4"
    animate_moving_listener(
        path,
        room_dims=[(4.0, 8.0, 3.0), (6.0, 3.0, 3.0)],
        room_start_coords=[(0.0, 0.0, 0.0), (4.0, 2.0, 0.0)],
        yaw_angles=yaw,
        source_position=np.array([1.0, 1.0, 1.5]),
        save_path=str(out),
    )
    assert out.exists() or out.with_suffix(".gif").exists()


def test_save_feedback_matrix_animation(tmp_path):
    """Checkpoint-driven coupled-matrix animation across epochs."""
    import jax
    import numpy as np

    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.training.checkpoints import save_checkpoint
    from diffgfdn_tpu.training.save_results import (
        save_feedback_matrix_animation,
    )
    from diffgfdn_tpu.utils.cio import init_with_batch

    delays = (163, 179, 191, 211)
    gains = np.asarray(
        decay_times_to_gain_per_sample(0.08, np.asarray(delays), 8000.0)
    )
    model = DiffGFDNVarReceiverPos(
        sample_rate=8000.0, num_groups=2, delays=delays, gains=gains,
        use_zero_coupling=False, use_svf_in_output=False,
        num_hidden_layers=1, num_neurons=8, num_fourier_features=2,
    )
    rng = np.random.RandomState(0)
    batch = {
        "z_values": np.exp(1j * np.linspace(0, np.pi, 17)).astype(np.complex64),
        "source_position": rng.rand(2, 3).astype(np.float32),
        "listener_position": rng.rand(2, 3).astype(np.float32),
        "norm_listener_position": rng.rand(2, 3).astype(np.float32),
        "target_early_response": np.zeros((2, 17), np.complex64),
    }
    params = init_with_batch(model, jax.random.PRNGKey(0), batch)
    for e in (-1, 0, 1):
        save_checkpoint(tmp_path, e, params)
    out = save_feedback_matrix_animation(model, tmp_path, 2)
    assert out is not None and (tmp_path / "feedback_matrix.gif").exists()


def test_plot_edr_and_learned_svf_response(tmp_path):
    from diffgfdn_tpu.ops.biquad import peak_filter_np

    rng = np.random.RandomState(1)
    rir = rng.randn(4000) * np.exp(-np.arange(4000) / 400)
    edr = dplot.plot_edr(
        rir, 8000.0, win_size=256, hop_size=128,
        save_path=str(tmp_path / "edr.png"),
    )
    assert (tmp_path / "edr.png").exists()
    # EDR must be monotone non-increasing along frames (cumulative backward)
    assert np.all(np.diff(edr, axis=-1) <= 1e-6)

    # two epochs x two groups x three peaking sections each
    def cascade(gain_db):
        secs = [
            np.concatenate(
                peak_filter_np(f0, 10.0 ** (gain_db / 20.0), 0.7, 8000.0)
            )
            for f0 in (200.0, 800.0, 2500.0)
        ]
        return np.stack(secs)

    per_epoch = [
        np.stack([cascade(3.0), cascade(-2.0)]),
        np.stack([cascade(1.0), cascade(-4.0)]),
    ]
    dplot.plot_learned_svf_response(
        per_epoch, 8000.0, pos_to_investigate=[1.0, 2.0, 1.5],
        epoch_numbers=[-1, 0], save_path=str(tmp_path / "svf.png"),
    )
    assert (tmp_path / "svf_output_filter_response.png").exists()
    assert (tmp_path / "svf_output_filter_pz_plot.png").exists()
