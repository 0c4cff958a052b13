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
        nfft=1024,
        num_rec_per_room=6,
        rir_len_s=0.125,
        decay_times=(0.08, 0.12, 0.1),
    )


def _config(tmp_path, **kw):
    trainer = dict(
        batch_size=4, num_freq_bins=1024, max_epochs=1, lr=1e-3,
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
    assert rirs.shape == (5, 1024)
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


# ---------------------- time-domain synthesis from models ----------------------


def _td_batch(nbins, batch=3, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.rand(batch, 3).astype(np.float32) * 4.0
    return {
        "z_values": np.exp(1j * np.linspace(0, np.pi, nbins)).astype(np.complex64),
        "source_position": rng.rand(batch, 3).astype(np.float32),
        "listener_position": pos,
        "norm_listener_position": pos / 4.0,
        "target_early_response": np.zeros((batch, nbins), np.complex64),
    }


def _td_model(use_svf, sos=None, gains=None, fs=8000.0):
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos

    return DiffGFDNVarReceiverPos(
        sample_rate=fs,
        num_groups=2,
        delays=(163, 179, 191, 211),
        gains=gains,
        sos_coeffs=sos,
        use_zero_coupling=False,
        use_svf_in_output=use_svf,
        num_hidden_layers=1,
        num_neurons=16,
        num_fourier_features=4,
    )


def test_time_domain_synthesis_matches_freq_path_filtered_absorption():
    """Scalar-head model with GEQ absorption filters: the alias-free
    time-domain synthesis matches irfft(H) of the training path."""
    import jax

    from diffgfdn_tpu.inference.gfdn_inference import (
        make_rir_synthesis_fn,
        make_time_domain_synthesis_fn,
    )
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_filters_geq
    from diffgfdn_tpu.utils.cio import encode_batch, init_with_batch

    fs = 8000.0
    nfft = 4096
    sos = decay_times_to_gain_filters_geq(
        np.array([125.0, 250.0, 500.0, 1000.0, 2000.0]),
        np.array([0.09, 0.08, 0.07, 0.06, 0.05]),
        np.asarray((163, 179, 191, 211)),
        fs,
    )
    model = _td_model(use_svf=False, sos=sos, fs=fs)
    batch = _td_batch(nfft // 2 + 1)
    params = init_with_batch(model, jax.random.PRNGKey(0), batch)

    rir_fd = np.asarray(
        make_rir_synthesis_fn(model)(params, encode_batch(batch))
    )
    rir_td = np.asarray(
        make_time_domain_synthesis_fn(model, params, nfft)(batch)
    )
    assert rir_td.shape == rir_fd.shape
    peak = np.max(np.abs(rir_fd))
    assert np.max(np.abs(rir_td - rir_fd)) < 2e-3 * peak


def test_time_domain_synthesis_svf_head_matches_freq_path():
    """SVF-head (reference-default) model: loop runs alias-free in time
    domain, output filters applied via padded rFFT — matches irfft(H)."""
    import jax

    from diffgfdn_tpu.inference.gfdn_inference import (
        make_rir_synthesis_fn,
        make_time_domain_synthesis_fn,
    )
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.utils.cio import encode_batch, init_with_batch

    fs = 8000.0
    nfft = 4096
    gains = np.asarray(
        decay_times_to_gain_per_sample(
            0.07, np.asarray((163, 179, 191, 211)), fs
        )
    )
    model = _td_model(use_svf=True, gains=gains, fs=fs)
    batch = _td_batch(nfft // 2 + 1)
    params = init_with_batch(model, jax.random.PRNGKey(1), batch)

    rir_fd = np.asarray(
        make_rir_synthesis_fn(model)(params, encode_batch(batch))
    )
    rir_td = np.asarray(
        make_time_domain_synthesis_fn(model, params, nfft)(batch)
    )
    peak = np.max(np.abs(rir_fd))
    assert np.max(np.abs(rir_td - rir_fd)) < 5e-3 * peak


def test_time_domain_synthesis_filter_coupling_scalar_gains():
    """FILTER-mode (FIR-paraunitary) coupling through the model-level
    time-domain synthesis entry (polynomial feedback + trivial gain bank)."""
    import jax

    from diffgfdn_tpu.inference.gfdn_inference import (
        make_rir_synthesis_fn,
        make_time_domain_synthesis_fn,
    )
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.utils.cio import encode_batch, init_with_batch

    fs = 8000.0
    nfft = 4096
    gains = np.asarray(
        decay_times_to_gain_per_sample(
            0.06, np.asarray((163, 179, 191, 211)), fs
        )
    )
    from diffgfdn_tpu.config.schema import CouplingMatrixType

    model = DiffGFDNVarReceiverPos(
        sample_rate=fs,
        num_groups=2,
        delays=(163, 179, 191, 211),
        gains=gains,
        coupling_matrix_type=CouplingMatrixType.FILTER,
        coupling_matrix_order=6,
        use_svf_in_output=False,
        num_hidden_layers=1,
        num_neurons=16,
        num_fourier_features=4,
    )
    batch = _td_batch(nfft // 2 + 1, batch=2, seed=5)
    params = init_with_batch(model, jax.random.PRNGKey(2), batch)
    rir_fd = np.asarray(
        make_rir_synthesis_fn(model)(params, encode_batch(batch))
    )
    rir_td = np.asarray(
        make_time_domain_synthesis_fn(model, params, nfft)(batch)
    )
    peak = np.max(np.abs(rir_fd))
    assert np.max(np.abs(rir_td - rir_fd)) < 5e-3 * peak


def test_rirs_with_direct_cs_amplitudes(tmp_path, room):
    """The direct CS-amplitude inference mode (reference inference.py:
    590-605): externally provided amplitudes replace the MLP head and
    change the synthesized RIRs accordingly."""
    cfg = _config(tmp_path, max_epochs=1)
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    infer = InferDiffGFDN(cfg, room, variant="var_receiver", params=params)

    idx = np.arange(3)
    amps = np.full((3, 3), 0.5, np.float32)
    r1 = infer.rirs_with_amplitudes(idx, amps)
    assert r1.shape == (3, 1024) and np.isfinite(r1).all()
    # scaling all slope amplitudes scales the late field linearly
    r2 = infer.rirs_with_amplitudes(idx, 2.0 * amps)
    late1 = r1[:, 400:]
    late2 = r2[:, 400:]
    ratio = np.linalg.norm(late2, axis=-1) / (np.linalg.norm(late1, axis=-1) + 1e-12)
    assert np.allclose(ratio, 2.0, atol=0.2), ratio


def test_rirs_with_amplitudes_colorless_model_and_validation(tmp_path, room):
    """Tuple-returning (colorless-loss) models work through the direct-
    amplitude mode, and shape mismatches fail at the API boundary."""
    import pytest as _pytest

    cfg = _config(tmp_path, max_epochs=1, use_colorless_loss=True)
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    infer = InferDiffGFDN(cfg, room, variant="var_receiver", params=params)
    r = infer.rirs_with_amplitudes(np.arange(2), np.full((2, 3), 0.5, np.float32))
    assert r.shape == (2, 1024) and np.isfinite(r).all()
    with _pytest.raises(ValueError, match="shape"):
        infer.rirs_with_amplitudes(np.arange(3), np.full((2, 3), 0.5))


def test_save_true_irs_option(tmp_path, room):
    """TrainerConfig.save_true_irs dumps ground-truth wavs next to the
    synthesized ones."""
    import glob as _glob

    cfg = _config(tmp_path, max_epochs=1, save_true_irs=True)
    run_training_var_receiver_pos(cfg, room_data=room, export_irs=True)
    true_wavs = _glob.glob(str(tmp_path / "audio" / "true_ir_*.wav"))
    assert len(true_wavs) > 0


def test_time_domain_synthesis_directional_matches_freq_path():
    """Directional models synthesize alias-free in the time domain: the
    loop runs transposed (q = P^T b) and the SH weights mix the line
    outputs — matches irfft of the frequency-sampled SH response."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.inference.gfdn_inference import (
        make_time_domain_synthesis_fn,
    )
    from diffgfdn_tpu.models import DiffDirectionalFDNVarReceiverPos
    from diffgfdn_tpu.models.spatial import build_analysis_matrix
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.sph import t_design_directions
    from diffgfdn_tpu.utils.cio import decode_batch, encode_batch, init_with_batch

    fs = 8000.0
    nfft = 4096
    delays = tuple(int(d) for d in (61, 67, 71, 73, 79, 83, 89, 97))
    gains = np.asarray(
        decay_times_to_gain_per_sample(0.05, np.asarray(delays), fs)
    )
    model = DiffDirectionalFDNVarReceiverPos(
        sample_rate=fs, num_groups=2, delays=delays, gains=gains,
        ambi_order=1,  # 4 lines per group
        use_zero_coupling=False,
        analysis_matrix=build_analysis_matrix(1, t_design_directions(3), None),
        num_hidden_layers=1, num_neurons=8, num_fourier_features=2,
    )
    rng = np.random.RandomState(0)
    pos = rng.rand(2, 3).astype(np.float32)
    batch = {
        "z_values": np.exp(1j * np.linspace(0, np.pi, nfft // 2 + 1)).astype(
            np.complex64
        ),
        "source_position": rng.rand(2, 3).astype(np.float32),
        "listener_position": pos,
        "norm_listener_position": pos,
    }
    params = init_with_batch(model, jax.random.PRNGKey(0), batch)

    @jax.jit
    def freq_path(p, e):
        h = model.apply(p, decode_batch(e))  # (B, L, F) complex
        return jnp.fft.irfft(h, nfft, axis=-1)

    srir_fd = np.asarray(freq_path(params, encode_batch(batch)))
    srir_td = np.asarray(
        make_time_domain_synthesis_fn(model, params, nfft)(batch)
    )
    assert srir_td.shape == srir_fd.shape == (2, 4, nfft)
    peak = np.max(np.abs(srir_fd))
    assert np.max(np.abs(srir_td - srir_fd)) < 2e-3 * peak


def test_amplitude_injection_reproduces_head_outputs(tmp_path, room):
    """Feeding the MLP head's OWN per-group gains through the direct-
    amplitude mode reproduces rirs_at exactly (the injection point is the
    same multiplier the head drives)."""
    cfg = _config(tmp_path, max_epochs=1)
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)
    infer = InferDiffGFDN(cfg, room, variant="var_receiver", params=params)
    idx = np.arange(4)
    own_gains = infer.head_outputs(idx)["gains"]  # (4, G)
    r_head = infer.rirs_at(idx, batch_size=4)
    r_inj = infer.rirs_with_amplitudes(idx, own_gains, batch_size=4)
    np.testing.assert_allclose(r_inj, r_head, rtol=1e-4, atol=1e-6)


def test_inspect_checkpoint_cli(tmp_path, room):
    """The consolidated checkpoint-inspection CLI (the reference's
    investigate_grid_output_* / investigate_test_set_output /
    compare_treble_full_band_results notebook family): EDC/EDR error maps,
    single-position deep dive, coupling diagnostic, CS baseline."""
    from diffgfdn_tpu.cli.inspect_checkpoint import (
        compare_runs,
        diagonal_measure,
        inspect,
    )

    cfg = _config(tmp_path)
    run_training_var_receiver_pos(cfg, room_data=room)
    out = tmp_path / "figs"
    metrics = inspect(
        cfg, room_data=room, max_receivers=8, out_dir=str(out),
        cs_baseline=True,
    )
    assert np.isfinite(metrics["mean_edc_err_db"])
    assert np.isfinite(metrics["mean_edr_err_db"])
    assert 0.0 < metrics["coupling_diagonal_measure"] <= 1.0
    # the shaped-noise CS baseline with TRUE amplitudes is near-exact on
    # this synthetic dataset (its RIRs ARE shaped noise)
    assert metrics["cs_edc_err_db"] < 3.0
    for name in (
        "edc_error_map.png", "edr_error_map.png", "coupling_matrix.png",
        "loss_curves.png",
    ):
        assert (out / name).exists(), name
    assert list(out.glob("edc_overlay_*.png"))
    assert list(out.glob("echo_density_*.png"))

    # identity matrix is perfectly diagonal; dense ones matrix is not
    assert diagonal_measure(np.eye(4)) == 1.0
    assert abs(diagonal_measure(np.ones((4, 4))) - 0.25) < 1e-12

    finals = compare_runs(
        [cfg.trainer_config.train_dir], str(tmp_path / "cmp.png")
    )
    assert len(finals) == 1 and np.isfinite(list(finals.values())[0])
    assert (tmp_path / "cmp.png").exists()
