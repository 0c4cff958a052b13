"""TPU smoke suite: one real train run per model family ON THE TPU.

The pytest suite is hermetic (CPU, virtual mesh); this tool exercises every
training family end-to-end on the actual TPU backend and asserts losses are
finite. It exists because some failures only happen on TPU — e.g. the MXU's
bf16 default precision cancelled biquad denominators at DC and NaN'd SVF
training, something no CPU test could see.

Usage:  python tools/tpu_smoke.py  [family ...]
Families: var_receiver var_receiver_svf source_receiver single_pos
          directional colorless spatial spatial_cnn band_parallel
Shapes are tiny; the run is compile-dominated (~10-40 s per family).
"""

import sys
import tempfile
import time
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _base_config(tmp, **trainer_kwargs):
    from diffgfdn_tpu.config.schema import (
        ColorlessFDNConfig,
        DiffGFDNConfig,
        OutputFilterConfig,
        TrainerConfig,
    )

    trainer = dict(
        batch_size=4,
        num_freq_bins=2048,
        max_epochs=2,
        lr=1e-3,
        io_lr=1e-3,
        coupling_angle_lr=1e-3,
        train_dir=str(tmp / "train"),
        ir_dir=str(tmp / "audio"),
    )
    trainer.update(trainer_kwargs)
    return DiffGFDNConfig(
        seed=1234,
        num_groups=3,
        sample_rate=8000.0,
        num_delay_lines=6,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(**trainer),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": False,
                             "learn_common_decay_times": False},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )


def _room(tmp):
    from diffgfdn_tpu.data import synthetic_three_room_dataset

    return synthetic_three_room_dataset(
        tmp, nfft=2048, num_rec_per_room=8, rir_len_s=0.25,
        decay_times=(0.08, 0.12, 0.1),
    )


def smoke_var_receiver(tmp):
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    trainer, _ = run_training_var_receiver_pos(_base_config(tmp), room_data=_room(tmp))
    return trainer.train_loss


def smoke_var_receiver_svf(tmp):
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    cfg = _base_config(tmp)
    cfg.output_filter_config.use_svfs = True
    trainer, _ = run_training_var_receiver_pos(cfg, room_data=_room(tmp))
    return trainer.train_loss


def smoke_source_receiver(tmp):
    """Scalar-scalar source x receiver variant via the trainer directly."""
    import jax

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.data.batching import arrays_from_room_dataset
    from diffgfdn_tpu.models import DiffGFDNVarSourceReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.training.trainer import GFDNTrainer
    from diffgfdn_tpu.utils.cio import init_with_batch
    from diffgfdn_tpu.data.batching import gather_batch

    room = _room(tmp)
    fs = room.sample_rate
    delays = (163, 179, 191, 211, 223, 227)
    t60s = np.ravel(room.common_decay_times)
    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            float(t60s[k]), np.asarray(delays[2 * k : 2 * k + 2]), fs))
        for k in range(3)
    ])
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    model = DiffGFDNVarSourceReceiverPos(
        sample_rate=fs, num_groups=3, delays=delays, gains=gains,
        use_svf_in_output=False, use_svf_in_input=False,
        num_hidden_layers=1, num_neurons=16, num_fourier_features=4,
        input_num_hidden_layers=1, input_num_neurons=16,
        input_num_fourier_features=4,
        use_pallas_inverse=placement_is_tpu(),  # default placement run
    )
    cfg = TrainerConfig(
        batch_size=4, num_freq_bins=2048, max_epochs=2, lr=1e-3,
        train_dir=str(tmp / "srcrec"),
    )
    arrays = arrays_from_room_dataset(room)
    trainer = GFDNTrainer(
        model, cfg, steps_per_epoch=4,
        common_decay_times=room.common_decay_times, sample_rate=fs,
    )
    trainer.precompute_target_features(arrays)
    batch0 = gather_batch(arrays, np.arange(4))
    params = init_with_batch(model, jax.random.PRNGKey(0), batch0)
    trainer.fit_indexed(params, arrays, np.arange(16), np.arange(16, 24))
    return trainer.train_loss


def smoke_single_pos(tmp):
    from diffgfdn_tpu.data.room_dataset import RIRData
    from diffgfdn_tpu.training.solver import run_training_single_pos

    room = _room(tmp)
    cfg = _base_config(tmp)
    cfg.ir_path = "unused.wav"
    rir_data = RIRData(
        rir=room.rirs[0],
        sample_rate=room.sample_rate,
        common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
        nfft=2048,
    )
    trainer, _ = run_training_single_pos(cfg, rir_data=rir_data)
    return trainer.train_loss


def smoke_directional(tmp):
    from diffgfdn_tpu.config.schema import (
        ColorlessFDNConfig,
        DiffGFDNConfig,
        OutputFilterConfig,
        TrainerConfig,
    )
    from diffgfdn_tpu.data.spatial_dataset import (
        SpatialThreeRoomDataset,
        generate_spatial_three_room_pickle,
    )
    from diffgfdn_tpu.training.solver import (
        run_training_anisotropic_decay_var_receiver_pos,
    )

    path = generate_spatial_three_room_pickle(
        tmp / "sp.pkl", fs=4000.0, grid_spacing_m=1.2, rir_len_s=0.15,
        decay_times=(0.04, 0.06, 0.05),
    )
    room = SpatialThreeRoomDataset(path)
    cfg = DiffGFDNConfig(
        seed=3, num_groups=3, sample_rate=4000.0, ambi_order=1,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=8, num_freq_bins=512, max_epochs=1, lr=1e-3,
            train_dir=str(tmp / "dir_train"), ir_dir=str(tmp / "dir_audio"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=1, num_neurons_per_layer=16,
            num_fourier_features=4,
        ),
        decay_filter_config={"use_absorption_filters": False},
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )
    trainer, _ = run_training_anisotropic_decay_var_receiver_pos(cfg, room)
    return trainer.train_loss


def smoke_colorless(tmp):
    from diffgfdn_tpu.training import ColorlessFDNTrainer, build_colorless_fdn

    cfg = _base_config(tmp)
    cfg.colorless_fdn_config.max_epochs = 3
    cfg.colorless_fdn_config.batch_size = 128
    model = build_colorless_fdn(cfg, 0)
    trainer = ColorlessFDNTrainer(
        model, cfg.colorless_fdn_config, str(tmp / "colorless")
    )
    params = trainer.init_params(seed=0)  # TPU-safe: z built in-program
    trainer.fit(params, num_freq_samples=512, seed=0)
    return trainer.train_loss


def _spatial(tmp, cnn: bool):
    from diffgfdn_tpu.config.schema import (
        CNNConfig,
        DNNConfig,
        MLPConfig,
        SpatialSamplingConfig,
    )
    from diffgfdn_tpu.data.spatial_dataset import (
        SpatialThreeRoomDataset,
        generate_spatial_three_room_pickle,
    )
    from diffgfdn_tpu.training.spatial_trainer import (
        run_training_spatial_sampling,
    )

    path = generate_spatial_three_room_pickle(
        tmp / "sp.pkl", grid_spacing_m=0.6, rir_len_s=0.2,
        decay_times=(0.05, 0.09, 0.07),
    )
    room = SpatialThreeRoomDataset(path)
    if not cnn:  # omni path: per-position omni amplitudes, no directions
        room.amplitudes = room.amplitudes.mean(axis=1)
        room.sph_directions = None
    if cnn:  # CNN heads are directional (network type follows cnn_config)
        dnn = DNNConfig(
            cnn_config=CNNConfig(
                num_hidden_channels=8, num_layers=3, kernel_size=(3, 3)
            ),
            num_fourier_features=4,
        )
    else:
        dnn = DNNConfig(
            mlp_config=MLPConfig(num_neurons_per_layer=32, num_hidden_layers=1),
            num_fourier_features=4,
        )
    cfg = SpatialSamplingConfig(
        batch_size=16, seed=0, max_epochs=2, lr=5e-3,
        train_dir=str(tmp / "spatial"), use_directional_rirs=cnn,
        dnn_config=dnn,
    )
    results = run_training_spatial_sampling(
        cfg, room_data=room, grid_resolutions=[0.6 if cnn else 1.2]
    )
    trainer, _ = next(iter(results.values()))
    return trainer.train_loss


def smoke_spatial(tmp):
    return _spatial(tmp, cnn=False)


def smoke_spatial_cnn(tmp):
    return _spatial(tmp, cnn=True)


def smoke_band_parallel(tmp):
    """Band-parallel trainer on whatever mesh this host offers (1 chip OK)."""
    from diffgfdn_tpu.cli.run_subband_training import (
        create_config,
        training_band_parallel,
    )

    room = _room(tmp)
    configs = [
        create_config(
            freq=fc, dataset_path="unused",
            base_train_dir=str(tmp / "subband"),
            sample_rate=room.sample_rate,
            num_freq_bins=2048, max_epochs=1, batch_size=8,
            use_colorless_loss=False,
        )
        for fc in (500.0, 1000.0)
    ]
    histories = training_band_parallel(configs, room_data=room)
    return np.concatenate([h.ravel() for h in histories])


def smoke_inference(tmp):
    """Train briefly, then drive checkpoint inference + synthesis paths."""
    import jax.numpy as jnp

    from diffgfdn_tpu.inference import InferDiffGFDN
    from diffgfdn_tpu.inference.cs_synthesis import (
        get_rirs_from_common_slopes_model,
    )
    from diffgfdn_tpu.kernels.tdgfdn import synthesize_rirs_time_domain
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    room = _room(tmp)
    cfg = _base_config(tmp)
    trainer, params = run_training_var_receiver_pos(cfg, room_data=room)

    # frequency-domain synthesis from the checkpoint
    infer = InferDiffGFDN(cfg, room, variant="var_receiver", params=params)
    rirs = infer.rirs_at(np.arange(4), batch_size=4)
    assert rirs.shape == (4, 2048) and np.isfinite(rirs).all()

    # time-domain block-feedforward synthesis on the same model
    heads = infer.head_outputs(np.arange(4))
    fl = trainer.model  # static config
    delays = np.asarray(fl.delays)
    n = len(delays)
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(n, n))
    td = synthesize_rirs_time_domain(
        delays=delays,
        gains=np.asarray(fl.gains, np.float32),
        feedback_matrix=q.astype(np.float32),
        input_gains=np.ones(n, np.float32) / np.sqrt(n),
        output_gains=np.ones((4, n), np.float32) / np.sqrt(n),
        num_samples=2048,
    )
    td = np.asarray(td)
    assert td.shape == (4, 2048) and np.isfinite(td).all()

    # CS shaped-noise synthesis (omni amplitudes)
    amps = np.abs(rng.rand(4, room.num_rooms, 2)).astype(np.float32)
    cs = get_rirs_from_common_slopes_model(
        sample_rate=room.sample_rate,
        rec_pos_list=np.asarray(room.receiver_position[:4], np.float32),
        freq_bands=[500.0, 1000.0],
        ir_len_samps=2048,
        amplitudes=amps,
        common_decay_times=np.ravel(room.common_decay_times)[: room.num_rooms],
        seed=0,
    )
    cs = np.asarray(cs)
    assert np.isfinite(cs).all()
    # report peak magnitudes as the "losses" vector (finiteness is the test)
    return [float(np.abs(rirs).max()), float(np.abs(td).max()),
            float(np.abs(cs).max())]


FAMILIES = {
    "var_receiver": smoke_var_receiver,
    "var_receiver_svf": smoke_var_receiver_svf,
    "source_receiver": smoke_source_receiver,
    "single_pos": smoke_single_pos,
    "directional": smoke_directional,
    "colorless": smoke_colorless,
    "spatial": smoke_spatial,
    "spatial_cnn": smoke_spatial_cnn,
    "band_parallel": smoke_band_parallel,
    "inference": smoke_inference,
}


def main(argv=None):
    import os

    import jax

    if os.environ.get("SMOKE_CPU"):  # wiring check without the TPU tunnel
        jax.config.update("jax_platforms", "cpu")
    names = (argv or sys.argv[1:]) or list(FAMILIES)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    failed = []
    for name in names:
        fn = FAMILIES[name]
        t0 = time.time()
        try:
            with tempfile.TemporaryDirectory() as d:
                losses = np.asarray(fn(Path(d)), np.float64)
            ok = np.isfinite(losses).all() and losses.size > 0
            status = "OK " if ok else "NaN"
            if not ok:
                failed.append(name)
            print(
                f"{status} {name}: losses={np.round(losses, 4).tolist()} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name} ({time.time() - t0:.1f}s)", flush=True)
            traceback.print_exc()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all families OK on", jax.default_backend())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
