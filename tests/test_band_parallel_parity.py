"""Band-parallel parity with the reference's per-band jobs: heterogeneous
per-band MLP architectures, colorless loss, per-band validation + early
stopping, per-epoch checkpoints (reference run_subband_training_treble.py
:62-73,175-204; trainer.py:417-424)."""

import numpy as np
import pytest

from diffgfdn_tpu.data import generate_three_room_pickle


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("bp_data") / "srirs.pkl"
    generate_three_room_pickle(
        str(path), fs=8000.0, num_rec_per_room=8, rir_len_s=0.12,
        decay_times=(0.05, 0.08, 0.06),
    )
    return str(path)


def _layer_count(ckpt):
    """Number of Dense layers in the output-scalar MLP of a checkpoint."""
    mlp = ckpt["params"]["output_scalars"]["MLP_0"]
    return sum(1 for k in mlp if k.startswith("Dense_"))


def test_band_parallel_cli_honours_per_band_architectures(
    dataset, tmp_path, monkeypatch
):
    """--band-parallel groups bands by architecture: each band's checkpoint
    has ITS configured MLP size (round-1 gap: configs[0]'s size was used
    for all bands), and per-epoch checkpoints exist per band."""
    from diffgfdn_tpu.cli import run_subband_training as rst
    from diffgfdn_tpu.training.checkpoints import load_checkpoint

    monkeypatch.setattr(
        rst, "BAND_MLP_PARAMS",
        {500.0: (1, 16), 1000.0: (1, 16), 2000.0: (2, 16)},
    )
    configs = [
        rst.create_config(
            f, dataset, str(tmp_path / "bp"), num_freq_bins=512,
            sample_rate=8000.0, max_epochs=2, batch_size=8,
        )
        for f in (500.0, 1000.0, 2000.0)
    ]
    assert configs[0].trainer_config.use_colorless_loss  # parity default
    histories = rst.training_band_parallel(configs)
    assert len(histories) == 2  # two architecture groups

    # per-epoch checkpoints per band, with per-band layer counts
    # (num_hidden_layers=L -> L+2 Dense layers: input + hidden + output)
    for cfg, layers in zip(configs, (1, 1, 2)):
        for epoch in (0, 1):
            ckpt = load_checkpoint(cfg.trainer_config.train_dir, epoch)
            assert _layer_count(ckpt) == layers + 2


def test_band_parallel_early_stop_per_band(dataset, tmp_path):
    """Per-band early stopping fires: with an absurd tolerance every band
    stops after patience epochs, well before max_epochs."""
    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
        train_valid_split,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.training.build import build_gfdn_model

    cfgs = [
        create_config(
            f, dataset, str(tmp_path / "es"), num_freq_bins=1024,
            sample_rate=8000.0, max_epochs=8, batch_size=8,
            use_colorless_loss=False,
        )
        for f in (500.0, 1000.0)
    ]
    room = ThreeRoomDataset(dataset, nfft=1024)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfgs[0], common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    band_resps = np.stack([
        subband_filter_response(f, (63.0, 4000.0), 1, 8000.0, 1024)
        for f in (500.0, 1000.0)
    ])
    train_idx, valid_idx = train_valid_split(
        np.arange(arrays.num_items), 0.8, seed=0
    )
    trainer = BandParallelTrainer(
        model, cfgs[0].trainer_config, band_resps, steps_per_epoch=2,
        max_ir_len_ms=80.0,
    )
    trainer.patience = 1
    trainer.early_stop_tol = 1e9  # any delta counts as converged
    example = next(iter(iterate_batches(arrays, train_idx, 8, shuffle=False)))
    params, opt_state = trainer.init(example, seeds=[1, 2])

    trained_masks = []

    def on_epoch(epoch, ep_params, train_losses, valid_losses, trained):
        assert valid_losses is not None and valid_losses.shape == (2,)
        trained_masks.append(trained.copy())

    params, _, history = trainer.fit_indexed(
        params, opt_state, arrays, train_idx=train_idx, valid_idx=valid_idx,
        max_epochs=8, on_epoch=on_epoch,
    )
    # both bands stop after 2 epochs (patience=1 needs 2 valid points);
    # both TRAINED through both epochs, so both get checkpoints for them
    assert history.shape[0] == 2
    assert len(trainer.valid_loss) == 2
    assert all(m.all() for m in trained_masks), trained_masks


def test_band_parallel_colorless_loss_terms(dataset, tmp_path):
    """The colorless spectral/sparsity pair is part of the band loss."""
    import jax

    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.training.build import build_gfdn_model

    cfg = create_config(
        500.0, dataset, str(tmp_path / "cl"), num_freq_bins=1024,
        sample_rate=8000.0, max_epochs=1, batch_size=8,
    )
    assert cfg.trainer_config.use_colorless_loss
    room = ThreeRoomDataset(dataset, nfft=1024)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfg, common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    band_resps = np.stack([
        subband_filter_response(500.0, (63.0, 4000.0), 1, 8000.0, 1024)
    ])
    trainer = BandParallelTrainer(
        model, cfg.trainer_config, band_resps, steps_per_epoch=2,
        max_ir_len_ms=80.0,
    )
    example = next(
        iter(iterate_batches(arrays, np.arange(8), 8, shuffle=False))
    )
    params, opt_state = trainer.init(example, seeds=[cfg.seed])
    _, _, total, aux = trainer.step(
        params, opt_state, example, jax.random.PRNGKey(0)
    )
    assert "spectral_loss" in aux and "sparsity_loss" in aux
    assert np.isfinite(np.asarray(total)).all()


def test_sample_rate_mismatch_raises(dataset, tmp_path):
    """A config whose sample_rate disagrees with the dataset fails fast
    (a mismatch silently NaNs the losses otherwise)."""
    from diffgfdn_tpu.cli.run_subband_training import (
        create_config,
        training_band_parallel,
    )
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    cfg = create_config(
        500.0, dataset, str(tmp_path / "mm"), num_freq_bins=1024,
        sample_rate=32000.0, max_epochs=1,  # dataset is 8 kHz
    )
    with pytest.raises(ValueError, match="sample"):
        training_band_parallel([cfg])
    with pytest.raises(ValueError, match="sample"):
        run_training_var_receiver_pos(cfg)


def test_update_masking_freezes_stopped_bands(dataset, tmp_path):
    """The early-stop mechanism: a band with active=0 keeps its parameters
    EXACTLY while the other band updates (one compiled shape)."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.training.build import build_gfdn_model

    cfg = create_config(
        500.0, dataset, str(tmp_path / "fz"), num_freq_bins=512,
        sample_rate=8000.0, max_epochs=1, batch_size=8,
        use_colorless_loss=False,
    )
    room = ThreeRoomDataset(dataset, nfft=512)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfg, common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    resps = np.stack([
        subband_filter_response(f, (63.0, 4000.0), 1, 8000.0, 512)
        for f in (500.0, 1000.0)
    ])
    trainer = BandParallelTrainer(
        model, cfg.trainer_config, resps, steps_per_epoch=1,
        max_ir_len_ms=60.0,
    )
    example = next(iter(iterate_batches(arrays, np.arange(8), 8, shuffle=False)))
    params, opt_state = trainer.init(example, seeds=[1, 2])
    p0 = jax.tree_util.tree_map(np.asarray, params)

    active = jnp.asarray([1.0, 0.0])
    params, _, _, _ = trainer.step(
        params, opt_state, example, jax.random.PRNGKey(0), active=active
    )
    p1 = jax.tree_util.tree_map(np.asarray, params)

    leaves0 = jax.tree_util.tree_leaves(p0)
    leaves1 = jax.tree_util.tree_leaves(p1)
    changed_b0 = any(
        not np.allclose(a[0], b[0]) for a, b in zip(leaves0, leaves1)
    )
    frozen_b1 = all(
        np.array_equal(a[1], b[1]) for a, b in zip(leaves0, leaves1)
    )
    assert changed_b0 and frozen_b1


def test_precomputed_band_features_match_slow_path(dataset, tmp_path):
    """The per-band precomputed-target fast path produces the same loss as
    the recompute-every-step slow path."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.training.build import build_gfdn_model
    from diffgfdn_tpu.utils.cio import encode_batch

    cfg = create_config(
        500.0, dataset, str(tmp_path / "pf"), num_freq_bins=512,
        sample_rate=8000.0, max_epochs=1, batch_size=8,
        use_colorless_loss=False,
    )
    room = ThreeRoomDataset(dataset, nfft=512)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfg, common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    resps = np.stack([
        subband_filter_response(f, (63.0, 4000.0), 1, 8000.0, 512)
        for f in (500.0, 1000.0)
    ])
    trainer = BandParallelTrainer(
        model, cfg.trainer_config, resps, steps_per_epoch=1,
        max_ir_len_ms=60.0,
    )
    example = next(iter(iterate_batches(arrays, np.arange(8), 8, shuffle=False)))
    params, opt_state = trainer.init(example, seeds=[1, 2])
    trainer.precompute_band_target_features(arrays)
    assert trainer._band_feats is not None  # no multi-device gate anymore

    enc = encode_batch(example)
    key = jax.random.PRNGKey(0)
    idx = jnp.arange(8)
    feats = {k: v[:, :8] for k, v in trainer._band_feats.items()}
    slow = trainer._vstepped(params, enc, {}, trainer._band_resps_dev, key)[0]
    fast = trainer._vstepped(params, enc, feats, trainer._band_resps_dev, key)[0]
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), rtol=2e-3, atol=1e-4
    )


def test_precomputed_band_features_jitted_multidevice(dataset, tmp_path):
    """The JITTED fast path on the multi-device mesh — the configuration
    that used to trip XLA:CPU's fft-layout RET_CHECK — agrees with the
    slow path."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.training.build import build_gfdn_model

    cfg = create_config(
        500.0, dataset, str(tmp_path / "pf"), num_freq_bins=512,
        sample_rate=8000.0, max_epochs=1, batch_size=8,
        use_colorless_loss=False,
    )
    room = ThreeRoomDataset(dataset, nfft=512)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfg, common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    resps = np.stack([
        subband_filter_response(f, (63.0, 4000.0), 1, 8000.0, 512)
        for f in (500.0, 1000.0)
    ])
    trainer = BandParallelTrainer(
        model, cfg.trainer_config, resps, steps_per_epoch=1,
        max_ir_len_ms=60.0,
    )
    example = next(iter(iterate_batches(arrays, np.arange(8), 8, shuffle=False)))
    params, opt_state = trainer.init(example, seeds=[1, 2])
    trainer.precompute_band_target_features(arrays)
    assert trainer._band_feats is not None  # no multi-device gate anymore
    key = jax.random.PRNGKey(0)
    idx = jnp.arange(8)
    data = trainer.upload_arrays(arrays)
    step = jax.jit(trainer._make_indexed_step())
    active = jnp.ones(trainer.num_bands, jnp.float32)
    _, _, fast_jit, _ = step(
        params, opt_state, data, trainer._band_feats,
        trainer._band_resps_dev, jnp.asarray(idx, jnp.int32), key, active,
    )
    trainer._band_feats = None
    data_slow = trainer.upload_arrays(arrays)
    params2, opt2 = trainer.init(example, seeds=[1, 2])
    _, _, slow_jit, _ = step(
        params2, opt2, data_slow, {}, trainer._band_resps_dev,
        jnp.asarray(idx, jnp.int32), key, active,
    )
    np.testing.assert_allclose(
        np.asarray(fast_jit), np.asarray(slow_jit), rtol=2e-3, atol=1e-4
    )


def test_precomputed_features_fit_on_single_device_mesh(dataset, tmp_path):
    """The precomputed-target fast path trains end-to-end on a single-device
    mesh (multi-device CPU meshes are gated to the slow path)."""
    import jax

    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.parallel.mesh import make_mesh
    from diffgfdn_tpu.training.build import build_gfdn_model

    cfg = create_config(
        500.0, dataset, str(tmp_path / "sd"), num_freq_bins=512,
        sample_rate=8000.0, max_epochs=2, batch_size=8,
        use_colorless_loss=False,
    )
    room = ThreeRoomDataset(dataset, nfft=512)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfg, common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    resps = np.stack([
        subband_filter_response(500.0, (63.0, 4000.0), 1, 8000.0, 512)
    ])
    mesh = make_mesh(1, devices=jax.devices("cpu")[:1])
    trainer = BandParallelTrainer(
        model, cfg.trainer_config, resps, steps_per_epoch=2,
        max_ir_len_ms=60.0, mesh=mesh,
    )
    example = next(iter(iterate_batches(arrays, np.arange(8), 8, shuffle=False)))
    params, opt = trainer.init(example, seeds=[1])
    trainer.precompute_band_target_features(arrays)
    assert trainer._band_feats is not None  # single-device: fast path ON
    params, opt, hist = trainer.fit_indexed(
        params, opt, arrays, train_idx=np.arange(19),
        valid_idx=np.arange(19, 24), max_epochs=2,
    )
    assert hist.shape == (2, 1) and np.isfinite(hist).all()


def test_band_parallel_full_loss_stack_matches_sequential(dataset, tmp_path):
    """ERB-grouped EDR + frequency weighting + reg loss run under
    band-parallel and match the sequential per-band trainer's loss <=1e-5
    (round-3 gap: BandParallelTrainer rejected these flags, so the
    flagship parallel mode lost part of the loss stack the sequential
    path supports; reference loss stack trainer.py:56-110)."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.cli.run_subband_training import create_config
    from diffgfdn_tpu.data.batching import (
        arrays_from_room_dataset,
        iterate_batches,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel import BandParallelTrainer
    from diffgfdn_tpu.training.build import build_gfdn_model
    from diffgfdn_tpu.training.trainer import GFDNTrainer
    from diffgfdn_tpu.utils.cio import encode_batch

    freqs = (500.0, 1000.0)
    cfg = create_config(
        500.0, dataset, str(tmp_path / "fl"), num_freq_bins=1024,
        sample_rate=8000.0, max_epochs=1, batch_size=8,
        use_colorless_loss=False,
    )
    cfg.output_filter_config.use_svfs = True  # reg loss needs the SVF head
    tc = cfg.trainer_config
    tc.use_erb_edr_loss = True
    tc.use_frequency_weighting = True
    tc.use_reg_loss = True

    room = ThreeRoomDataset(dataset, nfft=1024)
    arrays = arrays_from_room_dataset(room)
    model = build_gfdn_model(
        cfg, common_decay_times=room.common_decay_times,
        band_centre_hz=room.band_centre_hz,
    )
    assert model.use_svf_in_output
    band_resps = np.stack([
        subband_filter_response(f, (63.0, 4000.0), 1, 8000.0, 1024)
        for f in freqs
    ])
    trainer = BandParallelTrainer(
        model, tc, band_resps, steps_per_epoch=2, max_ir_len_ms=80.0,
    )
    example = next(
        iter(iterate_batches(arrays, np.arange(8), 8, shuffle=False))
    )
    params, opt_state = trainer.init(example, seeds=[1, 2])
    key = jax.random.PRNGKey(0)
    _, _, total, aux = trainer.step(params, opt_state, example, key)
    assert set(aux) >= {"edc_loss", "edr_loss", "reg_loss"}
    total = np.asarray(total)

    # sequential per-band trainer on the SAME per-band params; the
    # band-parallel path feeds broadband targets and filters both sides in
    # the loss, the sequential path expects pre-filtered targets
    for b in range(len(freqs)):
        seq = GFDNTrainer(
            model, tc, steps_per_epoch=2,
            common_decay_times=np.array([0.08]),  # -> max_ir_len 80 ms
            subband_filter_resp=band_resps[b], sample_rate=8000.0,
        )
        vstep = jax.jit(seq._make_step(training=False))
        batch_b = dict(example)
        batch_b["target_rir_response"] = (
            example["target_rir_response"] * band_resps[b]
        )
        params_b = jax.tree_util.tree_map(lambda x, b=b: x[b], params)
        total_b, aux_b = vstep(params_b, encode_batch(batch_b), key)
        np.testing.assert_allclose(
            total[b], float(total_b), rtol=1e-5, atol=1e-5
        )
        for name in ("edc_loss", "edr_loss", "reg_loss"):
            np.testing.assert_allclose(
                np.asarray(aux[name])[b], float(aux_b[name]),
                rtol=1e-5, atol=1e-5,
            )


def test_broadband_edc_errors_device_matches_host(
    dataset, tmp_path, monkeypatch
):
    """The on-device all-band resynthesis + EDC-error program equals the
    host path (infer_all_octave_bands + merge_subband_rirs + numpy
    Schroeder) at toy scale — the frequency-domain circular band filtering
    differs from linear convolution only below the decayed tail."""
    import jax.numpy as jnp

    from diffgfdn_tpu.cli import run_subband_training as rst
    from diffgfdn_tpu.data.batching import arrays_from_room_dataset
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.inference.gfdn_inference import (
        broadband_edc_errors_device,
        infer_all_octave_bands,
    )
    from diffgfdn_tpu.ops.basic import db, ms_to_samps, schroeder_backward_int

    monkeypatch.setattr(
        rst, "BAND_MLP_PARAMS", {500.0: (1, 16), 1000.0: (1, 16)}
    )
    configs = [
        rst.create_config(
            f, dataset, str(tmp_path / "dev"), num_freq_bins=1024,
            sample_rate=8000.0, max_epochs=1, batch_size=8,
            use_colorless_loss=False,
        )
        for f in (500.0, 1000.0)
    ]
    rst.training_band_parallel(configs)
    room = ThreeRoomDataset(dataset, nfft=1024)
    idx = np.arange(6)
    fir_len = 128

    errs_dev = broadband_edc_errors_device(
        configs, room, idx, batch_size=4, fir_len=fir_len
    )
    assert errs_dev.shape == (6,)
    assert np.isfinite(errs_dev).all()

    rirs = infer_all_octave_bands(configs, room, idx, fir_len=fir_len)
    arrays = arrays_from_room_dataset(room)
    nfft, fs = 1024, 8000.0
    tgt_rirs = np.fft.irfft(
        np.asarray(arrays.target_rir_response)[idx], nfft, axis=-1
    )
    mix = ms_to_samps(20.0, fs)
    end = min(
        ms_to_samps(float(np.max(room.common_decay_times)) * 1e3, fs), nfft
    )

    def edc_db(x):
        return np.asarray(
            db(schroeder_backward_int(jnp.asarray(x[..., mix:end])),
               is_squared=True)
        )

    errs_host = np.mean(np.abs(edc_db(rirs) - edc_db(tgt_rirs)), axis=-1)
    np.testing.assert_allclose(errs_dev, errs_host, atol=0.2, rtol=0.02)
