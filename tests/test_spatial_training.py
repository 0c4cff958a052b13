"""End-to-end spatial-sampling (common slopes) training tests."""

import numpy as np
import pytest

from diffgfdn_tpu.config.schema import (
    DNNConfig,
    MLPConfig,
    SpatialSamplingConfig,
)
from diffgfdn_tpu.data.spatial_dataset import (
    generate_spatial_three_room_pickle,
    SpatialThreeRoomDataset,
)
from diffgfdn_tpu.training.spatial_trainer import (
    run_training_spatial_sampling,
)
from diffgfdn_tpu.training.checkpoints import load_latest_checkpoint


@pytest.fixture(scope="module")
def spatial_room(tmp_path_factory):
    path = generate_spatial_three_room_pickle(
        tmp_path_factory.mktemp("sp_train") / "srirs.pkl",
        grid_spacing_m=0.6,
        rir_len_s=0.2,
        decay_times=(0.05, 0.09, 0.07),
    )
    return SpatialThreeRoomDataset(path)


def _config(tmp_path, directional=True, epochs=4):
    return SpatialSamplingConfig(
        batch_size=16,
        seed=0,
        max_epochs=epochs,
        lr=5e-3,
        train_dir=str(tmp_path / "spatial"),
        use_directional_rirs=directional,
        dnn_config=DNNConfig(
            mlp_config=MLPConfig(num_neurons_per_layer=32, num_hidden_layers=1),
            num_fourier_features=4,
        ),
    )


def test_directional_mlp_training_improves(tmp_path, spatial_room):
    cfg = _config(tmp_path, directional=True)
    results = run_training_spatial_sampling(
        cfg, room_data=spatial_room, grid_resolutions=[1.2]
    )
    trainer, params = results[1.2]
    assert np.isfinite(trainer.train_loss).all()
    assert trainer.train_loss[-1] < trainer.train_loss[0]
    # per-resolution checkpoints
    ck = load_latest_checkpoint(
        str(tmp_path / "spatial" / "grid_resolution=1.2"), cfg.max_epochs
    )
    assert ck is not None
    # per-resolution SH-interpolated beamformer contour map emitted
    # (reference spatial_sampling/solver.py:160-263)
    assert (
        tmp_path / "spatial" / "beamformer_map_grid_resolution_m=1.200.png"
    ).exists()


def test_directional_prediction_matches_targets_better_after_training(
    tmp_path, spatial_room
):
    from diffgfdn_tpu.data.spatial_dataset import arrays_from_spatial_dataset
    from diffgfdn_tpu.data.batching import gather_batch

    cfg = _config(tmp_path, directional=True, epochs=10)
    results = run_training_spatial_sampling(
        cfg, room_data=spatial_room, grid_resolutions=[0.6]
    )
    trainer, params = results[0.6]
    arrays = arrays_from_spatial_dataset(spatial_room)
    batch = gather_batch(arrays, np.arange(16))
    amps = trainer.predict_amplitudes(params, batch)
    assert amps.shape == (16, 12, 3)
    assert np.all(amps >= 0) and np.all(amps <= 1)


def test_omni_mlp_training(tmp_path, spatial_room):
    # omni path uses the per-position omni amplitudes (sum over directions)
    import copy

    room = copy.deepcopy(spatial_room)
    room.amplitudes = spatial_room.amplitudes.mean(axis=1)  # (R, slopes)
    room.sph_directions = None
    cfg = _config(tmp_path, directional=False, epochs=3)
    results = run_training_spatial_sampling(
        cfg, room_data=room, grid_resolutions=[1.2], use_edc_loss=False
    )
    trainer, params = results[1.2]
    assert np.isfinite(trainer.train_loss).all()
    assert trainer.train_loss[-1] < trainer.train_loss[0]


def test_cnn_training_path(tmp_path, spatial_room):
    from diffgfdn_tpu.config.schema import CNNConfig, DNNConfig

    cfg = SpatialSamplingConfig(
        batch_size=16,
        seed=0,
        max_epochs=4,
        lr=5e-3,
        train_dir=str(tmp_path / "cnn"),
        use_directional_rirs=True,
        dnn_config=DNNConfig(
            cnn_config=CNNConfig(num_hidden_channels=8, num_layers=3,
                                 kernel_size=(3, 3)),
            num_fourier_features=4,
        ),
    )
    assert cfg.network_type.value == "cnn"
    from diffgfdn_tpu.training.spatial_trainer import (
        run_training_spatial_sampling,
    )

    results = run_training_spatial_sampling(
        cfg, room_data=spatial_room, grid_resolutions=[0.6]
    )
    trainer, params = results[0.6]
    assert np.isfinite(trainer.train_loss).all()
    assert trainer.train_loss[-1] < trainer.train_loss[0]

    # checkpoint inference on a CNN config: full-grid prediction +
    # nearest-cell sampling (an MLP-style batch used to KeyError on
    # 'mesh_2d')
    from diffgfdn_tpu.inference.spatial_inference import (
        get_output_from_trained_model,
    )

    amps = get_output_from_trained_model(
        cfg, spatial_room, spatial_room.receiver_position[:5], 0.6
    )
    assert amps.shape[0] == 5
    assert np.isfinite(amps).all()


def test_spatial_fit_indexed_scan_matches_per_step(tmp_path, spatial_room):
    """fit_indexed with scan_epochs True/False trains identically (the
    scanned epoch is a pure refactoring of the per-step loop)."""
    import jax

    from diffgfdn_tpu.data.spatial_dataset import arrays_from_spatial_dataset
    from diffgfdn_tpu.data.spatial_dataset import split_by_grid_resolution
    from diffgfdn_tpu.data.batching import iterate_batches
    from diffgfdn_tpu.training.spatial_trainer import (
        build_spatial_model,
        SpatialSamplingTrainer,
    )

    cfg = _config(tmp_path, directional=True, epochs=2)
    arrays = arrays_from_spatial_dataset(spatial_room)
    train_idx, valid_idx = split_by_grid_resolution(spatial_room, 1.2)
    model = build_spatial_model(
        cfg, spatial_room.num_rooms, spatial_room.ambi_order
    )
    example = next(
        iterate_batches(arrays, train_idx, cfg.batch_size, shuffle=False)
    )
    params0 = model.init(jax.random.PRNGKey(0), example)

    losses = {}
    for scan in (True, False):
        trainer = SpatialSamplingTrainer(
            model, cfg, spatial_room, use_edc_loss=True
        )
        trainer.scan_epochs = scan
        # fresh buffer copy: fit_indexed donates the incoming params
        p = jax.tree_util.tree_map(lambda x: x.copy(), params0)
        trainer.fit_indexed(p, arrays, train_idx, valid_idx, seed=3)
        losses[scan] = (list(trainer.train_loss), list(trainer.valid_loss))
    np.testing.assert_allclose(
        losses[True][0], losses[False][0], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        losses[True][1], losses[False][1], rtol=1e-6, atol=1e-7
    )


def test_spatial_indexed_valid_loss_batch_size_invariant(
    tmp_path, spatial_room
):
    """The valid metric is the exact per-item mean: independent of how the
    validation split is batched (full + remainder weighting, no wrap-around
    over-weighting). Uses the omni MSE loss, which is linear per item."""
    import copy

    import jax

    from diffgfdn_tpu.data.batching import iterate_batches
    from diffgfdn_tpu.data.spatial_dataset import arrays_from_spatial_dataset
    from diffgfdn_tpu.training.spatial_trainer import (
        build_spatial_model,
        SpatialSamplingTrainer,
    )

    room = copy.deepcopy(spatial_room)
    room.amplitudes = spatial_room.amplitudes.mean(axis=1)  # omni
    room.sph_directions = None
    arrays = arrays_from_spatial_dataset(room)
    n = arrays.num_items if hasattr(arrays, "num_items") else len(
        np.asarray(arrays.listener_position)
    )
    assert n >= 27, "fixture too small for this split"
    train_idx = np.arange(8)  # <= both batch sizes: identical training
    valid_idx = np.arange(8, 27)  # 19 items

    losses = {}
    for bs in (16, 19):
        cfg = _config(tmp_path / f"bs{bs}", directional=False, epochs=2)
        cfg.batch_size = bs
        model = build_spatial_model(cfg, room.num_rooms, room.ambi_order)
        example = next(
            iterate_batches(arrays, train_idx, min(bs, 8), shuffle=False)
        )
        params0 = model.init(jax.random.PRNGKey(0), example)
        trainer = SpatialSamplingTrainer(model, cfg, room, use_edc_loss=False)
        p = jax.tree_util.tree_map(lambda x: x.copy(), params0)
        trainer.fit_indexed(p, arrays, train_idx, valid_idx, seed=3)
        losses[bs] = list(trainer.valid_loss)
    # bs=16 splits valid into a full batch of 16 + remainder of 3;
    # bs=19 evaluates it as one unpadded batch — the weighted means agree
    np.testing.assert_allclose(losses[16], losses[19], rtol=1e-5)


def test_collapse_amplitudes_to_omni_guards_on_direction_axis():
    """The omni collapse averages the DIRECTION axis, never slopes/bands.

    Regression: the guard used to key on amplitudes.ndim == 3, which
    collapsed the slopes axis of an omni+banded dataset and skipped
    directional+banded (ndim 4) datasets entirely.
    """
    from diffgfdn_tpu.data.spatial_dataset import SpatialRoomDataset
    from diffgfdn_tpu.training.spatial_trainer import (
        collapse_amplitudes_to_omni,
    )

    rng = np.random.RandomState(0)
    pos = rng.rand(5, 3)
    rirs = rng.randn(5, 1, 16)
    common = dict(
        num_rooms=1,
        sample_rate=8000.0,
        source_position=np.array([[0.0, 0.0, 0.0]]),
        receiver_position=pos,
        rirs=rirs,
        common_decay_times=np.array([0.1, 0.2]),
        room_dims=[[3.0, 3.0, 3.0]],
        room_start_coord=[[0.0, 0.0, 0.0]],
    )

    # directional + banded: (R, J=4, S=2, G=3) -> (R, S, G)
    dir_banded = SpatialRoomDataset(
        amplitudes=rng.rand(5, 4, 2, 3),
        sph_directions=rng.rand(2, 4),
        **common,
    )
    out = collapse_amplitudes_to_omni(dir_banded)
    assert out.amplitudes.shape == (5, 2, 3)
    np.testing.assert_allclose(
        out.amplitudes, dir_banded.amplitudes.mean(axis=1)
    )
    assert out.sph_directions is None
    # input untouched (copy semantics)
    assert dir_banded.amplitudes.shape == (5, 4, 2, 3)

    # omni + banded: (R, S=2, G=3) with NO direction axis -> unchanged
    omni_banded = SpatialRoomDataset(
        amplitudes=rng.rand(5, 2, 3), sph_directions=None, **common
    )
    out = collapse_amplitudes_to_omni(omni_banded)
    assert out is omni_banded
    assert out.amplitudes.shape == (5, 2, 3)
