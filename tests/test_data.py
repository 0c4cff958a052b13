"""Tests for the data layer: parsers, synthetic generators, splits, batching."""

import numpy as np
import pytest

from diffgfdn_tpu.data import (
    arrays_from_room_dataset,
    fixed_test_split,
    iterate_batches,
    num_batches,
    synthetic_three_room_dataset,
    train_valid_split,
)
from diffgfdn_tpu.data.spatial_dataset import (
    arrays_from_spatial_dataset,
    create_2d_grid_data,
    generate_spatial_three_room_pickle,
    SpatialThreeRoomDataset,
    split_by_grid_resolution,
    square_patch_indices,
)
from diffgfdn_tpu.ops.basic import schroeder_backward_int


@pytest.fixture(scope="module")
def room(tmp_path_factory):
    return synthetic_three_room_dataset(
        tmp_path_factory.mktemp("data"), nfft=8192, num_rec_per_room=8
    )


@pytest.fixture(scope="module")
def spatial_room(tmp_path_factory):
    path = generate_spatial_three_room_pickle(
        tmp_path_factory.mktemp("spatial") / "srirs.pkl", grid_spacing_m=0.6
    )
    return SpatialThreeRoomDataset(path)


def test_three_room_parse(room):
    assert room.num_rooms == 3
    assert room.num_rec == 24
    assert room.rirs.shape[0] == 24
    assert room.rir_mag_response.shape == (24, 8192 // 2 + 1)
    assert room.amplitudes.shape == (24, 3)
    assert room.mesh_2d.points.shape[1] == 2


def test_norm_receiver_positions(room):
    norm = room.norm_receiver_position
    assert norm.min() >= 0.0 and norm.max() <= 1.0 + 1e-6


def test_early_late_split_energy(room):
    # the split preserves total energy up to the 5 ms crossfade window
    # (the late spectrum is time-shifted to start at 0, as in the reference,
    # so the spectra themselves don't sum — energies do)
    def energy(spec, n):
        return np.sum(np.abs(np.fft.irfft(spec, n, axis=-1)) ** 2)

    n = room.num_freq_bins
    e_early = energy(room.early_rir_mag_response, n)
    e_late = energy(room.late_rir_mag_response, n)
    e_full = energy(room.rir_mag_response, n)
    assert abs((e_early + e_late) - e_full) / e_full < 0.10


def test_synthetic_edc_matches_decay_times(room):
    """The synthetic RIR in room 2's centre decays at roughly its T60."""
    # pick the receiver closest to room 2's centre (longest T60 = 0.6s)
    from diffgfdn_tpu.data.synthetic import room_centers

    c = np.append(room_centers()[1], 1.5)
    idx = room.find_rec_idx(c)[0]
    rir = room.rirs[idx]
    fs = room.sample_rate
    import jax.numpy as jnp

    edc = np.asarray(schroeder_backward_int(jnp.asarray(rir), normalize=True))
    edc_db = 10 * np.log10(edc + 1e-12)
    i0, i1 = int(0.2 * fs), int(0.5 * fs)
    slope = (edc_db[i1] - edc_db[i0]) / ((i1 - i0) / fs)
    t60_est = -60.0 / slope
    assert 0.4 < t60_est < 0.8, t60_est


def test_splits_are_disjoint(room):
    arrays = arrays_from_room_dataset(room)
    test_idx, rest = fixed_test_split(arrays.num_items, 0.1, seed=1)
    train_idx, valid_idx = train_valid_split(rest, 0.8, seed=2)
    all_idx = np.concatenate([test_idx, train_idx, valid_idx])
    assert len(np.unique(all_idx)) == arrays.num_items
    # fixed test split is stable
    test_idx2, _ = fixed_test_split(arrays.num_items, 0.1, seed=1)
    assert np.array_equal(test_idx, test_idx2)


def test_batch_iteration_static_shapes(room):
    arrays = arrays_from_room_dataset(room)
    idx = np.arange(arrays.num_items)
    batches = list(iterate_batches(arrays, idx, batch_size=5, drop_last=True))
    assert len(batches) == num_batches(arrays.num_items, 5)
    for b in batches:
        assert b["listener_position"].shape == (5, 3)
        assert b["target_rir_response"].shape == (5, 8192 // 2 + 1)
        assert b["z_values"].dtype == np.complex64


def test_sampling_radius(room):
    arrays = arrays_from_room_dataset(room, new_sampling_radius=1.005)
    assert np.allclose(np.abs(arrays.z_values), 1.005, atol=1e-5)


# ------------------------------ spatial dataset ------------------------------


def test_spatial_parse(spatial_room):
    assert spatial_room.num_rec > 20
    assert spatial_room.rirs.shape[1] == 9  # 2nd order ambisonics
    assert spatial_room.amplitudes.shape[1:] == (12, 3)
    assert spatial_room.sph_directions.shape == (2, 12)


def test_grid_resolution_split(spatial_room):
    train_idx, valid_idx = split_by_grid_resolution(spatial_room, 1.2)
    assert len(train_idx) > 0 and len(valid_idx) > 0
    assert len(train_idx) + len(valid_idx) == spatial_room.num_rec
    # training points lie on a coarser grid -> fewer than half
    assert len(train_idx) < spatial_room.num_rec / 2


def test_spatial_arrays(spatial_room):
    arrays = arrays_from_spatial_dataset(spatial_room)
    assert arrays.target_common_slope_amps.shape == (spatial_room.num_rec, 12, 3)


def test_binary_mask(spatial_room):
    mesh = np.array([[1.0, 1.0], [20.0, 20.0], [5.0, 3.0]])
    mask = spatial_room.get_binary_mask(mesh)
    assert mask[0] and not mask[1] and mask[2]


def test_create_2d_grid_data(spatial_room):
    idx = np.arange(spatial_room.num_rec)
    mesh, norm_mesh, labels = create_2d_grid_data(spatial_room, idx)
    h, w = mesh.shape[:2]
    assert labels.shape == (h * w, 12, 3)
    # labels outside the floor plan are zeroed
    mask = spatial_room.get_binary_mask(mesh).ravel()
    assert np.allclose(labels[~mask], 0.0)


def test_square_patches(spatial_room):
    # the synthetic grid is 0.6 m (the parser's default metadata says 0.3 m)
    patches = square_patch_indices(
        spatial_room.receiver_position, patch_size=2,
        grid_spacing_m=0.6, step_size=2, drop_incomplete=True,
    )
    assert len(patches) > 0
    for p in patches:
        assert len(p) == 4
