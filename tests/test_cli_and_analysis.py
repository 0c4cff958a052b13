"""Tests for CLIs, analysis tools, low-rank decomposition, hypertuning."""

import pickle

import numpy as np
import pytest

from diffgfdn_tpu.analysis import (
    calculate_amplitudes_least_squares,
    estimate_decay_params,
    get_amps_for_rir,
    octave_filtering,
)
from diffgfdn_tpu.low_rank import (
    get_source_receiver_filters,
    get_source_receiver_gains,
    rank1_decompose,
)
from diffgfdn_tpu.ops.basic import LOG10E6


FS = 8000.0
BANDS = [125.0, 250.0, 500.0, 1000.0, 2000.0]


def _cs_rir(t60s, amps, n, fs, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / fs
    env = sum(a * np.exp(-t * LOG10E6 / T) for a, T in zip(amps, t60s))
    return rng.randn(n) * np.sqrt(env)


def test_ls_amplitude_estimation_recovers_amplitudes():
    t60s = np.array([0.15, 0.35])
    true_amps = np.array([1.0, 0.3])
    rir = _cs_rir(t60s, true_amps, 4096, FS)
    filtered = octave_filtering(rir, FS, BANDS)
    amps = calculate_amplitudes_least_squares(t60s, FS, filtered, BANDS)
    assert amps.shape == (1, 2, len(BANDS))
    # total amplitude per band sums close to the band's share; ratios match
    ratio = amps[0, 0] / (amps[0, 1] + 1e-9)
    # the true ratio is ~3.3; octave filtering splits energy but the ratio
    # should be in the right ballpark for mid bands
    assert np.median(ratio) > 1.5


def test_get_amps_for_rir_shape():
    rir = _cs_rir([0.2], [1.0], 4096, FS)
    amps = get_amps_for_rir(rir, np.array([0.2]), BANDS, FS)
    assert amps.shape == (len(BANDS), 1, 1)
    assert np.all(amps >= 0)


def test_estimate_decay_params_single_slope():
    rir = _cs_rir([0.25], [1.0], 8192, FS)
    t60s, amps, noise = estimate_decay_params(
        rir, 1, FS, f_bands=[500.0, 1000.0],
        t60_grid=np.array([0.1, 0.18, 0.25, 0.35, 0.5]),
    )
    assert t60s.shape == (2, 1)
    # mid-band estimates hit the true decay time on the grid
    assert np.all(np.abs(t60s - 0.25) < 0.11)


def test_rank1_decompose():
    rng = np.random.RandomState(0)
    g_in = np.abs(rng.rand(4)) + 0.5
    g_out = np.abs(rng.rand(6)) + 0.5
    a = np.outer(g_in, g_out)
    gi, go, explained = rank1_decompose(a)
    assert explained > 0.999
    assert np.allclose(np.outer(gi, go), a, rtol=1e-5)


def test_source_receiver_gains():
    rng = np.random.RandomState(1)
    amps = np.abs(rng.rand(3, 5, 2)) + 0.1
    gi, go, ex = get_source_receiver_gains(amps)
    assert gi.shape == (3, 2) and go.shape == (5, 2)
    recon = np.einsum("sk,rk->srk", gi, go)
    # rank-1 approx error bounded
    assert np.linalg.norm(recon - amps) / np.linalg.norm(amps) < 0.5


def test_source_receiver_filters_shapes():
    rng = np.random.RandomState(2)
    amps = np.abs(rng.rand(1, 2, 2, len(BANDS))) + 0.1
    f_in, f_out = get_source_receiver_filters(amps, np.array(BANDS), FS)
    assert f_in.shape == (1, 2, len(BANDS) + 3, 3, 2)
    assert f_out.shape == (2, 2, len(BANDS) + 3, 3, 2)


def test_hypertuning_random_search():
    from diffgfdn_tpu.config.schema import DiffGFDNConfig, MLPTuningConfig, OutputFilterConfig
    from diffgfdn_tpu.training.hypertuning import mlp_hyperparameter_tuning

    cfg = DiffGFDNConfig(
        output_filter_config=OutputFilterConfig(
            mlp_tuning_config=MLPTuningConfig(
                min_layers=1, max_layers=4, min_neurons=16, max_neurons=64,
                step_size=16, num_trials=6,
            )
        )
    )

    def fake_train(c):
        # pretend 2 layers x 32 neurons is optimal
        return abs(c.output_filter_config.num_hidden_layers - 2) + abs(
            c.output_filter_config.num_neurons_per_layer - 32
        ) / 16.0

    best, results = mlp_hyperparameter_tuning(cfg, fake_train, seed=0)
    assert len(results) >= 3
    best_obj = min(r.objective for r in results)
    assert fake_train(best) == best_obj


def test_convert_mat_roundtrip(tmp_path):
    import h5py

    from diffgfdn_tpu.cli.convert_dataset import convert_mat_to_pkl

    rng = np.random.RandomState(0)
    n_rec, t_len = 4, 4096
    rirs = np.stack([_cs_rir([0.2, 0.4], [1.0, 0.2], t_len, FS, seed=s)
                     for s in range(n_rec)])
    mat_path = tmp_path / "srirs.mat"
    with h5py.File(mat_path, "w") as f:
        f.create_dataset("fs", data=np.array([FS]))
        f.create_dataset("srirs", data=rirs)
        f.create_dataset("srcPos", data=np.zeros((3, 1)))
        f.create_dataset("rcvPos", data=rng.rand(3, n_rec))
        f.create_dataset("common_decay_times", data=np.array([0.2, 0.4]))
    out = convert_mat_to_pkl(
        mat_path, tmp_path / "srirs.pkl", band_centre_hz=BANDS,
        per_band_dir=tmp_path / "bands",
    )
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data["srirs"].shape == (n_rec, t_len)
    assert data["amplitudes"].shape == (2, n_rec)
    assert (tmp_path / "bands" / "srirs_band=500Hz.pkl").exists()


def test_convert_mat_ambi(tmp_path):
    import h5py

    from diffgfdn_tpu.cli.convert_dataset import convert_mat_to_pkl_ambi

    rng = np.random.RandomState(0)
    n_rec, t_len = 3, 2048
    srirs = rng.randn(n_rec, 9, t_len) * 0.1
    mat_path = tmp_path / "ambi.mat"
    with h5py.File(mat_path, "w") as f:
        f.create_dataset("fs", data=np.array([FS]))
        f.create_dataset("srirs", data=srirs)
        f.create_dataset("srcPos", data=np.zeros((3, 1)))
        f.create_dataset("rcvPos", data=rng.rand(3, n_rec))
        f.create_dataset("common_decay_times", data=np.array([[0.2, 0.4]]))
    out = convert_mat_to_pkl_ambi(
        mat_path, tmp_path / "ambi.pkl", ambi_order=2, band_centre_hz=BANDS
    )
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data["directions"].shape == (2, 12)
    # parses back through the spatial dataset class
    from diffgfdn_tpu.data.spatial_dataset import SpatialThreeRoomDataset

    room = SpatialThreeRoomDataset(out)
    assert room.amplitudes.shape == (n_rec, 12, 2)
