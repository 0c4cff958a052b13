"""Tests for CLIs, analysis tools, low-rank decomposition, hypertuning."""

import pickle

import numpy as np

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
    # (the exact envelope-convention contract is pinned broadband by
    # test_amplitude_roundtrip_shaped_wgn_preserves_edc below; octave
    # filtering makes per-band ratios too noisy for a tight check)


def test_amplitude_roundtrip_shaped_wgn_preserves_edc():
    """shaped_wgn(calculate_amplitudes_least_squares(rir)) matches the
    rir's broadband EDC — the convention-coherence invariant tying
    analysis.py to ops/basic.shaped_wgn."""
    import jax

    from diffgfdn_tpu.ops.basic import (
        schroeder_backward_int,
        shaped_wgn,
    )

    t60s = np.array([0.15, 0.35])
    true_amps = np.array([1.0, 0.25])
    n = 8192
    rir = _cs_rir(t60s, true_amps, n, FS, seed=3)
    # broadband fit: single "band" = the unfiltered rir
    est = calculate_amplitudes_least_squares(
        t60s, FS, rir[:, None], [1000.0], include_noise_term=False
    )[0, :, 0]
    np.testing.assert_allclose(est, true_amps, rtol=0.15)
    synth = np.asarray(
        shaped_wgn(est[None, :], t60s, n, FS, jax.random.PRNGKey(1))
    )[0]
    edc_true = 10 * np.log10(
        np.asarray(schroeder_backward_int(rir, normalize=True)) + 1e-12
    )
    edc_synth = 10 * np.log10(
        np.asarray(schroeder_backward_int(synth, normalize=True)) + 1e-12
    )
    keep = slice(0, int(0.3 * FS))  # above the -60 dB knee
    assert np.max(np.abs(edc_true[keep] - edc_synth[keep])) < 2.0


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

    best, results = mlp_hyperparameter_tuning(
        cfg, fake_train, seed=0, sampler="random"
    )
    assert len(results) >= 3
    best_obj = min(r.objective for r in results)
    assert fake_train(best) == best_obj


def test_hypertuning_tpe_concentrates_on_good_region():
    """The TPE sampler (the reference's optuna default) finds the optimum
    and spends the post-startup budget near it."""
    from diffgfdn_tpu.config.schema import (
        DiffGFDNConfig,
        MLPTuningConfig,
        OutputFilterConfig,
    )
    from diffgfdn_tpu.training.hypertuning import mlp_hyperparameter_tuning

    cfg = DiffGFDNConfig(
        output_filter_config=OutputFilterConfig(
            mlp_tuning_config=MLPTuningConfig(
                min_layers=1, max_layers=8, min_neurons=16, max_neurons=128,
                step_size=16, num_trials=20, sampler="tpe",
            )
        )
    )

    evals = []

    def objective(c):
        v = abs(c.output_filter_config.num_hidden_layers - 3) + abs(
            c.output_filter_config.num_neurons_per_layer - 64
        ) / 16.0
        evals.append(v)
        return v

    best, results = mlp_hyperparameter_tuning(cfg, objective, seed=1)
    assert best.output_filter_config.num_hidden_layers == 3
    assert best.output_filter_config.num_neurons_per_layer == 64
    # post-startup trials concentrate: the later half must average better
    # than the first (random-startup) half
    half = len(evals) // 2
    assert np.mean(evals[half:]) <= np.mean(evals[:half])


def test_hypertuning_optuna_falls_back_without_library():
    from diffgfdn_tpu.config.schema import (
        DiffGFDNConfig,
        MLPTuningConfig,
        OutputFilterConfig,
    )
    from diffgfdn_tpu.training.hypertuning import mlp_hyperparameter_tuning

    cfg = DiffGFDNConfig(
        output_filter_config=OutputFilterConfig(
            mlp_tuning_config=MLPTuningConfig(
                min_layers=1, max_layers=2, min_neurons=16, max_neurons=32,
                step_size=16, num_trials=4, sampler="optuna",
            )
        )
    )
    best, results = mlp_hyperparameter_tuning(
        cfg, lambda c: float(c.output_filter_config.num_hidden_layers), seed=0
    )
    assert results and best.output_filter_config.num_hidden_layers == 1


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


# ---------------------- multi-slope decay estimation ----------------------


def _multi_slope_rir(t60s, amps, fs=8000.0, dur=1.0, seed=0):
    """White noise shaped so the energy envelope is sum_k a_k e^(-t L/T_k)."""
    t = np.arange(int(dur * fs)) / fs
    env = sum(
        a * np.exp(-t * np.log(1e6) / T) for a, T in zip(amps, t60s)
    )
    rng = np.random.RandomState(seed)
    return (rng.randn(len(t)) * np.sqrt(env)).astype(np.float64)


def test_fit_edc_fixed_order_exact_on_noiseless_kernel():
    """On an exact two-exponential EDC the NLS recovers the decay times to
    <0.1% — the estimator itself is unbiased; RIR-level accuracy is limited
    only by the noise statistics of the input."""
    from diffgfdn_tpu.analysis import _fit_edc_fixed_order

    fs = 8000.0
    t = np.arange(int(1.0 * fs)) / fs
    L = np.log(1e6)
    edc = 1.0 * np.exp(-t * L / 0.1) + 1e-2 * np.exp(-t * L / 0.5)
    t60s, amps, _, err = _fit_edc_fixed_order(
        edc, t, 2, np.geomspace(0.05, 3.0, 14)
    )
    assert abs(t60s[0] - 0.1) < 1e-3 and abs(t60s[1] - 0.5) < 1e-3
    assert err < 1e-3


def test_estimate_decay_params_two_slopes():
    from diffgfdn_tpu.analysis import estimate_decay_params

    fs = 8000.0
    rir = _multi_slope_rir((0.1, 0.5), (1.0, 1e-2), fs=fs)
    t60s, amps, noise = estimate_decay_params(
        rir, 2, fs, f_bands=[500.0, 1000.0, 2000.0]
    )
    assert t60s.shape == (3, 2) and amps.shape == (3, 2)
    # every band sees the same envelope. The fast slope has few independent
    # samples per band (coherence time x 0.1 s) so its variance is the
    # statistical floor, not estimator bias (see the noiseless test above).
    for b in range(3):
        assert abs(t60s[b, 0] - 0.1) / 0.1 < 0.35, t60s[b]
        assert abs(t60s[b, 1] - 0.5) / 0.5 < 0.1, t60s[b]
        assert amps[b, 0] > amps[b, 1] > 0.0


def test_estimate_decay_params_three_slopes():
    from diffgfdn_tpu.analysis import estimate_decay_params

    fs = 8000.0
    rir = _multi_slope_rir((0.06, 0.25, 1.0), (1.0, 3e-2, 3e-5), fs=fs,
                           dur=1.5, seed=1)
    t60s, _, _ = estimate_decay_params(rir, 3, fs, f_bands=[1000.0])
    rel = np.abs(t60s[0] - np.array([0.06, 0.25, 1.0])) / np.array(
        [0.06, 0.25, 1.0]
    )
    assert np.all(rel < 0.3), t60s


def test_estimate_decay_params_order_selection():
    """n_slopes=0 auto-selects the model order per band (DecayFitNet
    contract, reference analysis.py:53-54)."""
    from diffgfdn_tpu.analysis import estimate_decay_params

    fs = 8000.0
    two = _multi_slope_rir((0.1, 0.5), (1.0, 1e-2), fs=fs, seed=2)
    t60s, amps, _ = estimate_decay_params(two, 0, fs, f_bands=[1000.0])
    active = np.count_nonzero(amps[0] > 0)
    assert active == 2, (t60s, amps)

    one = _multi_slope_rir((0.2,), (1.0,), fs=fs, seed=3)
    t60s1, amps1, _ = estimate_decay_params(one, 0, fs, f_bands=[1000.0])
    assert np.count_nonzero(amps1[0] > 0) == 1, (t60s1, amps1)
    assert abs(t60s1[0, 0] - 0.2) / 0.2 < 0.2


def test_estimate_edc_parameters_contract():
    """Reference-contract wrapper: normalized params + norm vals + fitted
    EDC that tracks the true EDC within ~1 dB over the decay range."""
    from diffgfdn_tpu.analysis import (
        estimate_edc_parameters,
        octave_filtering,
        schroeder_edc,
    )

    fs = 8000.0
    rir = _multi_slope_rir((0.1, 0.4), (1.0, 3e-2), fs=fs, seed=4)
    (t60s, amps_n, noise_n), norm_vals, fitted = estimate_edc_parameters(
        rir, [500.0, 1000.0], n_slopes=2, fs=fs
    )
    assert t60s.shape == (2, 2) and norm_vals.shape == (2,)
    assert fitted.shape[0] == 2
    filt = octave_filtering(rir, fs, [500.0, 1000.0])
    # norm_vals = per-band EDC peak = total band energy (time axis!)
    np.testing.assert_allclose(
        norm_vals, np.sum(filt ** 2, axis=0), rtol=1e-6
    )
    for b in range(2):
        true_edc = schroeder_edc(filt[:, b])
        n = int(len(true_edc) * 0.9)
        err = np.abs(
            10 * np.log10(fitted[b, :n] + 1e-20)
            - 10 * np.log10(true_edc[:n] + 1e-20)
        )
        assert np.median(err) < 1.0, np.median(err)


def test_estimate_decay_params_recovers_noise_floor():
    """The Schroeder noise column stays linear-in-time on the log-sampled
    fit grid: a known additive noise floor is recovered within 3 dB."""
    from diffgfdn_tpu.analysis import estimate_decay_params, octave_filtering

    fs = 8000.0
    noise_std = 3e-3
    rng = np.random.RandomState(7)
    rir = _multi_slope_rir((0.12,), (1.0,), fs=fs, dur=1.5, seed=7)
    rir = rir + noise_std * rng.randn(len(rir))
    t60s, amps, noise = estimate_decay_params(rir, 1, fs, f_bands=[1000.0])
    # per-sample noise power within the 1 kHz octave band
    band_noise = octave_filtering(
        noise_std * rng.randn(len(rir)), fs, [1000.0]
    )[:, 0]
    true_level = float(np.mean(band_noise ** 2))
    assert noise[0] > 0.0
    ratio_db = 10 * np.log10(noise[0] / true_level)
    assert abs(ratio_db) < 3.0, ratio_db
    assert abs(t60s[0, 0] - 0.12) / 0.12 < 0.25, t60s


def test_compare_baselines_workflow(tmp_path):
    """WASPAA25 baseline-comparison CLI at toy scale: trains the CS-MLP,
    computes barycentric-interpolated SRIRs on the same split, writes both
    EDC-error maps + a JSON summary + NAF-compatible train/infer exports
    (reference: notebooks/waspaa25/compare_against_barycentric_
    interpolation.ipynb, convert_data_to_naf_compatible.ipynb)."""
    import json
    import pickle

    from diffgfdn_tpu.cli.compare_baselines import main
    from diffgfdn_tpu.data.naf import load_pickle_tolerant
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
    )

    pkl = generate_spatial_three_room_pickle(
        tmp_path / "sp.pkl", fs=8000.0, grid_spacing_m=0.6, rir_len_s=0.12,
        decay_times=(0.04, 0.07, 0.05),
    )
    out = tmp_path / "cmp"
    main([
        "--dataset", str(pkl), "--out", str(out),
        "--grid-resolution", "1.2", "--max-epochs", "2",
        "--mlp-layers", "1", "--mlp-neurons", "16",
    ])
    summary = json.loads((out / "comparison_summary.json").read_text())
    for key in ("common_slopes_model_mean_edc_error_db",
                "barycentric_mean_edc_error_db"):
        assert np.isfinite(summary[key]) and summary[key] > 0
    assert len(summary["barycentric_per_direction_db"]) == 12
    assert (out / "edc_error_map_common_slopes_model.png").exists()
    assert (out / "edc_error_map_barycentric.png").exists()

    # NAF exports: same split, loadable through the tolerant unpickler
    train = load_pickle_tolerant(summary["naf_exports"]["naf_train"])
    infer = load_pickle_tolerant(summary["naf_exports"]["naf_infer"])
    assert train.rirs.shape[0] == summary["num_train"]
    assert infer.receiver_position.shape[0] == summary["num_heldout"]
    assert train.metadata["grid_resolution_m"] == 1.2
    # no position leaks between splits
    tr = {tuple(p) for p in np.round(train.receiver_position, 6)}
    te = {tuple(p) for p in np.round(infer.receiver_position, 6)}
    assert not (tr & te)
