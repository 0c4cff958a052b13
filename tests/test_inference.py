"""Inference layer tests: CS synthesis, rendering, SOFA I/O, GFDN inference."""

import jax
import numpy as np
import pytest

from diffgfdn_tpu.inference import (
    add_direct_and_early_path,
    BinauralDynamicRendering,
    convert_directional_rirs_to_ambisonics,
    convert_srir_to_brir,
    DynamicRenderingMovingReceiver,
    get_ambisonic_rirs,
    integrated_loudness,
    merge_subband_rirs,
    normalise_loudness,
    shaped_wgn_multiband,
    spatial_bandlimiting,
    SRIRSOFAWriter,
    HRIRSOFAReader,
)
from diffgfdn_tpu.ops.basic import schroeder_backward_int
from diffgfdn_tpu.ops.filterbanks import reconstructing_fractional_octave_bands
from diffgfdn_tpu.ops.sph import (
    maxre_modal_weights,
    t_design_directions,
)

FS = 8000.0
BANDS = [125.0, 250.0, 500.0, 1000.0, 2000.0]


def test_shaped_wgn_multiband_edc():
    """Synthesized tails follow the per-band CS energy envelopes."""
    import jax.numpy as jnp

    t60 = np.array([0.2, 0.4])
    n = 4096
    amps = np.zeros((2, 2, len(BANDS)), np.float32)
    amps[0, 0, :] = 1.0  # position 0: pure slope 1 (0.2s)
    amps[1, 1, :] = 1.0  # position 1: pure slope 2 (0.4s)
    rirs = shaped_wgn_multiband(
        t60, amps, FS, n, BANDS, jax.random.PRNGKey(0)
    )
    assert rirs.shape == (2, n)
    for p, expect in [(0, 0.2), (1, 0.4)]:
        edc = np.asarray(
            schroeder_backward_int(jnp.asarray(rirs[p]), normalize=True)
        )
        edc_db = 10 * np.log10(edc + 1e-12)
        i0, i1 = int(0.05 * FS), int(0.15 * FS)
        slope = (edc_db[i1] - edc_db[i0]) / ((i1 - i0) / FS)
        t60_est = -60.0 / slope
        assert 0.7 * expect < t60_est < 1.4 * expect, (expect, t60_est)


def test_spatial_bandlimiting_preserves_energy():
    rng = np.random.RandomState(0)
    dirs = t_design_directions(5)
    des = np.stack([dirs[0], np.pi / 2 - dirs[1]])
    drirs = rng.randn(12, 3, 256)
    out = spatial_bandlimiting(2, des, drirs, maxre_modal_weights(2), "custom")
    e_in = np.sum(drirs ** 2, axis=(0, -1))
    e_out = np.sum(out ** 2, axis=(0, -1))
    assert np.allclose(e_in, e_out, rtol=1e-6)


def test_directional_to_ambisonics_roundtrip():
    """directional -> ambi -> directional via analysis recovers signals."""
    from diffgfdn_tpu.ops.sph import design_sph_filterbank, modal_weights

    rng = np.random.RandomState(1)
    dirs = t_design_directions(5)
    des = np.stack([dirs[0], np.pi / 2 - dirs[1]])
    c_n = modal_weights(None, 2)
    a, b = design_sph_filterbank(2, dirs[0], dirs[1], c_n)
    # directional signals that live in the SH subspace
    x_sh = rng.randn(9, 4, 64)  # (Q, P, T)
    drirs = np.einsum("jq,qpt->jpt", a, x_sh)
    ambi = convert_directional_rirs_to_ambisonics(2, des, None, drirs)
    assert ambi.shape == (4, 9, 64)
    # the synthesis recovers the SH signals exactly (B^T A = I)
    assert np.allclose(ambi.transpose(1, 0, 2), x_sh, atol=1e-6)


def test_get_ambisonic_rirs_from_dataset(tmp_path):
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    path = generate_spatial_three_room_pickle(
        tmp_path / "srirs.pkl", grid_spacing_m=1.2, rir_len_s=0.3,
        decay_times=(0.1, 0.15, 0.12),
    )
    room = SpatialThreeRoomDataset(path)
    # use the single stored band
    q = room.receiver_position[:3]
    out = get_ambisonic_rirs(q, room, use_trained_model=False, max_ir_len_ms=250)
    assert out.rirs.shape[0] == 3
    assert out.rirs.shape[1] == 9
    assert np.isfinite(out.rirs).all()


def test_merge_subband_rirs_reconstructs_broadband():
    """Band-splitting then merging with the dual filterbank ~ identity."""
    rng = np.random.RandomState(0)
    n = 4096
    x = rng.randn(2, n)
    filters, _ = reconstructing_fractional_octave_bands(
        num_fractions=1, frequency_range=(63, 4000), n_samples=1024,
        sampling_rate=FS,
    )
    delay = filters.shape[-1] // 2
    from scipy.signal import fftconvolve

    band_rirs = [
        fftconvolve(x, filters[b][None], mode="full", axes=-1)[:, delay : delay + n]
        for b in range(len(filters))
    ]
    # summing the bands directly reconstructs (amplitude-preserving bank)
    direct_sum = np.sum(band_rirs, axis=0)
    err = np.abs(direct_sum - x)[:, 200:-200]
    assert np.median(err) < 0.05 * np.median(np.abs(x))
    # merge_subband_rirs applies one more band filter per band (as the
    # reference's resynthesis does) — output remains finite & bounded
    merged = merge_subband_rirs(band_rirs, filters)
    assert merged.shape == (2, n)
    assert np.isfinite(merged).all()


def test_sofa_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    writer = SRIRSOFAWriter(num_receivers=3, ambi_order=1, ir_length=64,
                            samplerate=FS)
    irs = rng.randn(3, 4, 64)
    writer.set_ir_data(irs)
    writer.set_receiver_positions(rng.rand(3, 3))
    writer.set_source_positions(np.array([[1.0, 2.0, 1.5]]))
    writer.write_to_file(tmp_path / "test.sofa")
    import h5py

    with h5py.File(tmp_path / "test.sofa", "r") as f:
        assert np.allclose(f["Data.IR"], irs)
        assert float(np.asarray(f["Data.SamplingRate"])[0]) == FS


def test_sofa_writer_per_measurement_sources(tmp_path):
    """A (M, 3) source array is written per-measurement, not reshaped.

    Regression: the writer used to reshape(1, 3), crashing on any dataset
    with more than one source position (SpatialRoomDataset supports
    num_src > 1).
    """
    import h5py

    rng = np.random.RandomState(1)
    writer = SRIRSOFAWriter(num_receivers=3, ambi_order=1, ir_length=32,
                            samplerate=FS)
    writer.set_ir_data(rng.randn(3, 4, 32))
    writer.set_receiver_positions(rng.rand(3, 3))
    srcs = rng.rand(3, 3)
    writer.set_source_positions(srcs)
    writer.write_to_file(tmp_path / "multisrc.sofa")
    with h5py.File(tmp_path / "multisrc.sofa", "r") as f:
        assert np.allclose(f["SourcePosition"], srcs)

    # a count that is neither 1 nor M is a clear error, not a crash deep
    # inside np.tile
    writer.set_source_positions(rng.rand(2, 3))
    with pytest.raises(ValueError, match="SourcePosition"):
        writer.write_to_file(tmp_path / "bad.sofa")


def test_sofa_writer_netcdf4_conformance(tmp_path):
    """Written files carry real netCDF4 structure, not just HDF5 datasets.

    netCDF-c (and therefore sofar / netCDF4-python / the Matlab SOFA API)
    requires: dimension-scale datasets with CLASS/NAME/_Netcdf4Dimid, every
    variable axis attached to a scale (DIMENSION_LIST on the variable,
    REFERENCE_LIST back on the scale), and _NCProperties at the root.
    Reference contract: sofa_parser.py:290-449,507-532 (sofar.write_sofa).
    """
    import h5py

    rng = np.random.RandomState(0)
    writer = SRIRSOFAWriter(num_receivers=3, ambi_order=1, ir_length=64,
                            samplerate=FS)
    writer.set_ir_data(rng.randn(3, 4, 64))
    writer.set_receiver_positions(rng.rand(3, 3))
    writer.set_source_positions(np.array([[1.0, 2.0, 1.5]]))
    path = tmp_path / "conformant.sofa"
    writer.write_to_file(path)

    expected_dims = {"M": 3, "R": 4, "N": 64, "E": 1, "C": 3, "I": 1}
    var_dims = {
        "Data.IR": ("M", "R", "N"),
        "Data.SamplingRate": ("I",),
        "Data.Delay": ("I", "R"),
        "ListenerPosition": ("M", "C"),
        "ListenerView": ("I", "C"),
        "ListenerUp": ("I", "C"),
        "ReceiverPosition": ("R", "C", "I"),
        "ReceiverView": ("R", "C", "I"),
        "ReceiverUp": ("R", "C", "I"),
        "SourcePosition": ("M", "C"),
        "SourceView": ("I", "C"),
        "SourceUp": ("I", "C"),
        "EmitterPosition": ("E", "C", "I"),
        "MeasurementDate": ("M",),
    }
    with h5py.File(path, "r") as f:
        # netCDF-c superblock marker
        assert f.attrs["_NCProperties"].startswith(b"version=2")
        # mandatory SingleRoomSRIR global metadata
        for attr in ("Conventions", "Version", "SOFAConventions",
                     "SOFAConventionsVersion", "DataType", "RoomType",
                     "License", "DateCreated", "Title", "APIName"):
            assert attr in f.attrs, attr
        assert f.attrs["SOFAConventions"] == "SingleRoomSRIR"
        assert f.attrs["DataType"] == "FIR"
        # every dimension is a true HDF5 dimension scale with netCDF naming
        for name, size in expected_dims.items():
            d = f[name]
            assert h5py.h5ds.is_scale(d.id), name
            assert d.shape == (size,)
            assert d.attrs["CLASS"] == b"DIMENSION_SCALE"
            assert d.attrs["NAME"].startswith(
                b"This is a netCDF dimension but not a netCDF variable."
            )
            assert "_Netcdf4Dimid" in d.attrs
            # attach_scale materialised the back-references netCDF-c walks
            assert "REFERENCE_LIST" in d.attrs, name
        # every variable axis is attached to the right scale
        for name, dims in var_dims.items():
            ds = f[name]
            assert "DIMENSION_LIST" in ds.attrs, name
            assert len(ds.dims) == len(dims)
            for axis, dim_name in enumerate(dims):
                scales = [s for s in ds.dims[axis].values()]
                assert len(scales) == 1, (name, axis)
                assert scales[0] == f[dim_name], (name, axis)
        # geometry variables carry Type/Units
        assert ds_attr(f["ListenerPosition"], "Type") == "cartesian"
        assert ds_attr(f["Data.SamplingRate"], "Units") == "hertz"


def ds_attr(ds, key):
    v = ds.attrs[key]
    return v.decode() if isinstance(v, bytes) else str(v)


def _mock_hrir_reader(tmp_path):
    """Write a tiny HRIR SOFA set on a t-design grid and read it back."""
    import h5py

    dirs = t_design_directions(5)
    azi = np.rad2deg(dirs[0])
    ele = np.rad2deg(np.pi / 2 - dirs[1])
    m = len(azi)
    rng = np.random.RandomState(3)
    irs = np.zeros((m, 2, 32))
    irs[:, :, 0] = 1.0  # impulse HRIRs
    irs += 0.01 * rng.randn(m, 2, 32)
    path = tmp_path / "hrir.sofa"
    with h5py.File(path, "w") as f:
        f.create_dataset("Data.IR", data=irs)
        f.create_dataset("Data.SamplingRate", data=np.array([FS]))
        sp = f.create_dataset(
            "SourcePosition",
            data=np.stack([azi, ele, np.ones(m)], axis=-1),
        )
        sp.attrs["Units"] = "degree, degree, metre"
    return HRIRSOFAReader(path)


def test_hrir_reader_and_sh_representation(tmp_path):
    reader = _mock_hrir_reader(tmp_path)
    assert reader.num_meas == 12
    assert reader.num_receivers == 2
    sh = reader.get_spherical_harmonic_representation(2)
    assert sh.shape[0] == 9 and sh.shape[1] == 2
    # impulse HRIRs: the omni (first) SH channel carries the energy
    e = np.sum(sh ** 2, axis=(1, 2))
    assert e[0] > 5 * e[1:].max()


def test_convert_srir_to_brir(tmp_path):
    reader = _mock_hrir_reader(tmp_path)
    rng = np.random.RandomState(0)
    srirs = rng.randn(2, 9, 128)
    oris = np.array([[0.0, 0.0], [np.pi / 2, 0.0]])
    brirs = convert_srir_to_brir(srirs, reader, oris)
    # nfft covers the FULL conv length T + hrir_len - 1 (no circular
    # wraparound onto the direct-sound region, unlike the reference)
    hrir_len = reader.get_spherical_harmonic_representation(2).shape[-1]
    nfft = int(2 ** np.ceil(np.log2(128 + hrir_len - 1)))
    assert brirs.shape == (2, 2, nfft, 2)
    assert np.isfinite(brirs).all()


def test_dynamic_rendering_static_receiver_is_convolution(tmp_path):
    from diffgfdn_tpu.data import synthetic_three_room_dataset

    room = synthetic_three_room_dataset(
        tmp_path, nfft=2048, num_rec_per_room=2, rir_len_s=0.1,
        decay_times=(0.03, 0.05, 0.04),
    )
    rng = np.random.RandomState(0)
    stim = rng.randn(1600).astype(np.float32)
    pos = np.tile(room.receiver_position[0], (4, 1))
    rend = DynamicRenderingMovingReceiver(room, pos, stim, update_ms=50)
    out = rend.filter_overlap_add(use_whole_rir=True)
    from scipy.signal import fftconvolve

    ref = fftconvolve(rend.extended_stimulus, room.rirs[0])[: len(out)]
    # the first hop precedes any crossfade -> exact convolution there
    hop = rend.hop_size
    assert np.allclose(out[:hop], ref[:hop], atol=1e-4 * np.abs(ref).max())
    # the hop-boundary crossfades (reference semantics, sound_examples.py:
    # 204-216) blend the previous tail in, so later hops only track the
    # reference convolution approximately
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.6
    assert np.isfinite(out).all()
    # moving-listener demo animation (reference sound_examples.py:257-353)
    rend.animate_trajectory(
        str(tmp_path / "walk.mp4"), yaw_angles=np.linspace(0, 1.0, 4)
    )
    assert (tmp_path / "walk.mp4").exists() or (tmp_path / "walk.gif").exists()


def test_binaural_rendering_shapes(tmp_path):
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    path = generate_spatial_three_room_pickle(
        tmp_path / "s.pkl", grid_spacing_m=1.2, rir_len_s=0.1,
        decay_times=(0.03, 0.05, 0.04),
    )
    room = SpatialThreeRoomDataset(path)
    reader = _mock_hrir_reader(tmp_path)
    hrir_sh = reader.get_spherical_harmonic_representation(2)
    rng = np.random.RandomState(0)
    stim = rng.randn(800).astype(np.float32)
    pos = room.receiver_position[:3]
    oris = np.stack([np.linspace(0, np.pi / 2, 3), np.zeros(3)], axis=-1)
    rend = BinauralDynamicRendering(
        room, pos, oris, stim, hrir_sh, update_ms=50, use_whole_rir=True
    )
    out = rend.binaural_filter_overlap_add()
    assert out.shape == (rend.total_sim_len, 2)
    assert np.isfinite(out).all() and np.abs(out).max() > 0


def test_binaural_jax_backend_matches_host(tmp_path):
    """The batched device render reproduces the host hop loop exactly
    (fresh smoothing state), including the end-truncated crossfade tails."""
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    path = generate_spatial_three_room_pickle(
        tmp_path / "s.pkl", grid_spacing_m=1.2, rir_len_s=0.1,
        decay_times=(0.03, 0.05, 0.04),
    )
    room = SpatialThreeRoomDataset(path)
    reader = _mock_hrir_reader(tmp_path)
    hrir_sh = reader.get_spherical_harmonic_representation(2)
    rng = np.random.RandomState(1)
    n_hops = 5
    pos = np.tile(room.receiver_position[:3], (2, 1))[:n_hops]
    oris = np.stack(
        [np.linspace(0, np.pi, n_hops), np.linspace(0, 0.3, n_hops)], axis=-1
    )
    hop_ms = 50
    stim = rng.randn(
        n_hops * int(room.sample_rate * hop_ms / 1000)
    ).astype(np.float32)
    rend = BinauralDynamicRendering(
        room, pos, oris, stim, hrir_sh, update_ms=hop_ms, use_whole_rir=True
    )
    out_jax = rend.binaural_filter_overlap_add(backend="jax")
    out_host = rend.binaural_filter_overlap_add()  # fresh smoothing state
    assert out_jax.shape == out_host.shape
    assert np.allclose(out_jax, out_host, atol=1e-4 * np.abs(out_host).max())


def test_binaural_dict_path_matches_einsum(tmp_path):
    """The beamformed-RTF dictionary program (atoms precomputed at the
    convolution fft size, per-hop BRTF = one real matmul) is exactly the
    einsum program by linearity; pin parity between the two device paths
    and check the auto-selection bookkeeping."""
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    path = generate_spatial_three_room_pickle(
        tmp_path / "s.pkl", grid_spacing_m=1.2, rir_len_s=0.1,
        decay_times=(0.03, 0.05, 0.04),
    )
    room = SpatialThreeRoomDataset(path)
    reader = _mock_hrir_reader(tmp_path)
    hrir_sh = reader.get_spherical_harmonic_representation(2)
    rng = np.random.RandomState(3)
    n_hops = 5
    pos = np.tile(room.receiver_position[:3], (2, 1))[:n_hops]
    oris = np.stack(
        [np.linspace(0, np.pi, n_hops), np.linspace(-0.2, 0.3, n_hops)],
        axis=-1,
    )
    hop_ms = 50
    hop = int(room.sample_rate * hop_ms / 1000)
    stim = rng.randn(n_hops * hop).astype(np.float32)
    rend = BinauralDynamicRendering(
        room, pos, oris, stim, hrir_sh, update_ms=hop_ms, use_whole_rir=True
    )
    # tiny problem: the dictionary comfortably fits the default budget
    assert rend._use_dict_path()
    rend.dict_path = True
    out_dict = rend.binaural_filter_overlap_add(backend="jax")
    rend.dict_path = False
    out_einsum = rend.binaural_filter_overlap_add(backend="jax")
    np.testing.assert_allclose(
        out_dict, out_einsum, atol=2e-5 * np.abs(out_einsum).max()
    )

    # multi-trajectory front end: dict vs einsum parity too
    stim2 = rng.randn(n_hops * hop).astype(np.float32)
    stimuli = np.stack([rend.extended_stimulus[: n_hops * hop], stim2])
    rend.dict_path = True
    multi_dict = rend.binaural_filter_overlap_add_multi(stimuli)
    rend.dict_path = False
    multi_einsum = rend.binaural_filter_overlap_add_multi(stimuli)
    np.testing.assert_allclose(
        multi_dict, multi_einsum,
        atol=2e-5 * np.abs(multi_einsum).max(),
    )


def test_loudness_normalization():
    rng = np.random.RandomState(0)
    sig = 0.01 * rng.randn(int(FS * 3))
    out = normalise_loudness(sig, FS, db_lufs=-18.0)
    assert abs(integrated_loudness(out, FS) + 18.0) < 0.5


def test_add_direct_and_early_path(tmp_path):
    from diffgfdn_tpu.data import synthetic_three_room_dataset

    room = synthetic_three_room_dataset(
        tmp_path, nfft=2048, num_rec_per_room=2, rir_len_s=0.2,
        decay_times=(0.05, 0.08, 0.06),
    )
    rng = np.random.RandomState(1)
    late = rng.randn(*room.rirs.shape) * 0.1
    full = add_direct_and_early_path(
        room.rirs, room.receiver_position, late, room.receiver_position,
        room.sample_rate, mixing_time_ms=50.0,
    )
    assert full.shape == room.rirs.shape
    # the early part (before mixing time minus fade) is the measured one
    mix = int(0.05 * room.sample_rate)
    assert np.allclose(full[:, : mix - 50], room.rirs[:, : mix - 50], atol=1e-6)


def test_binaural_multi_trajectory_matches_single(tmp_path):
    """One multi-trajectory dispatch reproduces per-trajectory jax renders:
    row 0 uses this renderer's own path; row 1 a different orientation
    list + receiver path (throughput serving path; VERDICT r3 item 2)."""
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    path = generate_spatial_three_room_pickle(
        tmp_path / "s.pkl", grid_spacing_m=1.2, rir_len_s=0.1,
        decay_times=(0.03, 0.05, 0.04),
    )
    room = SpatialThreeRoomDataset(path)
    reader = _mock_hrir_reader(tmp_path)
    hrir_sh = reader.get_spherical_harmonic_representation(2)
    rng = np.random.RandomState(1)
    n_hops = 4
    hop_ms = 50
    hop = int(room.sample_rate * hop_ms / 1000)
    pos = np.tile(room.receiver_position[:2], (2, 1))[:n_hops]
    oris = np.stack(
        [np.linspace(0, np.pi, n_hops), np.zeros(n_hops)], axis=-1
    )
    stim = rng.randn(n_hops * hop).astype(np.float32)
    rend = BinauralDynamicRendering(
        room, pos, oris, stim, hrir_sh, update_ms=hop_ms, use_whole_rir=True
    )

    oris2 = np.stack(
        [np.linspace(np.pi, 0, n_hops), np.full(n_hops, 0.2)], axis=-1
    )
    rec2 = np.array([1, 0, 1, 0])  # different receiver path (hop indices)
    stim2 = rng.randn(n_hops * hop).astype(np.float32)

    multi = rend.binaural_filter_overlap_add_multi(
        np.stack([rend.extended_stimulus[: n_hops * hop], stim2]),
        orientations=np.stack([oris, oris2]),
        rec_indices=np.stack([np.arange(n_hops), rec2]),
    )
    assert multi.shape[0] == 2 and np.isfinite(multi).all()

    # row 0 == the single-trajectory device render
    single = rend.binaural_filter_overlap_add(backend="jax")
    np.testing.assert_allclose(
        multi[0], single[: multi.shape[1]], atol=1e-5 * np.abs(single).max()
    )

    # row 1 == a fresh renderer walking trajectory 2
    rend2 = BinauralDynamicRendering(
        room, pos[rec2], oris2, stim2, hrir_sh, update_ms=hop_ms,
        use_whole_rir=True,
    )
    single2 = rend2.binaural_filter_overlap_add(backend="jax")
    np.testing.assert_allclose(
        multi[1], single2[: multi.shape[1]], atol=1e-5 * np.abs(single2).max()
    )
