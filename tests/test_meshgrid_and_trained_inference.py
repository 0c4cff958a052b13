"""Meshgrid encoding path + trained-model spatial inference end-to-end."""

import numpy as np

from diffgfdn_tpu.config.schema import (
    DNNConfig,
    FeatureEncodingType,
    MLPConfig,
    SpatialSamplingConfig,
)


def test_meshgrid_encoded_gains_head():
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.basic import get_frequency_samples

    delays = (163, 179, 191, 211, 223, 227)
    gains = []
    for k, t60 in enumerate((0.05, 0.08, 0.06)):
        d = np.asarray(delays[2 * k : 2 * k + 2])
        gains.append(np.asarray(decay_times_to_gain_per_sample(t60, d, 8000.0)))
    model = DiffGFDNVarReceiverPos(
        sample_rate=8000.0, num_groups=3, delays=delays,
        gains=np.concatenate(gains), use_svf_in_output=False,
        num_hidden_layers=1, num_neurons=16, num_fourier_features=4,
        encoding_type=FeatureEncodingType.MESHGRID,
    )
    rng = np.random.RandomState(0)
    mesh = rng.rand(50, 2).astype(np.float32) * 5
    pos = np.concatenate([mesh[:4], np.full((4, 1), 1.5, np.float32)], axis=1)
    x = {
        "z_values": get_frequency_samples(65),
        "listener_position": jnp.asarray(pos),
        "norm_listener_position": jnp.asarray(pos / 5),
        "mesh_2d": jnp.asarray(mesh),
        "target_early_response": jnp.zeros((4, 65), jnp.complex64),
    }
    params = model.init(jax.random.PRNGKey(0), x)
    h = model.apply(params, x)
    assert h.shape == (4, 65)
    assert np.isfinite(np.asarray(jnp.abs(h))).all()


def test_one_hot_mesh_encoding_marks_nearest():
    import jax.numpy as jnp

    from diffgfdn_tpu.models import one_hot_mesh_encoding

    mesh = jnp.asarray(
        np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)
    )
    rec = jnp.asarray(np.array([[0.9, 0.95, 1.5]], np.float32))
    inp, closest, idx = one_hot_mesh_encoding(mesh, rec)
    assert int(idx[0]) == 3
    assert np.allclose(np.asarray(closest[0]), [1.0, 1.0])
    assert float(inp[3, 2]) == 1.0 and float(inp[0, 2]) == 0.0


def test_trained_model_spatial_inference(tmp_path):
    """Train a 1-band CS MLP, then synthesize SRIRs through the trained path."""
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )
    from diffgfdn_tpu.inference.spatial_inference import get_ambisonic_rirs
    from diffgfdn_tpu.training.spatial_trainer import run_training_spatial_sampling

    path = generate_spatial_three_room_pickle(
        tmp_path / "sp.pkl", fs=4000.0, grid_spacing_m=1.2, rir_len_s=0.15,
        decay_times=(0.05, 0.08, 0.06),
    )
    room = SpatialThreeRoomDataset(path)
    cfg = SpatialSamplingConfig(
        batch_size=16, seed=1, max_epochs=2, lr=5e-3,
        train_dir=str(tmp_path / "spt"),
        use_directional_rirs=True,
        dnn_config=DNNConfig(
            mlp_config=MLPConfig(num_neurons_per_layer=16, num_hidden_layers=1),
            num_fourier_features=4,
        ),
    )
    run_training_spatial_sampling(cfg, room_data=room, grid_resolutions=[1.2])

    query = room.receiver_position[:3]
    out = get_ambisonic_rirs(
        query, room, use_trained_model=True, configs=[cfg],
        grid_resolution_m=1.2, max_ir_len_ms=120.0,
    )
    assert out.rirs.shape == (3, 9, int(0.12 * room.sample_rate))
    assert np.isfinite(out.rirs).all()
    assert np.abs(out.rirs).max() > 0
