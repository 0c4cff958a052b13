"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest

from diffgfdn_tpu.config.schema import TrainerConfig
from diffgfdn_tpu.data import arrays_from_room_dataset, iterate_batches, synthetic_three_room_dataset
from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
from diffgfdn_tpu.ops.filterbanks import subband_filter_response
from diffgfdn_tpu.parallel import BandParallelTrainer, make_mesh, shard_batch_dict


def test_mesh_shapes():
    mesh = make_mesh(num_bands=2)
    assert mesh.axis_names == ("band", "batch")
    assert mesh.devices.size == jax.device_count()
    assert mesh.devices.shape[0] == 2


def test_mesh_band_clipping():
    # 3 doesn't divide 8 -> falls back to 2
    mesh = make_mesh(num_bands=3)
    assert 8 % mesh.devices.shape[0] == 0


@pytest.fixture(scope="module")
def room(tmp_path_factory):
    return synthetic_three_room_dataset(
        tmp_path_factory.mktemp("par_data"),
        nfft=1024,
        num_rec_per_room=8,
        rir_len_s=0.12,
        decay_times=(0.05, 0.08, 0.06),
    )


def _model(room):
    delays = (163, 179, 191, 211, 223, 227)
    gains = []
    for k in range(3):
        d = np.asarray(delays[2 * k : 2 * k + 2])
        gains.append(
            np.asarray(
                decay_times_to_gain_per_sample(
                    float(room.common_decay_times.ravel()[k]), d, room.sample_rate
                )
            )
        )
    return DiffGFDNVarReceiverPos(
        sample_rate=room.sample_rate,
        num_groups=3,
        delays=delays,
        gains=np.concatenate(gains),
        use_svf_in_output=False,
        num_hidden_layers=1,
        num_neurons=16,
        num_fourier_features=4,
    )


def test_band_parallel_training_step(room):
    """2 bands x 4-way DP on the virtual 8-device mesh; loss decreases."""
    model = _model(room)
    cfg = TrainerConfig(
        batch_size=8, num_freq_bins=1024, max_epochs=2, lr=5e-3, io_lr=5e-3
    )
    num_bands = 2
    band_resps = np.stack(
        [
            subband_filter_response(
                fc, (63.0, 4000.0), 1, room.sample_rate, 1024,
            )
            for fc in (500.0, 1000.0)
        ]
    )
    arrays = arrays_from_room_dataset(room)
    idx = np.arange(arrays.num_items)

    def train_batches(epoch):
        return iterate_batches(arrays, idx, 8, shuffle=True, seed=epoch)

    trainer = BandParallelTrainer(
        model, cfg, band_resps, steps_per_epoch=3, max_ir_len_ms=120.0
    )
    example = next(iter(train_batches(0)))
    params, opt_state = trainer.init(example, seed=0)
    # leading band axis everywhere
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.shape[0] == num_bands

    params, opt_state, history = trainer.fit(
        params, opt_state, train_batches, max_epochs=3
    )
    assert history.shape == (3, num_bands)
    assert np.isfinite(history).all()
    # each band's loss improves (or at least doesn't blow up)
    assert (history.min(axis=0) < history[0] + 1e-6).all()


def test_band_parallel_fit_indexed(room):
    """Device-resident indexed path matches the host-batch path's contract."""
    model = _model(room)
    cfg = TrainerConfig(
        batch_size=8, num_freq_bins=1024, max_epochs=2, lr=5e-3, io_lr=5e-3
    )
    num_bands = 2
    band_resps = np.stack(
        [
            subband_filter_response(
                fc, (63.0, 4000.0), 1, room.sample_rate, 1024,
            )
            for fc in (500.0, 1000.0)
        ]
    )
    arrays = arrays_from_room_dataset(room)
    idx = np.arange(arrays.num_items)
    trainer = BandParallelTrainer(
        model, cfg, band_resps, steps_per_epoch=3, max_ir_len_ms=120.0
    )
    example = next(iter(iterate_batches(arrays, idx, 8, shuffle=False)))
    params, opt_state = trainer.init(example, seed=0)
    params, opt_state, history = trainer.fit_indexed(
        params, opt_state, arrays, train_idx=idx, max_epochs=3, seed=0
    )
    assert history.shape == (3, num_bands)
    assert np.isfinite(history).all()
    assert (history.min(axis=0) < history[0] + 1e-6).all()


def test_shard_batch_dict(room):
    mesh = make_mesh(num_bands=1)
    arrays = arrays_from_room_dataset(room)
    batch = next(iter(iterate_batches(arrays, np.arange(16), 16, shuffle=False)))
    sharded = shard_batch_dict(batch, mesh)
    sh = sharded["target_rir_response"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("batch")
    assert sharded["z_values"].sharding.spec == jax.sharding.PartitionSpec()
