"""Frequency-axis (sequence-parallel analogue) sharding test."""

import jax
import numpy as np

from diffgfdn_tpu.config.schema import TrainerConfig
from diffgfdn_tpu.losses import edc_loss
from diffgfdn_tpu.models import DiffGFDNSinglePos
from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
from diffgfdn_tpu.parallel import make_freq_sharded_step
from diffgfdn_tpu.parallel.mesh import make_mesh
from diffgfdn_tpu.training.optim import make_optimizer
from diffgfdn_tpu.utils.cio import init_with_batch


def test_freq_sharded_single_pos_step():
    """Single-position fit with the 65k-bin axis sharded over 8 devices."""
    fs = 8000.0
    nfft = 2048  # (F = 1025, not divisible by 8 -> padded internally by XLA)
    delays = (163, 179, 191, 211, 223, 227)
    gains = []
    for k, t60 in enumerate((0.05, 0.08, 0.06)):
        d = np.asarray(delays[2 * k : 2 * k + 2])
        gains.append(np.asarray(decay_times_to_gain_per_sample(t60, d, fs)))
    model = DiffGFDNSinglePos(
        sample_rate=fs, num_groups=3, delays=delays,
        gains=np.concatenate(gains), use_svf_in_output=False,
    )

    f = nfft // 2 + 1
    rng = np.random.RandomState(0)
    t = np.arange(nfft) / fs
    rir = rng.randn(nfft) * np.exp(-t * 40.0)
    batch = {
        "z_values": np.exp(1j * np.linspace(0, np.pi, f)).astype(np.complex64),
        "listener_position": np.zeros((1, 3), np.float32),
        "norm_listener_position": np.zeros((1, 3), np.float32),
        "target_early_response": np.zeros((1, f), np.complex64),
        "target_rir_response": np.fft.rfft(rir, nfft)[None].astype(np.complex64),
    }
    params = init_with_batch(model, jax.random.PRNGKey(0), batch)
    cfg = TrainerConfig(batch_size=1, num_freq_bins=nfft, max_epochs=1, lr=1e-3)
    optimizer = make_optimizer(cfg, params, 1)
    opt_state = optimizer.init(params)

    def loss_fn(p, b, key):
        h = model.apply(p, b)
        total = edc_loss(
            b["target_rir_response"][0], h, 160, 1600
        )
        return total, {"edc": total}

    mesh = make_mesh(num_bands=1)  # (1, 8): all devices on the 'batch' axis
    step = make_freq_sharded_step(model, loss_fn, optimizer, mesh)
    p2, o2, total, aux = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))

    # matches the unsharded step numerically
    from diffgfdn_tpu.utils.cio import decode_batch, encode_batch

    total_ref, _ = jax.jit(
        lambda p, b, k: loss_fn(p, decode_batch(b), k)
    )(params, encode_batch(batch), jax.random.PRNGKey(1))
    assert abs(float(total) - float(total_ref)) < 1e-3
