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


def test_single_pos_cli_auto_freq_parallel(tmp_path, caplog):
    """The run_model CLI single-pos path auto-shards the bin axis on the
    8-device mesh (trainer_config.use_freq_parallel default auto)."""
    import logging

    from scipy.io import loadmat

    from diffgfdn_tpu.data.audio import write_wav

    fs = 8000.0
    nfft = 1024
    rng = np.random.RandomState(3)
    t = np.arange(nfft) / fs
    rir = (rng.randn(nfft) * np.exp(-t * 40.0)).astype(np.float32)
    wav = tmp_path / "ir_(1.00, 2.00, 1.50).wav"
    write_wav(wav, rir, fs)

    cfg_yaml = f"""
seed: 5
ir_path: {wav}
num_groups: 3
sample_rate: {fs}
num_delay_lines: 6
delay_range_ms: [20, 29]
trainer_config:
  batch_size: 1
  num_freq_bins: {nfft}
  max_epochs: 2
  lr: 1.0e-3
  train_dir: {tmp_path / 'train'}
output_filter_config:
  use_svfs: false
  num_hidden_layers: 1
  num_neurons_per_layer: 8
  num_fourier_features: 2
decay_filter_config:
  use_absorption_filters: false
colorless_fdn_config:
  use_colorless_prototype: false
"""
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(cfg_yaml)

    from diffgfdn_tpu.cli.run_model import main

    with caplog.at_level(logging.INFO, logger="diffgfdn_tpu"):
        main(["-c", str(cfg_path)])
    assert any(
        "sharding the rFFT bin axis over 8 devices" in r.message
        for r in caplog.records
    )
    assert any(
        "frequency axis sharded over 8 devices" in r.message
        for r in caplog.records
    )
    losses = loadmat(str(tmp_path / "train" / "losses.mat"))
    assert np.isfinite(np.asarray(losses["train_loss"])).all()

    # --freq-parallel off trains unsharded through the same CLI
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="diffgfdn_tpu"):
        main(["-c", str(cfg_path), "--freq-parallel", "off"])
    assert not any(
        "sharding the rFFT bin axis" in r.message for r in caplog.records
    )


def test_single_pos_cli_profile_dir(tmp_path):
    """--profile-dir captures a jax.profiler timeline of the run."""
    from diffgfdn_tpu.data.audio import write_wav

    fs = 8000.0
    nfft = 1024
    rng = np.random.RandomState(3)
    t = np.arange(nfft) / fs
    rir = (rng.randn(nfft) * np.exp(-t * 40.0)).astype(np.float32)
    wav = tmp_path / "ir_(1.00, 2.00, 1.50).wav"
    write_wav(wav, rir, fs)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(f"""
seed: 5
ir_path: {wav}
num_groups: 3
sample_rate: {fs}
num_delay_lines: 6
delay_range_ms: [20, 29]
trainer_config:
  batch_size: 1
  num_freq_bins: {nfft}
  max_epochs: 1
  lr: 1.0e-3
  train_dir: {tmp_path / 'train'}
output_filter_config:
  use_svfs: false
  num_hidden_layers: 1
  num_neurons_per_layer: 8
  num_fourier_features: 2
decay_filter_config:
  use_absorption_filters: false
colorless_fdn_config:
  use_colorless_prototype: false
""")

    from diffgfdn_tpu.cli.run_model import main

    prof = tmp_path / "prof"
    main(["-c", str(cfg_path), "--freq-parallel", "off",
          "--profile-dir", str(prof)])
    traces = list(prof.rglob("*.trace.json.gz")) + list(
        prof.rglob("*.xplane.pb")
    )
    assert traces, f"no profiler artifacts under {prof}"
