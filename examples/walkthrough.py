#!/usr/bin/env python
"""End-to-end walkthrough: dataset -> training -> inference -> 6DoF render.

The repo's equivalent of the reference's driver notebooks
(notebooks/create_binaural_sound_examples.ipynb + the training scripts):
one documented, reproducible pipeline exercising every stage at toy scale:

1. synthesize a 3-coupled-room dataset (omni RIR grid + directional SRIRs);
2. colorless-FDN warm start + grid training (DiffGFDNVarReceiverPos);
3. checkpoint inference -> RIR wav export;
4. subband training on two octave bands + broadband resynthesis;
5. 6DoF moving-listener binaural render (SH rotation + HRTF beamforming
   + crossfaded overlap-add) -> stereo wav + floor-plan animation.

Runs on CPU by default so it works anywhere (set WALKTHROUGH_TPU=1 to use
the TPU backend); finishes in ~2-4 minutes at the default toy scale.

Usage: python examples/walkthrough.py [--out-dir /tmp/diffgfdn_walkthrough]
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

if not os.environ.get("WALKTHROUGH_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

FS = 8000.0
NFFT = 2048


def step1_dataset(out: Path):
    """Synthetic coupled-room data: an omni RIR grid and directional SRIRs.

    (The reference ships a Treble-simulated dataset; the synthetic
    generator produces the same containers/shapes.)
    """
    from diffgfdn_tpu.data import generate_three_room_pickle
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
    )

    omni = out / "srirs.pkl"
    generate_three_room_pickle(
        omni, fs=FS, num_rec_per_room=8, rir_len_s=0.25,
        decay_times=(0.08, 0.12, 0.1),
    )
    spatial = out / "spatial_srirs.pkl"
    generate_spatial_three_room_pickle(
        spatial, fs=FS, grid_spacing_m=1.2, rir_len_s=0.25,
        decay_times=(0.08, 0.12, 0.1),
    )
    print(f"[1/5] datasets written: {omni.name}, {spatial.name}")
    return omni, spatial


def step2_train(out: Path, dataset: Path):
    """Grid training with a colorless-FDN warm start.

    The colorless prototype optimizes a flat-magnitude FDN per group; its
    feedback-matrix log warm-starts the coupled model (reference:
    solver.py:205-288 -> model build).
    """
    from diffgfdn_tpu.config.loader import load_and_validate_config
    from diffgfdn_tpu.config.schema import DiffGFDNConfig
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    cfg_yaml = f"""
seed: 1
room_dataset_path: {dataset}
num_groups: 3
sample_rate: {FS}
num_delay_lines: 6
delay_range_ms: [20, 45]
trainer_config:
  batch_size: 8
  num_freq_bins: {NFFT}
  max_epochs: 3
  lr: 1.0e-3
  train_dir: {out / 'train'}
  ir_dir: {out / 'audio'}
output_filter_config:
  use_svfs: false
  num_hidden_layers: 1
  num_neurons_per_layer: 16
  num_fourier_features: 4
decay_filter_config:
  use_absorption_filters: false
colorless_fdn_config:
  use_colorless_prototype: true
  max_epochs: 3
  batch_size: 128
"""
    cfg_path = out / "config.yml"
    cfg_path.write_text(cfg_yaml)
    config = load_and_validate_config(cfg_path, DiffGFDNConfig)
    trainer, params = run_training_var_receiver_pos(
        config, export_irs=True
    )
    print(f"[2/5] trained {len(trainer.train_loss)} epochs, "
          f"final train loss {trainer.train_loss[-1]:.3f}")
    return config


def step3_infer(out: Path, config, dataset: Path):
    """Checkpoint inference: synthesize RIRs at grid positions -> wav."""
    from diffgfdn_tpu.data.audio import write_wav
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.inference import InferDiffGFDN

    room = ThreeRoomDataset(str(dataset), nfft=NFFT)
    infer = InferDiffGFDN(config, room)
    rirs = infer.rirs_at(np.arange(4), batch_size=4)
    wav = out / "inferred_rir.wav"
    write_wav(wav, rirs[0] / (np.abs(rirs[0]).max() + 1e-9), FS)
    assert np.isfinite(rirs).all()
    print(f"[3/5] checkpoint inference OK -> {wav.name}")


def step4_subband(out: Path, dataset: Path):
    """Two-band subband training + broadband resynthesis (band filters
    re-applied and bands summed, reference run_subband_training_treble)."""
    from diffgfdn_tpu.cli.run_subband_training import main as subband_main

    args = [
        "--dataset", str(dataset),
        "--train-dir", str(out / "subband"),
        "--freqs", "500", "1000",
        "--num-freq-bins", str(NFFT),
        "--max-epochs", "1",
    ]
    subband_main(args)
    subband_main(args + ["--infer"])
    broadband = out / "subband" / "broadband_rirs.npy"
    assert broadband.exists()
    rirs = np.load(broadband)
    assert np.isfinite(rirs).all()
    print(f"[4/5] subband training + resynthesis OK -> {broadband.name} "
          f"{rirs.shape}")


def step5_binaural(out: Path, spatial: Path):
    """6DoF binaural render along a walking path + floor-plan animation."""
    from diffgfdn_tpu.data.audio import write_wav
    from diffgfdn_tpu.data.spatial_dataset import SpatialThreeRoomDataset
    from diffgfdn_tpu.inference import BinauralDynamicRendering
    from diffgfdn_tpu.utils.plot import animate_moving_listener

    room = SpatialThreeRoomDataset(str(spatial))
    rng = np.random.RandomState(0)
    hops = 8
    pos = np.tile(room.receiver_position[:4], (2, 1))[:hops]
    oris = np.stack(
        [np.linspace(0, np.pi, hops), np.zeros(hops)], axis=-1
    )
    # synthetic HRIR SH set (decaying noise); swap in a measured SOFA HRTF
    # set via inference.sofa.HRIRSOFAReader.get_spherical_harmonic_representation
    t = np.arange(128)
    hrir_sh = rng.randn(9, 2, 128) * np.exp(-t / 32.0)[None, None, :]
    stim = rng.randn(int(0.5 * FS)).astype(np.float32)

    rend = BinauralDynamicRendering(
        room, pos, oris, stim, hrir_sh, update_ms=100.0, use_whole_rir=True
    )
    binaural = rend.binaural_filter_overlap_add()  # (T, 2)
    wav = out / "binaural_walkthrough.wav"
    write_wav(wav, binaural / (np.abs(binaural).max() + 1e-9), FS)

    anim = out / "trajectory.gif"
    animate_moving_listener(
        pos, room.room_dims, room.room_start_coord,
        yaw_angles=oris[:, 0],
        source_position=np.asarray(room.source_position).reshape(-1)[:3],
        save_path=str(anim), fps=4,
    )
    assert np.isfinite(binaural).all()
    print(f"[5/5] binaural render OK -> {wav.name}, {anim.name}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out-dir", default="/tmp/diffgfdn_walkthrough")
    args = ap.parse_args(argv)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    omni, spatial = step1_dataset(out)
    config = step2_train(out, omni)
    step3_infer(out, config, omni)
    step4_subband(out, omni)
    step5_binaural(out, spatial)
    print(f"walkthrough complete; artifacts in {out}")


if __name__ == "__main__":
    main()
