"""CLI: 8-band subband DiffGFDN training + broadband resynthesis.

Reference behaviour: src/run_subband_training_treble.py:35-375 — a per-band
config factory with per-band MLP hyperparameters, one training per octave
band, then inference that band-filters each model's RIRs and sums across
bands.

TPU-native delta: instead of 8 sequential python jobs, all bands can train
simultaneously in ONE program on a (band x batch) device mesh
(``--band-parallel``, diffgfdn_tpu.parallel.BandParallelTrainer).
"""

import argparse
import logging
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

DEFAULT_FREQS = [63.0, 125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0]

# per-band MLP hyperparameters (the reference tunes these per band,
# run_subband_training_treble.py:62-73)
BAND_MLP_PARAMS: Dict[float, Tuple[int, int]] = {
    63.0: (3, 64), 125.0: (3, 64), 250.0: (3, 128), 500.0: (3, 128),
    1000.0: (3, 128), 2000.0: (3, 128), 4000.0: (4, 128), 8000.0: (4, 128),
}


def create_config(
    freq: float,
    dataset_path: str,
    base_train_dir: str = "output/subband",
    num_freq_bins: int = 2 ** 17,
    sample_rate: float = 32000.0,
    max_epochs: int = 20,
    batch_size: int = 32,
    use_colorless_loss: bool = True,
):
    """Per-band DiffGFDNConfig (reference: create_config, :35-172)."""
    from ..config import (
        ColorlessFDNConfig,
        DiffGFDNConfig,
        OutputFilterConfig,
        SubbandProcessingConfig,
        TrainerConfig,
    )

    layers, neurons = BAND_MLP_PARAMS.get(freq, (3, 128))
    return DiffGFDNConfig(
        seed=int(235 + freq),
        room_dataset_path=dataset_path,
        num_groups=3,
        sample_rate=sample_rate,
        num_delay_lines=12,
        trainer_config=TrainerConfig(
            batch_size=batch_size,
            num_freq_bins=num_freq_bins,
            max_epochs=max_epochs,
            lr=1e-3,
            io_lr=1e-3,
            coupling_angle_lr=1e-3,
            use_colorless_loss=use_colorless_loss,
            subband_process_config=SubbandProcessingConfig(
                centre_frequency=freq,
                frequency_range=(63.0, min(16000.0, sample_rate / 2)),
                num_fraction_octaves=1,
            ),
            train_dir=f"{base_train_dir}/band_{freq:.0f}Hz/",
            ir_dir=f"{base_train_dir}/band_{freq:.0f}Hz/audio/",
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False,
            num_hidden_layers=layers,
            num_neurons_per_layer=neurons,
        ),
        colorless_fdn_config=ColorlessFDNConfig(use_colorless_prototype=False),
    )


def training(configs, room_data=None):
    """Sequential per-band training (reference behaviour)."""
    from ..training.solver import run_training_var_receiver_pos

    for cfg in configs:
        run_training_var_receiver_pos(cfg, room_data=room_data)


def _architecture_key(cfg) -> Tuple:
    """Static fields that determine the vmapped parameter shapes."""
    oc = cfg.output_filter_config
    return (
        oc.num_hidden_layers,
        oc.num_neurons_per_layer,
        oc.num_fourier_features,
        oc.use_svfs,
        cfg.num_delay_lines,
        cfg.num_groups,
    )


def training_band_parallel(configs, room_data=None):
    """All bands in (band x batch)-sharded programs (TPU-native path).

    Semantic parity with the reference's per-band jobs
    (run_subband_training_treble.py:175-204): per-band MLP architectures
    are honoured by GROUPING bands with the same architecture into one
    vmapped program each (a vmapped band axis needs one parameter shape);
    every band keeps its own seed, the full loss stack (incl. colorless),
    a validation split, per-band early stopping, and per-epoch checkpoints
    in its own train_dir.
    """
    import jax

    from ..data.batching import (
        arrays_from_room_dataset,
        init_example_batch,
        train_valid_split,
    )
    from ..data.room_dataset import ThreeRoomDataset
    from ..parallel import BandParallelTrainer
    from ..training.build import build_gfdn_model
    from ..training.checkpoints import save_checkpoint
    from ..training.solver import _subband_resp

    if room_data is None:
        room_data = ThreeRoomDataset(
            configs[0].room_dataset_path,
            nfft=configs[0].trainer_config.num_freq_bins,
        )
    from ..training.solver import check_sample_rate

    for cfg in configs:
        check_sample_rate(cfg, room_data)
    arrays = arrays_from_room_dataset(room_data)

    groups: Dict[Tuple, list] = {}
    for cfg in configs:
        groups.setdefault(_architecture_key(cfg), []).append(cfg)

    histories = []
    for arch_key, group in groups.items():
        cfg0 = group[0]
        model = build_gfdn_model(
            cfg0,
            common_decay_times=room_data.common_decay_times,
            band_centre_hz=room_data.band_centre_hz,
            variant="var_receiver",
        )
        band_resps = np.stack([_subband_resp(c) for c in group])
        # one train/valid split shared by the group (delta vs the
        # reference's per-band splits: one program = one index stream)
        indices = np.arange(arrays.num_items)
        train_idx, valid_idx = train_valid_split(
            indices, cfg0.trainer_config.train_valid_split, seed=cfg0.seed
        )
        bs = min(cfg0.trainer_config.batch_size, max(1, len(train_idx)))

        trainer = BandParallelTrainer(
            model,
            cfg0.trainer_config,
            band_resps,
            steps_per_epoch=max(1, len(train_idx) // bs),
            max_ir_len_ms=float(np.max(room_data.common_decay_times)) * 1e3,
        )
        # zero-target init example: bit-identical parameters without
        # materializing the lazy host target spectra (init_example_batch)
        example = init_example_batch(arrays, bs)
        params, opt_state = trainer.init(
            example, seeds=[c.seed for c in group]
        )
        # per-band target features once per dataset (the slow path would
        # re-derive the band-filtered target EDC/EDR every step)
        trainer.precompute_band_target_features(arrays)

        def on_epoch(epoch, ep_params, train_losses, valid_losses, trained):
            # ONE pipelined fetch of the whole band-stacked tree, then
            # host-side slicing per band: per-band-per-leaf fetches cost
            # bands x leaves serial tunnel round trips (~5 s/epoch at
            # production scale); this costs one overlapped batch
            from ..training.checkpoints import _to_numpy

            host_params = _to_numpy(ep_params)
            for b, cfg in enumerate(group):
                if trained[b] == 0.0 and epoch > 0:
                    continue  # band frozen this epoch; its last ckpt stands
                band_params = jax.tree_util.tree_map(
                    lambda x: x[b], host_params
                )
                save_checkpoint(cfg.trainer_config.train_dir, epoch, band_params)

        # device-resident data: one upload, on-device batch gathers per step
        params, opt_state, history = trainer.fit_indexed(
            params, opt_state, arrays,
            train_idx=train_idx, valid_idx=valid_idx,
            max_epochs=cfg0.trainer_config.max_epochs, seed=cfg0.seed,
            on_epoch=on_epoch,
        )
        histories.append(history)
        logging.getLogger("diffgfdn_tpu").info(
            "band group %s: %d bands, %d epochs, final per-band train loss %s",
            arch_key, len(group), history.shape[0], history[-1],
        )
    return histories


def inferencing(configs, room_data=None, rec_indices=None):
    """Per-band RIR synthesis + reconstruction to broadband RIRs."""
    from ..data.room_dataset import ThreeRoomDataset
    from ..inference.gfdn_inference import infer_all_octave_bands

    if room_data is None:
        cfg0 = configs[0]
        room_data = ThreeRoomDataset(
            cfg0.room_dataset_path, nfft=cfg0.trainer_config.num_freq_bins
        )
    if rec_indices is None:
        rec_indices = np.arange(room_data.num_rec)
    return infer_all_octave_bands(configs, room_data, rec_indices)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # replay unchanged XLA programs across runs
    parser = argparse.ArgumentParser(
        description="Per-octave-band DiffGFDN training + resynthesis"
    )
    parser.add_argument(
        "--freqs", type=float, nargs="+", default=DEFAULT_FREQS,
        help="octave band centre frequencies",
    )
    parser.add_argument("--dataset", required=True, help="srirs.pkl path")
    parser.add_argument("--train-dir", default="output/subband")
    parser.add_argument("--num-freq-bins", type=int, default=2 ** 17)
    parser.add_argument("--max-epochs", type=int, default=20)
    parser.add_argument(
        "--sample-rate", type=float, default=None,
        help="sample rate in Hz (default: read from the dataset pickle)",
    )
    parser.add_argument(
        "--band-parallel", action="store_true",
        help="train all bands in one sharded program (TPU-native)",
    )
    parser.add_argument("--infer", action="store_true", help="run inference")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    # load the dataset ONCE: it provides the sample rate and is reused by
    # the training/inference paths (a separate peek would deserialize the
    # multi-GB pickle twice)
    from ..data.room_dataset import ThreeRoomDataset

    room_data = ThreeRoomDataset(args.dataset, nfft=args.num_freq_bins)
    sample_rate = args.sample_rate or float(room_data.sample_rate)
    configs = [
        create_config(
            f, args.dataset, args.train_dir, args.num_freq_bins,
            sample_rate=sample_rate, max_epochs=args.max_epochs,
        )
        for f in args.freqs
    ]
    if args.infer:
        rirs = inferencing(configs, room_data=room_data)
        out = Path(args.train_dir) / "broadband_rirs.npy"
        np.save(out, rirs)
        print(f"saved broadband RIRs to {out}")
    elif args.band_parallel:
        training_band_parallel(configs, room_data=room_data)
    else:
        training(configs, room_data=room_data)


if __name__ == "__main__":
    main()
