"""CLI: common-slopes spatial-sampling training / all-band inference.

Reference behaviour: src/run_test_spatial_sampling.py:22-227 — train CS
DNNs per band, or run all-band inference producing SRIRs (saved to SOFA)
or BRIRs (pickled).
"""

import argparse
import logging
import pickle
from pathlib import Path

import numpy as np


def run_inference_on_all_bands(
    config_paths,
    dataset_path: str,
    grid_resolution_m: float,
    output_path: str,
    return_brirs: bool = False,
    hrtf_path: str = None,
):
    from ..config import load_and_validate_config, SpatialSamplingConfig
    from ..data.spatial_dataset import SpatialThreeRoomDataset
    from ..inference.spatial_inference import get_ambisonic_rirs

    room_data = SpatialThreeRoomDataset(dataset_path)
    configs = [
        load_and_validate_config(p, SpatialSamplingConfig) for p in config_paths
    ]
    cs_room = get_ambisonic_rirs(
        room_data.receiver_position,
        room_data,
        use_trained_model=True,
        configs=configs,
        grid_resolution_m=grid_resolution_m,
    )
    out = Path(output_path)
    if return_brirs:
        from ..inference.sofa import convert_srir_to_brir, HRIRSOFAReader

        reader = HRIRSOFAReader(hrtf_path)
        if reader.fs != cs_room.sample_rate:
            reader.resample_hrirs(cs_room.sample_rate)
        orientations = np.array([[0.0, 0.0]])
        brirs = convert_srir_to_brir(cs_room.rirs, reader, orientations)
        with open(out.with_suffix(".pkl"), "wb") as f:
            pickle.dump({"brirs": brirs, "positions": cs_room.receiver_position}, f)
    else:
        from ..inference.sofa import SRIRSOFAWriter

        rirs = np.asarray(cs_room.rirs)
        if rirs.ndim == 2:  # omni synthesis: single receiver channel
            rirs = rirs[:, None, :]
        ambi_order = int(np.sqrt(rirs.shape[1]) - 1)
        writer = SRIRSOFAWriter(
            cs_room.num_rec, ambi_order, cs_room.rir_length,
            cs_room.sample_rate,
        )
        writer.set_ir_data(rirs)
        writer.set_receiver_positions(cs_room.receiver_position)
        writer.set_source_positions(cs_room.source_position)
        writer.write_to_file(out.with_suffix(".sofa"))


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # replay unchanged XLA programs across runs
    parser = argparse.ArgumentParser(
        description="Common-slopes spatial sampling training / inference"
    )
    parser.add_argument("-c", "--config", required=True, help="YAML config")
    parser.add_argument("--infer-dataset", default=None,
                        help="run all-band inference on this dataset")
    parser.add_argument("--band-configs", nargs="*", default=None,
                        help="per-band config YAMLs for inference")
    parser.add_argument("--grid-resolution", type=float, default=0.3)
    parser.add_argument("--output", default="output/spatial/srirs_est")
    parser.add_argument("--return-brirs", action="store_true")
    parser.add_argument("--hrtf", default=None, help="HRTF SOFA path")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.infer_dataset is not None:
        # no per-band configs -> single-band inference with the main config
        band_configs = args.band_configs or [args.config]
        run_inference_on_all_bands(
            band_configs, args.infer_dataset, args.grid_resolution,
            args.output, args.return_brirs, args.hrtf,
        )
        return

    from ..config import load_and_validate_config, SpatialSamplingConfig
    from ..training.spatial_trainer import run_training_spatial_sampling

    config = load_and_validate_config(args.config, SpatialSamplingConfig)
    run_training_spatial_sampling(config)


if __name__ == "__main__":
    main()
