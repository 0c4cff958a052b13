"""CLI: train a DiffGFDN from a YAML config (reference: src/run_model.py).

Dispatch (run_model.py:39-84): ``ir_path`` set -> single-position fit;
``ambi_order`` set -> directional FDN; otherwise grid-of-receivers training.
"""

import argparse
import logging
import pickle
import shutil
from pathlib import Path

import numpy as np


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # replay unchanged XLA programs across runs
    parser = argparse.ArgumentParser(description="Train a TPU-native DiffGFDN")
    parser.add_argument("-c", "--config", required=True, help="YAML config path")
    parser.add_argument(
        "--wipe-train-dir", action="store_true",
        help="delete and recreate the training directory first",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="continue an interrupted grid-training run from the newest "
        "checkpoint (params + optimizer state)",
    )
    parser.add_argument(
        "--freq-parallel", choices=("auto", "on", "off"), default="auto",
        help="single-position fits: shard the rFFT bin axis over all "
        "visible devices (auto = on iff more than one device)",
    )
    parser.add_argument(
        "--profile-dir", default=None, metavar="DIR",
        help="capture a jax.profiler timeline of the whole run into DIR "
        "(view with TensorBoard/xprof)",
    )
    args = parser.parse_args(argv)
    if args.resume and args.wipe_train_dir:
        parser.error("--resume and --wipe-train-dir are mutually exclusive")

    logging.basicConfig(level=logging.INFO)
    from ..config import DiffGFDNConfig, load_and_validate_config

    config = load_and_validate_config(args.config, DiffGFDNConfig)
    np.random.seed(config.seed)

    train_dir = Path(config.trainer_config.train_dir)
    if args.wipe_train_dir and train_dir.exists():
        shutil.rmtree(train_dir)
    train_dir.mkdir(parents=True, exist_ok=True)
    with open(train_dir / "config_args.pickle", "wb") as f:
        pickle.dump(config.model_dump(mode="json"), f)

    import contextlib

    from ..utils.profiling import trace

    stack = contextlib.ExitStack()
    if args.profile_dir is not None:
        stack.enter_context(trace(args.profile_dir))

    with stack:
        _dispatch(config, args, parser)


def _dispatch(config, args, parser):
    from ..training.solver import (
        run_training_anisotropic_decay_var_receiver_pos,
        run_training_single_pos,
        run_training_var_receiver_pos,
    )

    if config.ir_path is not None:
        if args.resume:
            parser.error(
                "--resume is not supported for single-position fits "
                "(they train in seconds from scratch)"
            )
        if args.freq_parallel != "auto":
            config.trainer_config.use_freq_parallel = (
                args.freq_parallel == "on"
            )
        run_training_single_pos(config)
    elif config.ambi_order is not None:
        from ..data.spatial_dataset import SpatialThreeRoomDataset

        room_data = SpatialThreeRoomDataset(config.room_dataset_path)
        run_training_anisotropic_decay_var_receiver_pos(
            config, room_data, resume=args.resume
        )
    else:
        run_training_var_receiver_pos(config, export_irs=True, resume=args.resume)


if __name__ == "__main__":
    main()
