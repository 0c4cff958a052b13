"""Training entry points ("solvers") for each model flavour.

Reference behaviour: solver.py:205-657 — dataset parsing, optional
colorless pre-training per group, model build, trainer run, result export.
"""

import logging
import pickle
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..config.schema import DiffGFDNConfig
from ..data.batching import (
    arrays_from_room_dataset,
    fixed_test_split,
    init_example_batch,
    iterate_batches,
    train_valid_split,
)
from ..data.room_dataset import RIRData, RoomDataset, ThreeRoomDataset
from ..losses.spatial import make_decay_envelopes
from ..ops.basic import ms_to_samps
from ..ops.filterbanks import subband_filter_response
from ..utils.cio import init_with_batch
from .build import (
    build_colorless_fdn,
    build_gfdn_model,
    ColorlessFDNResults,
    load_colorless_fdn_params,
)
from .colorless_trainer import ColorlessFDNTrainer
from .save_results import (
    save_colorless_fdn_parameters,
    save_diff_gfdn_parameters,
    save_loss,
)
from .trainer import DirectionalGFDNTrainer, GFDNTrainer, SinglePosGFDNTrainer

logger = logging.getLogger("diffgfdn_tpu")


def check_sample_rate(config: DiffGFDNConfig, dataset) -> None:
    """Fail fast on a config/dataset sample-rate mismatch.

    A mismatch silently corrupts every downstream quantity (delay lengths,
    mixing-time/EDC windows — which can exceed the spectrum length and turn
    the losses NaN, subband filter grids), so it is a configuration error.
    """
    ds_fs = getattr(dataset, "sample_rate", None)
    if ds_fs is not None and float(ds_fs) != float(config.sample_rate):
        raise ValueError(
            f"config.sample_rate={config.sample_rate:g} Hz but the dataset "
            f"is sampled at {ds_fs:g} Hz — set sample_rate to match the "
            "dataset (delay lengths, EDC windows and subband grids all "
            "derive from it)"
        )


def _subband_resp(
    config: DiffGFDNConfig, num_freq_bins: Optional[int] = None
) -> Optional[np.ndarray]:
    """In-loss subband filter response on the TRAINING z grid.

    ``num_freq_bins``: override for datasets whose rfft grid is derived
    from the data (SpatialRoomDataset has no nfft override, so the config
    value can disagree with the actual z length — the response must match
    the grid the loss evaluates on).
    """
    sb = config.trainer_config.subband_process_config
    if sb is None:
        return None
    return subband_filter_response(
        sb.centre_frequency,
        sb.frequency_range,
        sb.num_fraction_octaves,
        config.sample_rate,
        num_freq_bins or config.trainer_config.num_freq_bins,
        use_amp_preserving=sb.use_amp_preserving_filterbank,
    )


def _steps_per_epoch(num_train: int, batch_size: int) -> int:
    """Match fit_indexed's padded_batches count: ceil(n / min(bs, n)).

    A floored, unclamped count skews the StepLR epoch stride (early decay)
    and resume's count offset.
    """
    n = max(1, num_train)
    bs = min(batch_size, n)
    return -(-n // bs)


def run_training_colorless_fdn(
    config: DiffGFDNConfig, num_freq_samples: int
) -> List[ColorlessFDNResults]:
    """Train (or load cached) colorless prototypes, one per group.

    Reference: solver.py:205-288 — skips groups whose optimised pickle
    already exists in {train_dir}/colorless-fdn/.
    """
    colorless_dir = Path(config.trainer_config.train_dir) / "colorless-fdn"
    results: List[ColorlessFDNResults] = []
    for g in range(config.num_groups):
        cached = colorless_dir / f"parameters_opt_group={g + 1}.pkl"
        if cached.exists():
            with open(cached, "rb") as f:
                results.append(pickle.load(f))
            continue
        model = build_colorless_fdn(config, g)
        trainer = ColorlessFDNTrainer(
            model,
            config.colorless_fdn_config,
            str(colorless_dir / f"group{g}"),
            use_asym_loss=config.trainer_config.use_asym_spectral_loss,
        )
        params = trainer.init_params(seed=config.seed + g)
        params = trainer.fit(params, num_freq_samples, seed=config.seed + g)
        results.append(
            save_colorless_fdn_parameters(model, params, colorless_dir, g)
        )
    return results


def _make_batch_fns(arrays, train_idx, valid_idx, batch_size, seed):
    batch_size = min(batch_size, max(1, len(train_idx)))

    def train_batches(epoch):
        return iterate_batches(
            arrays, train_idx, batch_size, shuffle=True, seed=seed + epoch
        )

    def valid_batches():
        return iterate_batches(
            arrays,
            valid_idx,
            min(batch_size, max(1, len(valid_idx))),
            shuffle=False,
        )

    return train_batches, valid_batches


def run_training_var_receiver_pos(
    config: DiffGFDNConfig,
    room_data: Optional[RoomDataset] = None,
    export_irs: bool = False,
    resume: bool = False,
) -> Tuple[GFDNTrainer, Dict]:
    """Grid-of-receivers training (the flagship path; solver.py:294-453).

    ``resume=True`` continues an interrupted run from the newest
    checkpoint in the training directory (params + optimizer state).
    """
    if room_data is None:
        room_data = ThreeRoomDataset(
            config.room_dataset_path, nfft=config.trainer_config.num_freq_bins
        )
    check_sample_rate(config, room_data)

    colorless_params = None
    if config.colorless_fdn_config.use_colorless_prototype:
        if config.colorless_fdn_config.load_fixed_parameters:
            colorless_params = load_colorless_fdn_params(
                config, config.colorless_fdn_config.saved_param_path
            )
        else:
            colorless_params = run_training_colorless_fdn(
                config, room_data.num_freq_bins // 16
            )

    # optional MLP architecture search (reference: solver.py:361-384 runs
    # an optuna TPE study; hypertuning.py implements TPE natively, with
    # random/optuna samplers selectable and configurable trial budgets)
    tuning = config.output_filter_config.mlp_tuning_config
    if tuning is not None and tuning.tune_hyperparameters:
        from .hypertuning import mlp_hyperparameter_tuning

        def _trial(cand: DiffGFDNConfig) -> float:
            trial_cfg = cand.model_copy(deep=True)
            trial_cfg.output_filter_config.mlp_tuning_config = None
            # trial_epochs=None trains the full budget per trial
            # (the reference's optuna study does; solver.py:361-384)
            if tuning.trial_epochs is not None:
                trial_cfg.trainer_config.max_epochs = min(
                    tuning.trial_epochs, config.trainer_config.max_epochs
                )
            trial_cfg.trainer_config.train_dir = str(
                Path(config.trainer_config.train_dir) / "tuning"
            )
            trial_trainer, _ = run_training_var_receiver_pos(
                trial_cfg, room_data=room_data
            )
            return (
                trial_trainer.valid_loss[-1]
                if trial_trainer.valid_loss
                else trial_trainer.train_loss[-1]
            )

        config, _ = mlp_hyperparameter_tuning(
            config, _trial, num_trials=tuning.num_trials, seed=config.seed
        )
        config.output_filter_config.mlp_tuning_config = None

    model = build_gfdn_model(
        config,
        common_decay_times=room_data.common_decay_times,
        band_centre_hz=room_data.band_centre_hz,
        colorless_params=colorless_params,
        variant="var_receiver",
    )

    tc = config.trainer_config
    arrays = arrays_from_room_dataset(
        room_data,
        new_sampling_radius=(
            None if tc.reduced_pole_radius == 1.0 else 1.0 / tc.reduced_pole_radius
        ),
    )
    indices = np.arange(arrays.num_items)
    if tc.hold_out_test_set is not None:
        _, indices = fixed_test_split(
            arrays.num_items,
            tc.hold_out_test_set.ratio,
            tc.hold_out_test_set.seed,
        )
    train_idx, valid_idx = train_valid_split(
        indices, tc.train_valid_split, seed=config.seed
    )
    train_batches, valid_batches = _make_batch_fns(
        arrays, train_idx, valid_idx, tc.batch_size, config.seed
    )

    trainer = GFDNTrainer(
        model,
        tc,
        steps_per_epoch=_steps_per_epoch(len(train_idx), tc.batch_size),
        common_decay_times=room_data.common_decay_times,
        subband_filter_resp=_subband_resp(config),
        sample_rate=config.sample_rate,
    )
    # phase timings at info level: production observability for the
    # end-to-end wallclock decomposition (parse/features/fit/export)
    _t = time.time()
    trainer.precompute_target_features(arrays)
    logger.info("target features: %.1fs", time.time() - _t)
    _t = time.time()
    # zero-target init example: bit-identical parameters without
    # materializing the lazy host-side target spectra (see
    # init_example_batch)
    example = init_example_batch(arrays, tc.batch_size)
    params = init_with_batch(model, jax.random.PRNGKey(config.seed), example)
    logger.info("init: %.1fs", time.time() - _t)
    # device-resident data path: upload once, gather batches on device
    _t = time.time()
    params = trainer.fit_indexed(
        params, arrays, train_idx, valid_idx, seed=config.seed, resume=resume
    )
    logger.info("fit_indexed total: %.1fs", time.time() - _t)

    _t = time.time()
    save_diff_gfdn_parameters(model, params, tc.train_dir)
    save_loss(trainer.train_loss, trainer.valid_loss, tc.train_dir)
    logger.info("export: %.1fs", time.time() - _t)
    if export_irs:
        trainer.save_irs(params, train_batches(0), tc.ir_dir)
        trainer.save_irs(params, valid_batches(), tc.ir_dir,
                         filename_prefix="valid_ir")
        if tc.save_true_irs:
            _save_true_irs(room_data, indices, tc.ir_dir)
    return trainer, params


def _save_true_irs(room_data, rec_indices, ir_dir) -> None:
    """Ground-truth RIR wavs alongside the synthesized ones
    (TrainerConfig.save_true_irs; the reference dumps both for A/B
    listening, trainer.py:503-564)."""
    import os

    from ..data.audio import write_wav

    os.makedirs(ir_dir, exist_ok=True)
    for i in np.asarray(rec_indices):
        pos = room_data.receiver_position[i]
        rir = np.asarray(room_data.rirs[i], np.float32)
        peak = np.max(np.abs(rir)) + 1e-12
        name = f"true_ir_({pos[0]:.2f}, {pos[1]:.2f}, {pos[2]:.2f}).wav"
        write_wav(os.path.join(ir_dir, name), rir / peak, room_data.sample_rate)


def parse_position_from_filename(path) -> Optional[np.ndarray]:
    """Extract "(x, y, z)" receiver coordinates from an IR filename.

    The reference encodes positions in wav names like ``ir_(1.74, 4.50,
    1.50).wav`` (solver.py:125-198 parses them back the same way).
    """
    import re

    m = re.search(
        r"\(\s*(-?[\d.]+),\s*(-?[\d.]+),\s*(-?[\d.]+)\s*\)", str(path)
    )
    if m is None:
        return None
    return np.array([float(g) for g in m.groups()], np.float32)


def _resolve_freq_mesh(config: DiffGFDNConfig, devices=None):
    """Mesh for frequency-axis sharding of single-pos fits, or None.

    ``use_freq_parallel``: None = auto (shard iff >1 device visible),
    True = require (warn + fall back unsharded on one device), False = off.
    Resolution is host-side at solver time — the placement contract
    (utils/placement.py): the caller's devices decide, never
    ``jax.default_backend()``.
    """
    use = config.trainer_config.use_freq_parallel
    if use is False:
        return None
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) <= 1:
        if use:
            logger.warning(
                "use_freq_parallel=true but only one device is visible; "
                "training unsharded"
            )
        return None
    from ..parallel.mesh import make_mesh

    logger.info(
        "single-pos fit: sharding the rFFT bin axis over %d devices",
        len(devs),
    )
    return make_mesh(1, devices=devs)


def run_training_single_pos(
    config: DiffGFDNConfig,
    rir_data: Optional[RIRData] = None,
    devices=None,
) -> Tuple[SinglePosGFDNTrainer, Dict]:
    """Single-RIR fit: whole-spectrum batches (solver.py:459-552).

    ``devices``: the devices to run on (default: all visible). With more
    than one, the 65k-bin frequency axis shards across them
    (``trainer_config.use_freq_parallel``, default auto).
    """
    if rir_data is None:
        rir_data = RIRData.from_wav(
            config.ir_path,
            common_decay_times=np.array([0.5] * config.num_groups),
            nfft=config.trainer_config.num_freq_bins,
        )

    check_sample_rate(config, rir_data)
    colorless_params = None
    if config.colorless_fdn_config.use_colorless_prototype:
        colorless_params = run_training_colorless_fdn(
            config, rir_data.num_freq_bins // 16
        )

    freq_mesh = _resolve_freq_mesh(config, devices)
    mesh_devices = (
        list(freq_mesh.devices.flat) if freq_mesh is not None else devices
    )
    model = build_gfdn_model(
        config,
        common_decay_times=rir_data.common_decay_times,
        band_centre_hz=rir_data.band_centre_hz,
        colorless_params=colorless_params,
        variant="single_pos",
        devices=mesh_devices,
    )
    tc = config.trainer_config
    radius = 1.0 if tc.reduced_pole_radius == 1.0 else 1.0 / tc.reduced_pole_radius
    z = (radius * np.exp(1j * rir_data.freq_bins_rad)).astype(np.complex64)
    early, late = rir_data.split_responses()
    pos = None
    if config.ir_path is not None:
        pos = parse_position_from_filename(config.ir_path)
    pos = np.zeros(3, np.float32) if pos is None else pos
    batch = {
        "z_values": z,
        "listener_position": pos[None, :],
        "norm_listener_position": np.zeros((1, 3), np.float32),
        "target_early_response": early.astype(np.complex64),
        "target_late_response": late.astype(np.complex64),
        "target_rir_response": rir_data.rir_mag_response.astype(np.complex64),
    }

    def train_batches(epoch):
        yield batch

    trainer = SinglePosGFDNTrainer(
        model,
        tc,
        steps_per_epoch=1,
        common_decay_times=rir_data.common_decay_times,
        subband_filter_resp=_subband_resp(config),
        sample_rate=config.sample_rate,
        freq_mesh=freq_mesh,
    )
    params = init_with_batch(model, jax.random.PRNGKey(config.seed), batch)
    params = trainer.fit(params, train_batches, seed=config.seed)
    save_diff_gfdn_parameters(model, params, tc.train_dir)
    save_loss(trainer.train_loss, None, tc.train_dir)
    return trainer, params


def run_training_anisotropic_decay_var_receiver_pos(
    config: DiffGFDNConfig,
    room_data,  # SpatialRoomDataset
    resume: bool = False,
) -> Tuple[DirectionalGFDNTrainer, Dict]:
    """Directional FDN over a receiver grid (solver.py:558-657).

    ``resume=True`` continues from the newest checkpoint (params +
    optimizer state) in the training directory.
    """
    from ..data.spatial_dataset import arrays_from_spatial_dataset

    check_sample_rate(config, room_data)
    colorless_params = None
    if config.colorless_fdn_config.use_colorless_prototype:
        if config.colorless_fdn_config.load_fixed_parameters:
            colorless_params = load_colorless_fdn_params(
                config, config.colorless_fdn_config.saved_param_path
            )
        else:
            colorless_params = run_training_colorless_fdn(
                config, room_data.num_freq_bins // 16
            )

    model = build_gfdn_model(
        config,
        common_decay_times=room_data.common_decay_times,
        band_centre_hz=room_data.band_centre_hz,
        colorless_params=colorless_params,
        desired_directions=room_data.desired_directions,
        variant="directional",
    )
    tc = config.trainer_config
    arrays = arrays_from_spatial_dataset(
        room_data,
        new_sampling_radius=(
            None if tc.reduced_pole_radius == 1.0 else 1.0 / tc.reduced_pole_radius
        ),
    )
    indices = np.arange(arrays.num_items)
    if tc.grid_resolution_m is not None:
        from ..data.spatial_dataset import split_by_grid_resolution

        train_idx, valid_idx = split_by_grid_resolution(
            room_data, tc.grid_resolution_m
        )
    else:
        train_idx, valid_idx = train_valid_split(
            indices, tc.train_valid_split, seed=config.seed
        )
    train_batches, valid_batches = _make_batch_fns(
        arrays, train_idx, valid_idx, tc.batch_size, config.seed
    )

    envelopes = make_decay_envelopes(
        np.asarray(room_data.common_decay_times).reshape(-1)[: config.num_groups],
        ms_to_samps(
            float(np.max(room_data.common_decay_times)) * 1e3, config.sample_rate
        ),
        config.sample_rate,
    )
    trainer = DirectionalGFDNTrainer(
        model,
        tc,
        steps_per_epoch=_steps_per_epoch(len(train_idx), tc.batch_size),
        common_decay_times=room_data.common_decay_times,
        subband_filter_resp=_subband_resp(config, room_data.num_freq_bins),
        sample_rate=config.sample_rate,
        directional_envelopes=np.asarray(envelopes),
    )
    example = next(iter(train_batches(0)))
    params = init_with_batch(model, jax.random.PRNGKey(config.seed), example)
    params = trainer.fit_indexed(
        params, arrays, train_idx, valid_idx, seed=config.seed, resume=resume
    )
    save_diff_gfdn_parameters(model, params, tc.train_dir)
    save_loss(trainer.train_loss, trainer.valid_loss, tc.train_dir)
    return trainer, params

