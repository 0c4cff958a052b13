"""Trained-model spatial inference: CS-DNN checkpoints -> SRIRs.

Reference behaviour: spatial_sampling/inference.py:30-118, 297-494 —
per-band checkpoints produce CS amplitudes at the query positions; shaped
noise synthesizes the tails; the directional set converts to ambisonics.
"""

import copy
import logging
import pickle
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..config.schema import SpatialSamplingConfig
from ..data.spatial_dataset import SpatialRoomDataset
from ..training.checkpoints import load_latest_checkpoint
from ..training.spatial_trainer import (
    build_spatial_model,
    SpatialSamplingTrainer,
)
from .cs_synthesis import get_rirs_from_common_slopes_model

logger = logging.getLogger("diffgfdn_tpu")


def get_output_from_trained_model(
    config: SpatialSamplingConfig,
    room_data: SpatialRoomDataset,
    rec_pos_list: np.ndarray,
    grid_resolution_m: Optional[float] = None,
) -> np.ndarray:
    """CS amplitudes at the query positions from a trained checkpoint.

    Returns (num_pos, num_slopes) omni or (num_pos, J, num_slopes)
    directional (reference: spatial_sampling/inference.py:393-494).
    """
    model = build_spatial_model(config, room_data.num_rooms, room_data.ambi_order)
    ckpt_dir = Path(config.train_dir)
    if grid_resolution_m is not None:
        ckpt_dir = ckpt_dir / f"grid_resolution={grid_resolution_m:.1f}"
    params = load_latest_checkpoint(str(ckpt_dir), config.max_epochs)
    if params is None:
        raise FileNotFoundError(f"Trained model does not exist under {ckpt_dir}")

    trainer = SpatialSamplingTrainer(
        model, config, room_data, use_edc_loss=False,
        grid_resolution_m=grid_resolution_m,
    )

    from ..config.schema import DNNType

    if config.network_type == DNNType.CNN:
        # the CNN predicts on the full 2-D floor-plan grid: run it once
        # and nearest-sample the grid cells at the query positions
        # (an MLP-style batch would KeyError on 'mesh_2d')
        from ..training.spatial_trainer import make_cnn_batch

        batch = make_cnn_batch(room_data)
        grid_amps = trainer.predict_amplitudes(params, batch)
        cells = batch["mesh_2d_raw"].reshape(-1, 2)  # (H*W, 2)
        q = np.asarray(rec_pos_list, np.float32)[:, :2]
        nearest = np.argmin(
            np.linalg.norm(cells[None, :, :] - q[:, None, :], axis=-1), axis=1
        )
        return np.asarray(grid_amps)[nearest]  # leading axis is H*W cells

    # normalized coords relative to the ORIGINAL grid extents
    lo = room_data.receiver_position.min(axis=0)
    hi = room_data.receiver_position.max(axis=0)
    norm = (np.asarray(rec_pos_list) - lo) / (hi - lo + 1e-12)
    batch = {
        "listener_position": np.asarray(rec_pos_list, np.float32),
        "norm_listener_position": norm.astype(np.float32),
        "target_common_slope_amps": np.zeros(
            (len(rec_pos_list),) + room_data.amplitudes.shape[1:], np.float32
        ),
    }
    return trainer.predict_amplitudes(params, batch)


def get_soundfield_from_trained_model(
    configs: List[SpatialSamplingConfig],
    room_data: SpatialRoomDataset,
    rec_pos_list: np.ndarray,
    ir_len_samps: int,
    grid_resolution_m: Optional[float] = None,
    apply_spatial_bandlimiting: bool = False,
    seed: int = 0,
):
    """All-band inference -> SRIRs + learned amplitudes.

    One config per octave band; returns (rirs, amplitudes) with rirs of
    shape (num_pos, (N+1)^2, T) directional or (num_pos, T) omni and
    amplitudes (num_pos, [J,] num_slopes, num_bands)
    (reference: spatial_sampling/inference.py:297-390).
    """
    freq_bands = list(np.atleast_1d(room_data.band_centre_hz))
    assert len(freq_bands) == len(configs), (
        "one config per frequency band required"
    )
    amps = []
    for cfg in configs:
        amps.append(
            get_output_from_trained_model(
                cfg, room_data, rec_pos_list, grid_resolution_m
            )
        )
    amplitudes = np.stack(amps, axis=-1)  # (..., num_bands)

    cdt = np.asarray(room_data.common_decay_times)
    # directional iff the trained heads emit per-direction amplitudes
    # (an omni model trained on a directional dataset yields (P, G, bands))
    is_directional = (
        amplitudes.ndim == 4 and room_data.sph_directions is not None
    )
    rirs = get_rirs_from_common_slopes_model(
        room_data.sample_rate,
        np.asarray(rec_pos_list),
        freq_bands,
        ir_len_samps,
        amplitudes,
        cdt,
        ambi_order=room_data.ambi_order if is_directional else None,
        des_directions=room_data.sph_directions if is_directional else None,
        beamformer_type=configs[0].dnn_config.beamformer_type,
        apply_spatial_bandlimiting=apply_spatial_bandlimiting,
        seed=seed,
    )
    return rirs, amplitudes


def get_ambisonic_rirs(
    rec_pos_list: np.ndarray,
    full_band_room_data: SpatialRoomDataset,
    use_trained_model: bool = False,
    configs: Optional[List[SpatialSamplingConfig]] = None,
    grid_resolution_m: Optional[float] = None,
    output_pkl_path: Optional[str] = None,
    apply_spatial_bandlimiting: bool = False,
    max_ir_len_ms: float = 2000.0,
    seed: int = 0,
) -> SpatialRoomDataset:
    """Synthesize ambisonic RIRs at the query positions (CS model).

    Either from a trained per-band DNN stack or directly from the dataset's
    stored amplitudes (reference: spatial_sampling/inference.py:30-118).
    Returns a copy of the dataset with positions/RIRs replaced.
    """
    cs_room = copy.deepcopy(full_band_room_data)
    ir_len = min(
        full_band_room_data.rir_length,
        int(max_ir_len_ms * 1e-3 * cs_room.sample_rate),
    )
    if use_trained_model:
        cs_room.update_receiver_pos(np.asarray(rec_pos_list))
        rirs, _ = get_soundfield_from_trained_model(
            configs,
            full_band_room_data,
            rec_pos_list,
            ir_len,
            grid_resolution_m,
            apply_spatial_bandlimiting=apply_spatial_bandlimiting,
            seed=seed,
        )
    else:
        idx = full_band_room_data.find_rec_idx(np.asarray(rec_pos_list))
        amps = full_band_room_data.amplitudes[idx]
        # directional iff the dataset carries directions (ambi_order alone
        # is set even for omni pickles); shape to (P, J, S, B) directional
        # or (P, S, B) omni
        is_directional = full_band_room_data.sph_directions is not None
        want_ndim = 4 if is_directional else 3
        if amps.ndim == want_ndim - 1:
            amps = amps[..., None]  # add the band axis
        if amps.ndim != want_ndim:
            raise ValueError(
                f"amplitudes shape {amps.shape} inconsistent with "
                f"{'directional' if is_directional else 'omni'} dataset"
            )
        freq_bands = list(np.atleast_1d(full_band_room_data.band_centre_hz))
        cdt = np.asarray(full_band_room_data.common_decay_times)
        rirs = get_rirs_from_common_slopes_model(
            cs_room.sample_rate,
            np.asarray(rec_pos_list),
            freq_bands,
            ir_len,
            amps,
            cdt,
            ambi_order=cs_room.ambi_order if is_directional else None,
            des_directions=cs_room.sph_directions,
            beamformer_type=None,
            apply_spatial_bandlimiting=apply_spatial_bandlimiting,
            seed=seed,
        )
        cs_room.update_receiver_pos(np.asarray(rec_pos_list))
    cs_room.update_rirs(rirs)
    if output_pkl_path is not None:
        with open(output_pkl_path, "wb") as f:
            pickle.dump(cs_room, f)
    return cs_room
