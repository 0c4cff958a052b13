"""CLI: WASPAA25 baseline-comparison workflow.

Reproduces the reference's comparison studies
(notebooks/waspaa25/compare_against_barycentric_interpolation.ipynb,
convert_data_to_naf_compatible.ipynb; containers src/dataclass.py:8-59):

1. split a spatial SRIR grid by grid resolution (training subgrid vs
   held-out receivers);
2. train (or load) the common-slopes MLP per band and synthesize SRIRs at
   the held-out positions;
3. barycentrically interpolate SRIRs at the same positions from the
   training subgrid (the classical baseline);
4. compute per-direction EDC-error maps (mean |dB| Schroeder difference
   after the mixing time) for BOTH against the measured SRIRs, plot them
   over the floor plan, and write a JSON summary;
5. optionally export NAF-compatible train/infer pickles so the
   neural-acoustic-field baseline can train on exactly the same split.

Toy-scale example (runs in CI, tests/test_cli_and_analysis.py):

    python -m diffgfdn_tpu.cli.compare_baselines \
        --dataset srirs_spatial.pkl --grid-resolution 1.2 --out out/
"""

import argparse
import json
import logging
import pickle
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger("diffgfdn_tpu")


def edc_error_db(
    ref_rirs: np.ndarray,
    pred_rirs: np.ndarray,
    mixing_time_samps: int,
) -> np.ndarray:
    """Mean |dB| Schroeder-EDC difference per leading entry.

    ``ref_rirs``/``pred_rirs``: (..., T); the EDC is compared from the
    mixing time onwards (reference notebook's error metric).
    """
    from ..analysis import schroeder_edc
    from ..ops.basic import db_np

    n = min(ref_rirs.shape[-1], pred_rirs.shape[-1])
    ref = db_np(
        schroeder_edc(ref_rirs[..., mixing_time_samps:n]), is_squared=True
    )
    pred = db_np(
        schroeder_edc(pred_rirs[..., mixing_time_samps:n]), is_squared=True
    )
    return np.mean(np.abs(ref - pred), axis=-1)


def interpolate_srirs(
    train_positions: np.ndarray,
    train_srirs: np.ndarray,
    query_positions: np.ndarray,
):
    """Barycentric SRIR interpolation (multi-channel wrapper).

    ``train_srirs``: (M, C, T) ambisonic or (M, T) omni; returns the
    interpolated dataset with rirs of the same channel layout.
    """
    from ..data.naf import barycentric_interpolate

    srirs = np.asarray(train_srirs)
    omni = srirs.ndim == 2
    if omni:
        srirs = srirs[:, None, :]
    m, c, t = srirs.shape
    ds = barycentric_interpolate(
        train_positions, srirs.reshape(m, c * t), query_positions
    )
    ds.rirs = ds.rirs.reshape(len(query_positions), c, t)
    if omni:
        ds.rirs = ds.rirs[:, 0]
    return ds


def export_naf_dataset(
    room_data,
    train_idx: np.ndarray,
    valid_idx: np.ndarray,
    out_dir: Path,
    grid_resolution_m: float,
) -> Dict[str, Path]:
    """NAF-compatible train/infer pickles for the same split.

    Reference: notebooks/waspaa25/convert_data_to_naf_compatible.ipynb +
    src/dataclass.py NAFDatasetTrain/NAFDatasetInfer.
    """
    from ..data.naf import NAFDatasetInfer, NAFDatasetTrain

    meta = {
        "grid_resolution_m": grid_resolution_m,
        "band_centre_hz": np.atleast_1d(room_data.band_centre_hz).tolist(),
        "source_position": np.asarray(room_data.source_position).tolist(),
        "ambi_order": room_data.ambi_order,
    }
    train = NAFDatasetTrain(
        receiver_position=room_data.receiver_position[train_idx],
        rirs=room_data.rirs[train_idx],
        sample_rate=float(room_data.sample_rate),
        metadata=meta,
    )
    infer = NAFDatasetInfer(
        receiver_position=room_data.receiver_position[valid_idx],
        sample_rate=float(room_data.sample_rate),
        metadata=meta,
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = {}
    for name, obj in (("naf_train", train), ("naf_infer", infer)):
        p = out_dir / f"{name}_grid={grid_resolution_m:.1f}m.pkl"
        with open(p, "wb") as f:
            pickle.dump(obj, f)
        paths[name] = p
    return paths


def run_comparison(
    dataset_path: str,
    out_dir: str,
    grid_resolution_m: float,
    train_dir: Optional[str] = None,
    max_epochs: int = 10,
    mixing_time_ms: float = 20.0,
    export_naf: bool = True,
    mlp_layers: int = 3,
    mlp_neurons: int = 64,
    seed: int = 0,
) -> Dict:
    """Full comparison at any scale; returns the summary dict."""
    import matplotlib

    matplotlib.use("Agg")

    from ..config.schema import DNNConfig, MLPConfig, SpatialSamplingConfig
    from ..data.spatial_dataset import (
        SpatialThreeRoomDataset,
        split_by_grid_resolution,
    )
    from ..cli.convert_dataset import process_srirs_to_directional
    from ..inference.spatial_inference import get_soundfield_from_trained_model
    from ..ops.basic import ms_to_samps
    from ..training.spatial_trainer import run_training_spatial_sampling
    from ..utils.plot import plot_position_map

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    room = SpatialThreeRoomDataset(dataset_path)
    train_idx, valid_idx = split_by_grid_resolution(room, grid_resolution_m)
    logger.info(
        "grid split at %.1f m: %d train / %d held-out receivers",
        grid_resolution_m, len(train_idx), len(valid_idx),
    )
    valid_pos = room.receiver_position[valid_idx]
    mix = ms_to_samps(mixing_time_ms, room.sample_rate)
    directional = room.sph_directions is not None and room.rirs.ndim == 3

    # --- 2. the common-slopes model (train or load) ---
    cfg = SpatialSamplingConfig(
        room_dataset_path=str(dataset_path),
        batch_size=16,
        seed=seed,
        max_epochs=max_epochs,
        lr=5e-3,
        train_dir=train_dir or str(out / "cs_model"),
        use_directional_rirs=directional,
        dnn_config=DNNConfig(
            mlp_config=MLPConfig(
                num_hidden_layers=mlp_layers,
                num_neurons_per_layer=mlp_neurons,
            ),
            num_fourier_features=10,
        ),
    )
    try:
        model_srirs, _ = get_soundfield_from_trained_model(
            [cfg], room, valid_pos, room.rir_length,
            grid_resolution_m=grid_resolution_m, seed=seed,
        )
        logger.info("loaded trained CS model from %s", cfg.train_dir)
    except FileNotFoundError:
        logger.info("no checkpoint under %s — training", cfg.train_dir)
        run_training_spatial_sampling(
            cfg, room_data=room, grid_resolutions=[grid_resolution_m]
        )
        model_srirs, _ = get_soundfield_from_trained_model(
            [cfg], room, valid_pos, room.rir_length,
            grid_resolution_m=grid_resolution_m, seed=seed,
        )

    # --- 3. the barycentric baseline ---
    bary = interpolate_srirs(
        room.receiver_position[train_idx], room.rirs[train_idx], valid_pos
    )

    # --- 4. EDC-error maps against the measured SRIRs ---
    ref = room.rirs[valid_idx]
    if directional:
        to_dir = lambda srirs: process_srirs_to_directional(  # noqa: E731
            srirs, room.ambi_order, room.sph_directions
        )
        ref_d, model_d, bary_d = to_dir(ref), to_dir(model_srirs), to_dir(
            np.asarray(bary.rirs)
        )
    else:
        ref_d = ref[:, None, :]
        model_d = np.asarray(model_srirs)[:, None, :]
        bary_d = np.asarray(bary.rirs)[:, None, :]
    err = {
        "common_slopes_model": edc_error_db(ref_d, model_d, mix),
        "barycentric": edc_error_db(ref_d, bary_d, mix),
    }  # each (P, J)

    summary = {
        "grid_resolution_m": grid_resolution_m,
        "num_train": int(len(train_idx)),
        "num_heldout": int(len(valid_idx)),
    }
    for name, e in err.items():
        summary[f"{name}_mean_edc_error_db"] = float(np.mean(e))
        summary[f"{name}_per_direction_db"] = np.mean(e, axis=0).tolist()
        plot_position_map(
            valid_pos,
            np.mean(e, axis=-1),
            room.room_dims,
            room.room_start_coord,
            aperture_coords=room.aperture_coords,
            title=(
                f"{name}: mean EDC error "
                f"({np.mean(e):.2f} dB, grid {grid_resolution_m:.1f} m)"
            ),
            cbar_label="EDC error [dB]",
            save_path=str(out / f"edc_error_map_{name}.png"),
        )
    logger.info(
        "mean EDC error: CS model %.3f dB vs barycentric %.3f dB",
        summary["common_slopes_model_mean_edc_error_db"],
        summary["barycentric_mean_edc_error_db"],
    )

    # --- 5. NAF export ---
    if export_naf:
        paths = export_naf_dataset(
            room, train_idx, valid_idx, out, grid_resolution_m
        )
        summary["naf_exports"] = {k: str(v) for k, v in paths.items()}

    with open(out / "comparison_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv: Optional[List[str]] = None):
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # replay unchanged XLA programs across runs
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset", required=True, help="spatial SRIR pickle")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--grid-resolution", type=float, required=True)
    ap.add_argument("--train-dir", default=None,
                    help="existing CS-model train dir (else trains fresh)")
    ap.add_argument("--max-epochs", type=int, default=10)
    ap.add_argument("--mixing-time-ms", type=float, default=20.0)
    ap.add_argument("--mlp-layers", type=int, default=3)
    ap.add_argument("--mlp-neurons", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-naf-export", action="store_true")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    summary = run_comparison(
        args.dataset,
        args.out,
        args.grid_resolution,
        train_dir=args.train_dir,
        max_epochs=args.max_epochs,
        mixing_time_ms=args.mixing_time_ms,
        export_naf=not args.no_naf_export,
        mlp_layers=args.mlp_layers,
        mlp_neurons=args.mlp_neurons,
        seed=args.seed,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
