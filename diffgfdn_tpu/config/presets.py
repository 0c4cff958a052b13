"""Native preset library: the reference's tuned configurations as factories.

The reference ships ~50 tuned YAML presets under
``/root/reference/data/config/`` (omni full-band, 8-band subband,
directional per band x grid resolution, spatial-sampling per band,
single-RIR fits, synthetic-data studies). Rather than carrying static
files, this module tabulates the tuned values (seeds, per-band MLP depths,
loss weights, epochs — extracted from the reference presets, cited per
family below) and CONSTRUCTS validated config objects, so every preset is
schema-checked at build time and the whole library regenerates with
:func:`write_preset_library` into ``configs/``.

Dataset paths default to the reference's ``resources/`` layout — point
them at your own data with the ``dataset`` arguments.
"""

from pathlib import Path
from typing import Callable, Dict, Optional, Union

from .schema import (
    BeamformerType,
    CNNConfig,
    ColorlessFDNConfig,
    CouplingMatrixType,
    DecayFilterConfig,
    DiffGFDNConfig,
    DNNConfig,
    FeedbackLoopConfig,
    MLPConfig,
    MLPTuningConfig,
    OutputFilterConfig,
    SpatialSamplingConfig,
    SubbandProcessingConfig,
    TestSetConfig,
    TrainerConfig,
)

OCTAVE_BANDS = (63, 125, 250, 500, 1000, 2000, 4000, 8000)

_TREBLE = "resources/Georg_3room_FDTD"
_SYNTH = "resources/synthetic_dataset"


# --------------------------- flagship full-band ------------------------------
# reference: treble_data_grid_training_full_band_colorless_loss.yml


def fullband_grid(
    dataset: str = f"{_TREBLE}/srirs.pkl",
    out: str = "output/fullband_grid",
) -> DiffGFDNConfig:
    """Full-band omni grid training with SVF heads + colorless loss."""
    return DiffGFDNConfig(
        seed=235265,
        room_dataset_path=dataset,
        sample_rate=32000.0,
        num_delay_lines=12,
        decay_filter_config=DecayFilterConfig(use_absorption_filters=True),
        trainer_config=TrainerConfig(
            max_epochs=15,
            batch_size=32,
            save_true_irs=True,
            train_valid_split=0.8,
            hold_out_test_set=TestSetConfig(ratio=0.1),
            use_edc_mask=True,
            use_asym_spectral_loss=True,
            use_colorless_loss=True,
            num_freq_bins=131072,
            train_dir=f"{out}/",
            ir_dir=f"{out}/audio/",
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=True,
            num_hidden_layers=10,
            num_neurons_per_layer=64,
            num_fourier_features=20,
        ),
    )


# ------------------------- 8-band subband (treble) ---------------------------
# reference: run_subband_training_treble.py create_config (per-band MLP
# hyperparameters at :62-73); the CLI factory owns the tuned table


def subband_band(
    freq: float,
    dataset: str = f"{_TREBLE}/srirs_band_centre={{freq}}Hz.pkl",
    out: str = "output/subband",
) -> DiffGFDNConfig:
    """One octave band of the 8-band subband training."""
    from ..cli.run_subband_training import create_config

    return create_config(
        float(freq),
        dataset.replace("{freq}", f"{freq:.0f}"),
        out,
        num_freq_bins=131072,
        sample_rate=32000.0,
        max_epochs=20,
        batch_size=32,
    )


# --------------------------- directional per band ----------------------------
# reference: directional_fdn/treble_data_grid_training_{band}Hz_directional_
# fdn_grid_res={0.6,0.9}m.yml — tuned per-band seeds / MLP depths / epochs

_DIR_SEEDS = {
    0.6: {63: 123637, 125: 12335, 250: 23644, 500: 27359, 1000: 23649,
          2000: 25647, 4000: 23649, 8000: 26854},
    0.9: {63: 123637, 125: 12335, 250: 23644, 500: 27360, 1000: 23680,
          2000: 25647, 4000: 23645, 8000: 26854},
}
_DIR_LAYERS = {63: 5, 125: 5, 250: 5, 500: 10, 1000: 10, 2000: 10,
               4000: 10, 8000: 10}
_DIR_EPOCHS = {
    0.6: {f: 15 for f in OCTAVE_BANDS},
    0.9: {63: 15, 125: 15, 250: 15, 500: 20, 1000: 20, 2000: 20,
          4000: 15, 8000: 15},
}


def directional_band(
    freq: float,
    grid_resolution_m: float = 0.6,
    dataset: str = f"{_TREBLE}/srirs_spatial_band_centre={{freq}}Hz.pkl",
    out: str = "output/directional_fdn",
) -> DiffGFDNConfig:
    """Directional (SH-domain) FDN for one octave band + grid resolution."""
    f = int(freq)
    res = grid_resolution_m
    tag = f"band_{f}Hz/grid_resolution={res:.1f}m"
    return DiffGFDNConfig(
        seed=_DIR_SEEDS[res][f],
        room_dataset_path=dataset.replace("{freq}", str(f)),
        sample_rate=32000.0,
        ambi_order=2,
        decay_filter_config=DecayFilterConfig(
            use_absorption_filters=False,
            learn_common_decay_times=False,
            initialise_with_opt_values=True,
        ),
        feedback_loop_config=FeedbackLoopConfig(
            coupling_matrix_type=CouplingMatrixType.SCALAR
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False,
            num_hidden_layers=_DIR_LAYERS[f],
            num_neurons_per_layer=128,
            num_fourier_features=10 if f == 8000 else 20,
            beamformer_type=BeamformerType.MAX_DI,
            use_skip_connections=True,
        ),
        trainer_config=TrainerConfig(
            batch_size=32,
            edc_loss_weight=10,
            sparsity_loss_weight=2,
            io_lr=1e-3,
            max_epochs=_DIR_EPOCHS[res][f],
            num_freq_bins=131072,
            save_true_irs=True,
            grid_resolution_m=res,
            use_asym_spectral_loss=True,
            use_colorless_loss=True,
            use_edc_mask=True,
            subband_process_config=SubbandProcessingConfig(
                centre_frequency=float(f),
                frequency_range=(63.0, 8000.0),
                num_fraction_octaves=1,
                use_amp_preserving_filterbank=True,
            ),
            train_dir=f"{out}/{tag}/",
            ir_dir=f"{out}/{tag}/audio/",
        ),
    )


# ------------------------- spatial sampling per band -------------------------
# reference: spatial_sampling/treble_data_grid_training_{band}Hz_
# [directional_]spatial_sampling_test[_cnn].yml

_SPATIAL_OMNI = {  # band -> (layers, neurons, seed, epochs)
    63: (1, 8, 23526, 15), 125: (1, 16, 23644, 15), 250: (5, 16, 23759, 15),
    500: (10, 128, 24051, 15), 1000: (5, 16, 24521, 20),
    2000: (3, 128, 25500, 15), 4000: (3, 128, 27515, 15),
    8000: (3, 128, 31474, 15),
}
_SPATIAL_DIR = {  # band -> (layers, epochs); neurons 128, default seed
    63: (5, 20), 125: (5, 20), 250: (10, 20), 500: (12, 20), 1000: (12, 20),
    2000: (10, 15), 4000: (10, 20), 8000: (10, 20),
}


def spatial_band(
    freq: float,
    directional: bool = True,
    cnn: bool = False,
    dataset: Optional[str] = None,
    out: str = "output/spatial_sampling",
) -> SpatialSamplingConfig:
    """Common-slopes amplitude model for one octave band (MLP or CNN)."""
    f = int(freq)
    if dataset is None:
        stem = "srirs_spatial" if directional else "srirs"
        dataset = f"{_TREBLE}/{stem}_band_centre={f}Hz.pkl"
    kind = "directional" if directional else "omni"
    if cnn:
        assert directional, "the reference's CNN presets are directional"
        return SpatialSamplingConfig(
            room_dataset_path=dataset,
            seed=24051,
            batch_size=25,
            max_epochs=15,
            num_grid_spacing=3,
            use_directional_rirs=True,
            train_dir=f"{out}/band_{f}Hz_{kind}_cnn/",
            dnn_config=DNNConfig(
                num_fourier_features=10,
                cnn_config=CNNConfig(
                    num_layers=4, num_hidden_channels=32, kernel_size=(3, 3)
                ),
            ),
        )
    if directional:
        layers, epochs = _SPATIAL_DIR[f]
        return SpatialSamplingConfig(
            room_dataset_path=dataset,
            batch_size=50,
            max_epochs=epochs,
            num_grid_spacing=3,
            use_directional_rirs=True,
            train_dir=f"{out}/band_{f}Hz_{kind}/",
            dnn_config=DNNConfig(
                num_fourier_features=20,
                mlp_config=MLPConfig(
                    num_hidden_layers=layers, num_neurons_per_layer=128
                ),
            ),
        )
    layers, neurons, seed, epochs = _SPATIAL_OMNI[f]
    return SpatialSamplingConfig(
        room_dataset_path=dataset,
        seed=seed,
        batch_size=50,
        max_epochs=epochs,
        num_grid_spacing=10,
        use_directional_rirs=False,
        train_dir=f"{out}/band_{f}Hz_{kind}/",
        dnn_config=DNNConfig(
            num_fourier_features=20,
            mlp_config=MLPConfig(
                num_hidden_layers=layers, num_neurons_per_layer=neurons
            ),
        ),
    )


# ------------------------------ single-RIR fits ------------------------------
# reference: single_rir_fit_*.yml (two-stage decay / single room; colorless
# loss vs colorless prototype; broadband scalars vs full-band SVFs)


def single_rir_fit(
    variant: str = "two_stage_colorless_loss",
    dataset_root: str = _SYNTH,
    out: str = "output/single_rir",
) -> DiffGFDNConfig:
    """Single-RIR fit presets.

    Variants: ``two_stage_colorless_loss``, ``two_stage_colorless_proto``,
    ``single_room_colorless_loss``, ``single_room_colorless_proto``,
    ``two_stage_colorless_loss_pos2``, ``two_stage_colorless_proto_pos2``,
    ``freq_dep_colorless_loss`` (SVF output head, absorption filters).
    """
    single_room = "single_room" in variant
    freq_dep = "freq_dep" in variant
    proto = "proto" in variant
    pos2 = variant.endswith("pos2")
    room = (
        "single_room" if single_room
        else "two_coupled_rooms_freq_dep" if freq_dep
        else "two_coupled_rooms"
    )
    ir = {
        "single_room": "ir_(2.11, 6.06, 0.81).wav",
        "two_coupled_rooms": (
            "ir_(1.21, 2.92, 0.83).wav" if pos2 else "ir_(6.90, 2.70, 0.68).wav"
        ),
        "two_coupled_rooms_freq_dep": "ir_(2.41, 5.54, 1.10).wav",
    }[room]
    colorless = (
        ColorlessFDNConfig(
            use_colorless_prototype=True,
            batch_size=2000 if variant == "two_stage_colorless_proto" else 4000,
            max_epochs=5 if variant == "two_stage_colorless_proto" else 15,
        )
        if proto
        else ColorlessFDNConfig(use_colorless_prototype=False)
    )
    return DiffGFDNConfig(
        ir_path=f"audio/synthetic_true/{room}/{ir}",
        room_dataset_path=f"{dataset_root}/{room}/bb_wgn_0000.pkl",
        sample_rate=48000.0,
        num_delay_lines=8,
        num_groups=1 if single_room else 2,
        decay_filter_config=DecayFilterConfig(
            use_absorption_filters=freq_dep
        ),
        feedback_loop_config=FeedbackLoopConfig(
            coupling_matrix_type=CouplingMatrixType.SCALAR
        ),
        output_filter_config=OutputFilterConfig(use_svfs=freq_dep),
        colorless_fdn_config=colorless,
        trainer_config=TrainerConfig(
            max_epochs=20 if freq_dep else 50,
            io_lr=0.1,
            num_freq_bins=96000 if freq_dep else None,
            use_colorless_loss=not proto,
            use_edc_mask=pos2,
            train_dir=f"{out}/{variant}/",
            ir_dir=f"{out}/{variant}/audio/",
        ),
    )


SINGLE_RIR_VARIANTS = (
    "two_stage_colorless_loss",
    "two_stage_colorless_proto",
    "two_stage_colorless_loss_pos2",
    "two_stage_colorless_proto_pos2",
    "single_room_colorless_loss",
    "single_room_colorless_proto",
    "freq_dep_colorless_loss",
)


# ------------------------- synthetic-data grid studies -----------------------
# reference: synth_data_*.yml


def synth_grid(
    variant: str = "broadband",
    dataset_root: str = _SYNTH,
    out: str = "output/synth_grid",
) -> DiffGFDNConfig:
    """Two-coupled-room synthetic grid studies.

    Variants: ``broadband`` (scalar heads), ``broadband_colorless_loss``,
    ``broadband_colorless_proto``, ``multi_source_colorless_loss`` (input
    AND output heads), ``subband`` (SVF heads + absorption),
    ``subband_colorless_loss``, ``subband_single_room``,
    ``subband_hyp_tuning`` (optuna-style MLP sweep), ``low_rank_proto``.
    """
    subband = variant.startswith("subband")
    single_room = variant == "subband_single_room"
    multi_source = variant.startswith("multi_source")
    low_rank = variant == "low_rank_proto"
    room = (
        "single_room_freq_dep" if single_room
        else "two_coupled_rooms_freq_dep" if subband
        else "two_coupled_rooms_multi_source" if (multi_source or low_rank)
        else "two_coupled_rooms_more_data" if variant == "broadband"
        else "two_coupled_rooms"
    )
    proto = "proto" in variant
    colorless_cfg = (
        ColorlessFDNConfig(
            use_colorless_prototype=True, batch_size=4000, max_epochs=15,
            **({} if low_rank else {"lr": 0.01, "alpha": 1.0}),
        )
        if proto
        else ColorlessFDNConfig(use_colorless_prototype=False)
    )
    out_head = OutputFilterConfig(
        use_svfs=subband,
        num_hidden_layers=(
            7 if multi_source else 5 if variant == "subband_colorless_loss"
            else 3
        ),
        num_neurons_per_layer=32 if not multi_source else 128,
        mlp_tuning_config=(
            MLPTuningConfig(tune_hyperparameters=True)
            if variant == "subband_hyp_tuning" else None
        ),
    )
    return DiffGFDNConfig(
        room_dataset_path=f"{dataset_root}/{room}/bb_wgn_0000.pkl",
        sample_rate=48000.0,
        num_delay_lines=8,
        num_groups=1 if single_room else 2,
        decay_filter_config=DecayFilterConfig(use_absorption_filters=subband),
        feedback_loop_config=FeedbackLoopConfig(
            coupling_matrix_type=(
                CouplingMatrixType.RANDOM if single_room
                else CouplingMatrixType.SCALAR
            )
        ),
        output_filter_config=out_head,
        input_filter_config=(
            OutputFilterConfig(use_svfs=False, num_hidden_layers=7)
            if multi_source else None
        ),
        colorless_fdn_config=colorless_cfg,
        trainer_config=TrainerConfig(
            max_epochs=(
                10 if (proto or multi_source or single_room
                       or variant == "subband_colorless_loss") else 20
            ),
            batch_size=(
                100 if (variant == "broadband" or multi_source)
                else 1 if low_rank else 10
            ),
            train_valid_split=0.9,
            use_edc_mask="colorless_loss" in variant and not subband,
            use_colorless_loss="colorless_loss" in variant or multi_source,
            edr_loss_weight=0.0 if variant == "broadband_colorless_proto" else 1.0,
            num_freq_bins=(
                96000 if (subband or multi_source or low_rank) else None
            ),
            train_dir=f"{out}/{variant}/",
            ir_dir=f"{out}/{variant}/audio/",
        ),
    )


SYNTH_GRID_VARIANTS = (
    "broadband",
    "broadband_colorless_loss",
    "broadband_colorless_proto",
    "multi_source_colorless_loss",
    "subband",
    "subband_colorless_loss",
    "subband_single_room",
    "subband_hyp_tuning",
    "low_rank_proto",
)


# ------------------------------- the library ---------------------------------


def preset_library() -> Dict[str, Callable[[], Union[DiffGFDNConfig, SpatialSamplingConfig]]]:
    """name -> zero-arg factory for every production preset."""
    lib: Dict[str, Callable] = {
        "fullband_grid_colorless": fullband_grid,
    }
    for f in OCTAVE_BANDS:
        lib[f"subband_{f}Hz"] = (lambda f=f: subband_band(float(f)))
        for res in (0.6, 0.9):
            lib[f"directional_{f}Hz_res{res:.1f}m"] = (
                lambda f=f, res=res: directional_band(float(f), res)
            )
        lib[f"spatial_omni_{f}Hz"] = (
            lambda f=f: spatial_band(float(f), directional=False)
        )
        lib[f"spatial_directional_{f}Hz"] = (
            lambda f=f: spatial_band(float(f), directional=True)
        )
    lib["spatial_directional_1000Hz_cnn"] = (
        lambda: spatial_band(1000.0, directional=True, cnn=True)
    )
    for v in SINGLE_RIR_VARIANTS:
        lib[f"single_rir_{v}"] = (lambda v=v: single_rir_fit(v))
    for v in SYNTH_GRID_VARIANTS:
        lib[f"synth_{v}"] = (lambda v=v: synth_grid(v))
    return lib


def write_preset_library(dest: Union[str, Path]) -> Dict[str, Path]:
    """Materialize every preset as a validated YAML under ``dest``.

    Files are grouped by family subdirectory; each loads back through
    :func:`diffgfdn_tpu.config.load_and_validate_config` with the right
    schema (DiffGFDNConfig, or SpatialSamplingConfig for spatial_*).
    """
    from .loader import dump_config

    dest = Path(dest)
    paths: Dict[str, Path] = {}
    for name, factory in preset_library().items():
        cfg = factory()
        family = name.split("_")[0]
        sub = {
            "fullband": "fullband", "subband": "subband",
            "directional": "directional", "spatial": "spatial",
            "single": "single_rir", "synth": "synth",
        }[family]
        path = dest / sub / f"{name}.yml"
        path.parent.mkdir(parents=True, exist_ok=True)
        dump_config(cfg, path)
        paths[name] = path
    return paths
