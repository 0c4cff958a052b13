"""Model construction from configs + dataset metadata.

Host-side factory: fits absorption filters (GEQ / Prony), resolves the
colorless warm start (matrix-log so the orthogonal parametrization starts at
the optimised matrices), and instantiates the right DiffGFDN variant.
Mirrors the wiring in the reference's solver.py:294-453 and model __init__s.
"""

import logging
import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
from scipy.linalg import logm

from ..config.schema import CouplingMatrixType, DiffGFDNConfig
from ..models import (
    ColorlessFDN,
    DiffDirectionalFDNVarReceiverPos,
    DiffGFDNSinglePos,
    DiffGFDNVarReceiverPos,
    DiffGFDNVarSourceReceiverPos,
)
from ..ops.absorption import (
    decay_times_to_gain_filters_geq,
    decay_times_to_gain_filters_prony,
    decay_times_to_gain_per_sample,
)

logger = logging.getLogger("diffgfdn_tpu")


@dataclass
class ColorlessFDNResults:
    """Optimised lossless-prototype parameters for one group.

    Matches the reference's result dataclass (colorless_fdn/utils.py:12-16)
    for pickle compatibility.
    """

    opt_input_gains: np.ndarray
    opt_output_gains: np.ndarray
    opt_feedback_matrix: np.ndarray


def skew_preimage(orthogonal: np.ndarray) -> np.ndarray:
    """X such that expm(skew(X)) == orthogonal (host-side matrix log).

    The skew pre-image keeps the optimised colorless feedback matrices exact
    under our skew-expm parametrization (the reference instead re-wraps them
    in ortho_param, feedback_loop.py:285-291).
    """
    s = np.real(logm(np.asarray(orthogonal, np.float64)))
    s = 0.5 * (s - s.T)  # project to exact skew-symmetry
    # our skew() uses only the strict upper triangle
    return np.triu(s, k=1).astype(np.float32)


def absorption_arrays(
    config: DiffGFDNConfig,
    common_decay_times: Optional[np.ndarray],
    band_centre_hz: Optional[np.ndarray],
    use_prony: bool = False,
):
    """Resolve absorption configuration -> FeedbackLoop kwargs.

    ``common_decay_times`` per dataset convention: (num_bands, num_groups)
    for filters, or (num_groups,) broadband.
    """
    delays = np.asarray(config.delay_length_samps)
    nper = len(delays) // config.num_groups
    dcfg = config.decay_filter_config
    kw = dict(
        gains=None,
        sos_coeffs=None,
        iir_coeffs=None,
        learn_common_decay_times=False,
        common_decay_times_init=None,
    )
    if common_decay_times is None or dcfg.learn_common_decay_times:
        kw["learn_common_decay_times"] = True
        if common_decay_times is not None and dcfg.initialise_with_opt_values:
            cdt = np.asarray(common_decay_times)
            if cdt.ndim == 2 and cdt.shape[0] > 1 and (
                cdt.shape[1] == config.num_groups
            ):
                # per-band (num_bands, num_groups): warm-start each group's
                # learnable T60 at its MEAN over bands (row 0 would pick
                # the 63 Hz band, typically the longest decay in the set)
                cdt = cdt.mean(axis=0)
            else:
                cdt = cdt.reshape(-1)[: config.num_groups]
            kw["common_decay_times_init"] = tuple(float(t) for t in cdt)
        return kw

    # preserve the band axis: np.squeeze collapsed (num_bands, 1) to 1-D
    # for single-group configs, skipping the filter branch and silently
    # using only the FIRST band's T60 as a broadband gain
    cdt = np.asarray(common_decay_times)
    if cdt.ndim == 2 and cdt.shape[0] > 1 and cdt.shape[1] == config.num_groups:
        pass  # (num_bands > 1, num_groups): keep the band axis even for G=1
    else:
        cdt = np.squeeze(cdt)
    if dcfg.use_absorption_filters and cdt.ndim == 2:
        # (num_bands, num_groups): per-band decay times -> GEQ (or Prony)
        fit = (
            decay_times_to_gain_filters_prony
            if use_prony
            else decay_times_to_gain_filters_geq
        )
        per_group = []
        for g in range(config.num_groups):
            group_delays = delays[g * nper : (g + 1) * nper]
            per_group.append(
                fit(band_centre_hz, cdt[:, g], group_delays, config.sample_rate)
            )
        coeffs = np.concatenate(per_group, axis=0)
        if use_prony:
            kw["iir_coeffs"] = coeffs
        else:
            kw["sos_coeffs"] = coeffs
    else:
        # broadband scalar gains per group
        cdt = np.atleast_1d(cdt).reshape(-1)[: config.num_groups]
        gains = []
        for g in range(config.num_groups):
            group_delays = delays[g * nper : (g + 1) * nper]
            gains.append(
                np.asarray(
                    decay_times_to_gain_per_sample(
                        float(cdt[g]), group_delays, config.sample_rate
                    )
                )
            )
        kw["gains"] = np.concatenate(gains)
    return kw


def colorless_to_init(
    colorless_params: List[ColorlessFDNResults],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(input_gains, output_gains, M_skew) stacked over groups."""
    b = np.concatenate(
        [np.asarray(p.opt_input_gains).reshape(-1) for p in colorless_params]
    )[:, None]
    c = np.concatenate(
        [np.asarray(p.opt_output_gains).reshape(-1) for p in colorless_params]
    )[:, None]
    m_skew = np.stack(
        [skew_preimage(p.opt_feedback_matrix) for p in colorless_params]
    )
    return b.astype(np.float32), c.astype(np.float32), m_skew


def load_colorless_fdn_params(
    config: DiffGFDNConfig, colorless_dir: Optional[str] = None
) -> List[ColorlessFDNResults]:
    """Load per-group colorless results pickles (colorless_fdn/utils.py:19-40)."""
    if colorless_dir is None:
        colorless_dir = str(Path(config.trainer_config.train_dir) / "colorless-fdn")
    out = []
    for k in range(config.num_groups):
        with open(
            Path(colorless_dir) / f"parameters_opt_group={k + 1}.pkl", "rb"
        ) as f:
            out.append(pickle.load(f))
    return out


def build_gfdn_model(
    config: DiffGFDNConfig,
    common_decay_times: Optional[np.ndarray] = None,
    band_centre_hz: Optional[np.ndarray] = None,
    colorless_params: Optional[List[ColorlessFDNResults]] = None,
    desired_directions: Optional[np.ndarray] = None,
    variant: str = "var_receiver",
    inference_solve: bool = False,
    devices=None,
    use_pallas_inverse: Optional[bool] = None,
):
    """Instantiate the configured DiffGFDN variant (not yet initialized).

    Kernel selection (the fused Pallas inverse) is resolved HERE, from the
    placement the caller declares: pass ``devices`` (the mesh/devices the
    model will run on) or force ``use_pallas_inverse`` directly. With
    neither, the process-default placement decides — correct exactly when
    the caller does not place work elsewhere (CLI/solver runs).
    """
    if use_pallas_inverse is None:
        from ..utils.placement import placement_is_tpu

        use_pallas_inverse = placement_is_tpu(devices)
    kw = absorption_arrays(config, common_decay_times, band_centre_hz)
    fixed_b = fixed_c = m_skew = None
    if colorless_params is not None:
        fixed_b, fixed_c, m_skew = colorless_to_init(colorless_params)

    fl_cfg = config.feedback_loop_config
    out_cfg = config.output_filter_config
    if (
        config.trainer_config.use_colorless_loss
        and CouplingMatrixType(fl_cfg.coupling_matrix_type)
        is CouplingMatrixType.RANDOM
    ):
        # sub_fdn_output needs the per-group skew mixers (feedback_loop.M);
        # an unstructured RANDOM matrix has no sub-FDN decomposition and
        # would AttributeError at trace time otherwise
        raise ValueError(
            "use_colorless_loss requires block-structured coupling "
            "(SCALAR/FILTER) — coupling_matrix_type=RANDOM has no per-group "
            "sub-FDNs to evaluate the colorless loss on"
        )
    common = dict(
        sample_rate=config.sample_rate,
        num_groups=config.num_groups,
        delays=tuple(config.delay_length_samps),
        coupling_matrix_type=fl_cfg.coupling_matrix_type,
        use_zero_coupling=fl_cfg.use_zero_coupling,
        coupling_matrix_order=fl_cfg.pu_matrix_order,
        colorless_feedback_matrix_skew=m_skew,
        fixed_input_gains=fixed_b,
        fixed_output_gains=fixed_c,
        use_colorless_loss=config.trainer_config.use_colorless_loss,
        inference_solve=inference_solve,
        use_pallas_inverse=use_pallas_inverse,
        **kw,
    )
    head = dict(
        num_fourier_features=out_cfg.num_fourier_features,
        num_hidden_layers=out_cfg.num_hidden_layers,
        num_neurons=out_cfg.num_neurons_per_layer,
    )
    if variant == "var_receiver":
        return DiffGFDNVarReceiverPos(
            use_svf_in_output=out_cfg.use_svfs,
            encoding_type=out_cfg.encoding_type,
            compress_pole_factor=out_cfg.compress_pole_factor,
            **head,
            **common,
        )
    if variant == "var_source_receiver":
        in_cfg = config.input_filter_config or out_cfg
        return DiffGFDNVarSourceReceiverPos(
            use_svf_in_output=out_cfg.use_svfs,
            use_svf_in_input=in_cfg.use_svfs,
            encoding_type=out_cfg.encoding_type,
            compress_pole_factor=out_cfg.compress_pole_factor,
            input_num_fourier_features=in_cfg.num_fourier_features,
            input_num_hidden_layers=in_cfg.num_hidden_layers,
            input_num_neurons=in_cfg.num_neurons_per_layer,
            **head,
            **common,
        )
    if variant == "single_pos":
        in_cfg = config.input_filter_config
        return DiffGFDNSinglePos(
            use_svf_in_output=out_cfg.use_svfs,
            use_svf_in_input=False if in_cfg is None else in_cfg.use_svfs,
            compress_pole_factor=out_cfg.compress_pole_factor,
            **common,
        )
    if variant == "directional":
        from ..models.spatial import build_analysis_matrix

        analysis = build_analysis_matrix(
            config.ambi_order, desired_directions, out_cfg.beamformer_type
        )
        return DiffDirectionalFDNVarReceiverPos(
            ambi_order=config.ambi_order,
            use_skip_connections=out_cfg.use_skip_connections,
            analysis_matrix=analysis,
            **head,
            **common,
        )
    raise ValueError(f"unknown variant {variant}")


def build_colorless_fdn(config: DiffGFDNConfig, group_idx: int) -> ColorlessFDN:
    """Lossless prototype FDN over one group's delay lines."""
    delays = np.asarray(config.delay_length_samps)
    nper = len(delays) // config.num_groups
    group_delays = tuple(
        int(d) for d in delays[group_idx * nper : (group_idx + 1) * nper]
    )
    return ColorlessFDN(sample_rate=config.sample_rate, delays=group_delays)
