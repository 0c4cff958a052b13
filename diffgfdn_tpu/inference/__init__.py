from .cs_synthesis import (
    calculate_energy_envelope,
    convert_directional_rirs_to_ambisonics,
    get_rirs_from_common_slopes_model,
    shaped_wgn_multiband,
    spatial_bandlimiting,
)
from .gfdn_inference import (
    infer_all_octave_bands,
    InferDiffGFDN,
    make_rir_synthesis_fn,
    make_time_domain_synthesis_fn,
    merge_subband_rirs,
    subband_energy_compensation,
)
from .rendering import (
    add_direct_and_early_path,
    BinauralDynamicRendering,
    DynamicRenderingMovingReceiver,
    fade_windows,
    integrated_loudness,
    normalise_loudness,
)
from .sofa import convert_srir_to_brir, HRIRSOFAReader, SRIRSOFAWriter
from .spatial_inference import (
    get_ambisonic_rirs,
    get_output_from_trained_model,
    get_soundfield_from_trained_model,
)

__all__ = [
    "BinauralDynamicRendering",
    "DynamicRenderingMovingReceiver",
    "HRIRSOFAReader",
    "InferDiffGFDN",
    "SRIRSOFAWriter",
    "add_direct_and_early_path",
    "calculate_energy_envelope",
    "convert_directional_rirs_to_ambisonics",
    "convert_srir_to_brir",
    "fade_windows",
    "get_ambisonic_rirs",
    "get_output_from_trained_model",
    "get_rirs_from_common_slopes_model",
    "get_soundfield_from_trained_model",
    "infer_all_octave_bands",
    "integrated_loudness",
    "make_rir_synthesis_fn",
    "make_time_domain_synthesis_fn",
    "merge_subband_rirs",
    "normalise_loudness",
    "shaped_wgn_multiband",
    "spatial_bandlimiting",
    "subband_energy_compensation",
]
