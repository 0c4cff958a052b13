from .colorless import ColorlessFDN
from .dnn import (
    ConvNet,
    MLP,
    MLPSkipConnections,
    one_hot_mesh_encoding,
    scaled_sigmoid,
    scaled_softplus,
    sigmoid,
    SinusoidalEncoding,
    softplus,
    tan_sigmoid,
)
from .feedback_loop import FeedbackLoop
from .gain_heads import (
    expand_groups_to_delay_lines,
    GainsFromMLP,
    svf_cutoff_frequencies,
    svf_params_to_response,
    SVFFromMLP,
)
from .gfdn import (
    DiffDirectionalFDNVarReceiverPos,
    DiffGFDN,
    DiffGFDNSinglePos,
    DiffGFDNVarReceiverPos,
    DiffGFDNVarSourceReceiverPos,
)
from .spatial import (
    build_analysis_matrix,
    directional_amplitudes,
    DirectionalBeamformerWeightsCNN,
    DirectionalBeamformerWeightsMLP,
    normalise_weights,
    OmniAmplitudesMLP,
)

__all__ = [
    "ColorlessFDN",
    "ConvNet",
    "DiffDirectionalFDNVarReceiverPos",
    "DiffGFDN",
    "DiffGFDNSinglePos",
    "DiffGFDNVarReceiverPos",
    "DiffGFDNVarSourceReceiverPos",
    "DirectionalBeamformerWeightsCNN",
    "DirectionalBeamformerWeightsMLP",
    "FeedbackLoop",
    "GainsFromMLP",
    "MLP",
    "MLPSkipConnections",
    "OmniAmplitudesMLP",
    "SVFFromMLP",
    "SinusoidalEncoding",
    "build_analysis_matrix",
    "directional_amplitudes",
    "expand_groups_to_delay_lines",
    "normalise_weights",
    "one_hot_mesh_encoding",
    "scaled_sigmoid",
    "scaled_softplus",
    "sigmoid",
    "softplus",
    "svf_cutoff_frequencies",
    "svf_params_to_response",
    "tan_sigmoid",
]
