from . import convert_dataset, run_model, run_spatial_sampling, run_subband_training

__all__ = [
    "convert_dataset",
    "run_model",
    "run_spatial_sampling",
    "run_subband_training",
]
