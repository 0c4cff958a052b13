from .build import (
    absorption_arrays,
    build_colorless_fdn,
    build_gfdn_model,
    colorless_to_init,
    ColorlessFDNResults,
    load_colorless_fdn_params,
    skew_preimage,
)
from .checkpoints import (
    checkpoint_path,
    load_checkpoint,
    load_latest_checkpoint,
    save_checkpoint,
)
from .colorless_trainer import ColorlessFDNTrainer
from .optim import label_params, make_optimizer, step_decay_schedule
from .save_results import (
    gfdn_param_dict,
    save_colorless_fdn_parameters,
    save_diff_gfdn_parameters,
    save_loss,
)
from .solver import (
    run_training_anisotropic_decay_var_receiver_pos,
    run_training_colorless_fdn,
    run_training_single_pos,
    run_training_var_receiver_pos,
)
from .trainer import DirectionalGFDNTrainer, GFDNTrainer, SinglePosGFDNTrainer

__all__ = [
    "ColorlessFDNResults",
    "ColorlessFDNTrainer",
    "DirectionalGFDNTrainer",
    "GFDNTrainer",
    "SinglePosGFDNTrainer",
    "absorption_arrays",
    "build_colorless_fdn",
    "build_gfdn_model",
    "checkpoint_path",
    "colorless_to_init",
    "gfdn_param_dict",
    "label_params",
    "load_checkpoint",
    "load_colorless_fdn_params",
    "load_latest_checkpoint",
    "make_optimizer",
    "run_training_anisotropic_decay_var_receiver_pos",
    "run_training_colorless_fdn",
    "run_training_single_pos",
    "run_training_var_receiver_pos",
    "save_checkpoint",
    "save_colorless_fdn_parameters",
    "save_diff_gfdn_parameters",
    "save_loss",
    "skew_preimage",
    "step_decay_schedule",
]
