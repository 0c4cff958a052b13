"""YAML config loading and validation (reference: config/config_loader.py)."""

from pathlib import Path
from typing import Type, TypeVar, Union

from pydantic import BaseModel
import yaml

T = TypeVar("T", bound=BaseModel)


def load_and_validate_config(path: Union[str, Path], model: Type[T]) -> T:
    """Load a YAML file and validate it against a pydantic config model."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return model.model_validate(raw or {})


def dump_config(config: BaseModel, path: Union[str, Path]) -> None:
    """Write a config back to YAML (used by programmatic per-band configs)."""
    # keep explicit Nones: exclude_none made fields set to null resurrect
    # as non-None defaults on reload (e.g. input_filter_config: null turned
    # back into a default SVF head), so round-trips changed the model
    data = config.model_dump(mode="json")
    # computed fields are derived; do not persist them
    for key in ("delay_length_samps", "network_type", "load_fixed_parameters"):
        data.pop(key, None)
        for sub in data.values():
            if isinstance(sub, dict):
                sub.pop(key, None)
    with open(path, "w") as f:
        yaml.safe_dump(data, f)
