"""Optimizer setup: per-parameter-group Adam + step decay (optax).

Mirrors the reference's optimizer wiring (trainer.py:152-228): coupling
angles, io gains, and the position-conditioned heads each get their own
learning rate, and a StepLR(step_size=10 epochs, gamma=0.1) decay applies to
all groups. Implemented as ``optax.multi_transform`` over name-based labels.
"""

from typing import Any, Dict

import jax
import optax

from ..config.schema import TrainerConfig

# substring -> label, checked in order (first match wins)
_LABEL_RULES = (
    ("alpha", "coupling"),
    ("output_gains", "io"),
    ("input_gains", "io"),
    ("output_svf_params", "io"),
    ("input_svf_params", "io"),
    ("input_scalars", "io"),
    ("output_scalars", "io"),
    ("sh_output_scalars", "io"),
)


def _label_for_path(path: str) -> str:
    for sub, label in _LABEL_RULES:
        if sub in path:
            return label
    return "other"


def label_params(params) -> Any:
    """Pytree of {'coupling','io','other'} labels matching ``params``."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    labels = []
    for path, _ in flat:
        path_str = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        labels.append(_label_for_path(path_str))
    return jax.tree_util.tree_unflatten(treedef, labels)


def step_decay_schedule(base_lr: float, steps_per_epoch: int,
                        step_size_epochs: int = 10, gamma: float = 0.1,
                        count_offset: int = 0):
    """StepLR: lr * gamma^(epoch // step_size), counted in optimizer steps.

    ``count_offset`` shifts the schedule to a resumed run's true position
    (used when no optimizer-state checkpoint exists to restore the count).
    """

    def schedule(count):
        epoch = (count + count_offset) // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(
    trainer_config: TrainerConfig, params, steps_per_epoch: int,
    count_offset: int = 0,
) -> optax.GradientTransformation:
    """Adam with per-group lrs and shared StepLR(10 epochs, 0.1) decay."""

    def adam_with(base_lr: float):
        return optax.adam(
            learning_rate=step_decay_schedule(
                base_lr, steps_per_epoch, count_offset=count_offset
            )
        )

    transforms: Dict[str, optax.GradientTransformation] = {
        "coupling": adam_with(trainer_config.coupling_angle_lr),
        "io": adam_with(trainer_config.io_lr),
        "other": adam_with(trainer_config.lr),
    }
    return optax.multi_transform(transforms, label_params(params))
