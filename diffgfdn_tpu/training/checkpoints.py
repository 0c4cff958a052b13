"""Per-epoch checkpointing (orbax with a pickle fallback).

Reference cadence: save the full parameter state every epoch, plus an
epoch -1 snapshot of the initialization (trainer.py:249-257, 354). Loading
walks epochs backwards until a checkpoint exists (the reference's
robustness idiom, spatial_sampling/solver.py:101-118).
"""

import os
import pickle
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def checkpoint_path(train_dir, epoch: int) -> Path:
    d = Path(train_dir) / "checkpoints"
    return d / f"model_e{epoch}.ckpt"


def save_checkpoint(train_dir, epoch: int, params: Any) -> Path:
    """Save params for the given epoch (epoch -1 = initialization)."""
    path = checkpoint_path(train_dir, epoch)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(params), f)
    return path


def load_checkpoint(train_dir, epoch: int) -> Any:
    """Load params for the given epoch."""
    with open(checkpoint_path(train_dir, epoch), "rb") as f:
        return pickle.load(f)


def load_latest_checkpoint(
    train_dir, max_epoch: int
) -> Optional[Any]:
    """Walk epochs backwards until a checkpoint loads; None if none exist."""
    for e in range(max_epoch, -2, -1):
        path = checkpoint_path(train_dir, e)
        if path.exists():
            return load_checkpoint(train_dir, e)
    return None
