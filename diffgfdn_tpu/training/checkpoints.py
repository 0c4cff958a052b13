"""Per-epoch checkpointing (orbax with a pickle fallback).

Reference cadence: save the full parameter state every epoch, plus an
epoch -1 snapshot of the initialization (trainer.py:249-257, 354). Loading
walks epochs backwards until a checkpoint exists (the reference's
robustness idiom, spatial_sampling/solver.py:101-118).
"""

import logging
import os
import pickle
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger("diffgfdn_tpu")


def _to_numpy(tree):
    """Fetch a device pytree to host numpy with PIPELINED transfers.

    Issuing every leaf's device->host copy asynchronously before the
    first blocking read turns N serial tunnel round trips (~45 ms each —
    ~2 s/epoch for params + Adam state at checkpoint time) into one
    overlapped batch.
    """
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def checkpoint_path(train_dir, epoch: int) -> Path:
    d = Path(train_dir) / "checkpoints"
    return d / f"model_e{epoch}.ckpt"


def save_checkpoint(train_dir, epoch: int, params: Any) -> Path:
    """Save params for the given epoch (epoch -1 = initialization).

    Atomic write (tmp + rename) so an interrupted run never leaves a
    truncated checkpoint behind.
    """
    path = checkpoint_path(train_dir, epoch)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(params), f)
    os.replace(tmp, path)
    return path


def opt_state_path(train_dir, epoch: int) -> Path:
    return Path(train_dir) / "checkpoints" / f"opt_e{epoch}.ckpt"


def save_opt_state(train_dir, epoch: int, opt_state: Any) -> Path:
    """Sidecar optimizer-state checkpoint (Adam moments + schedule counts).

    Kept separate from the params file so inference consumers of
    ``model_e{e}.ckpt`` see the same format as before; resume loads both
    so a resumed run continues with the exact optimizer state (moments
    AND StepLR schedule position) an uninterrupted run would have.
    """
    path = opt_state_path(train_dir, epoch)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(opt_state), f)
    os.replace(tmp, path)
    return path


def load_opt_state(train_dir, epoch: int) -> Optional[Any]:
    """Optimizer state for the given epoch, or None if not checkpointed."""
    path = opt_state_path(train_dir, epoch)
    if not path.exists():
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(train_dir, epoch: int, params: Any) -> Path:
    """Orbax-backed checkpoint (directory format, async-capable)."""
    import orbax.checkpoint as ocp

    path = (Path(train_dir) / "checkpoints" / f"model_e{epoch}").resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(params), force=True)
    return path


def load_checkpoint_orbax(train_dir, epoch: int, like: Any) -> Any:
    """Restore an orbax checkpoint (``like`` gives the target structure)."""
    import orbax.checkpoint as ocp

    path = (Path(train_dir) / "checkpoints" / f"model_e{epoch}").resolve()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)


def load_checkpoint(train_dir, epoch: int) -> Any:
    """Load params for the given epoch."""
    with open(checkpoint_path(train_dir, epoch), "rb") as f:
        return pickle.load(f)


def load_latest_checkpoint(
    train_dir, max_epoch: int
) -> Optional[Any]:
    """Walk epochs backwards until a checkpoint loads; None if none exist."""
    found = load_latest_checkpoint_with_epoch(train_dir, max_epoch)
    return None if found is None else found[0]


def load_latest_checkpoint_with_epoch(
    train_dir, max_epoch: int
) -> Optional[tuple]:
    """(params, epoch) of the newest checkpoint, or None.

    Epoch -1 is the saved initialization; the reference's inference code
    walks epochs backwards the same way (inference.py:410-428).
    """
    for e in range(max_epoch, -2, -1):
        path = checkpoint_path(train_dir, e)
        if path.exists():
            try:
                return load_checkpoint(train_dir, e), e
            except Exception as exc:  # corrupt/partial file: keep walking
                logger.warning(
                    "checkpoint %s unreadable (%r) — falling back to the "
                    "previous epoch", path, exc,
                )
    return None
