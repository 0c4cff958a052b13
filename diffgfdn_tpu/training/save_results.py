"""Result export: learned parameters to .mat / pickle, loss curves.

Parity with the reference's export tooling (save_results.py:14-138) so
downstream MATLAB / analysis workflows keep working.
"""

import pickle
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from scipy.io import savemat

from ..ops.unitary import orthogonal_from_skew


def gfdn_param_dict(model, params) -> Dict:
    """Numpy dict of the learned GFDN parameters (model.get_param_dict parity)."""
    import jax.numpy as jnp

    p = params["params"]
    out: Dict = {"delays": np.asarray(model.delays)}
    fl = p.get("feedback_loop", {})
    if "common_decay_times" in fl:
        out["common_decay_times"] = np.asarray(fl["common_decay_times"])
    if model.gains is not None:
        out["gains_per_sample"] = np.asarray(model.gains)
    for name in ("input_gains", "output_gains", "input_scalars", "output_scalars"):
        # only direct array parameters — MLP heads store a submodule dict
        # under these names, which must not be dumped into the .mat file
        if name in p and not isinstance(p[name], dict):
            out[name] = np.asarray(p[name]).squeeze()
    if "M" in fl:
        m = jnp.asarray(fl["M"])
        out["individual_mixing_matrix"] = np.asarray(m)
        out["coupled_feedback_matrix"] = np.asarray(
            _coupled_matrix(model, params)
        )
    if "alpha" in fl:
        out["coupling_coefficient"] = np.asarray(fl["alpha"]).squeeze()
    if "random_feedback_matrix" in fl:
        out["coupled_feedback_matrix"] = np.asarray(
            orthogonal_from_skew(jnp.asarray(fl["random_feedback_matrix"]))
        )
    return out


def _coupled_matrix(model, params):

    def fn(mdl):
        return mdl.feedback_loop.coupled_feedback_matrix()

    return model.apply(params, method=fn)


def save_diff_gfdn_parameters(
    model, params, directory, filename: str = "parameters_opt.mat"
) -> Dict:
    """Export learned parameters as a .mat file; returns the dict."""
    Path(directory).mkdir(parents=True, exist_ok=True)
    out = gfdn_param_dict(model, params)
    savemat(str(Path(directory) / filename), out)
    return out


def save_colorless_fdn_parameters(
    model, params, directory, group_idx: int
) -> "ColorlessFDNResults":
    """Pickle ColorlessFDNResults for warm-starting the GFDN."""
    from .build import ColorlessFDNResults

    import jax.numpy as jnp

    p = params["params"]
    results = ColorlessFDNResults(
        opt_input_gains=np.asarray(p["input_gains"]).squeeze(),
        opt_output_gains=np.asarray(p["output_gains"]).squeeze(),
        opt_feedback_matrix=np.asarray(
            orthogonal_from_skew(
                jnp.asarray(p["feedback_loop"]["random_feedback_matrix"])
            )
        ),
    )
    Path(directory).mkdir(parents=True, exist_ok=True)
    with open(
        Path(directory) / f"parameters_opt_group={group_idx + 1}.pkl", "wb"
    ) as f:
        pickle.dump(results, f)
    return results


def save_loss(
    train_loss: List[float],
    valid_loss: Optional[List[float]],
    directory,
    filename: str = "losses",
) -> None:
    """Save loss histories to .mat (plot export handled by utils.plot)."""
    Path(directory).mkdir(parents=True, exist_ok=True)
    data = {"train_loss": np.asarray(train_loss)}
    if valid_loss is not None:
        data["valid_loss"] = np.asarray(valid_loss)
    savemat(str(Path(directory) / f"{filename}.mat"), data)


def save_feedback_matrix_animation(
    model, train_dir, max_epochs: int, save_name: str = "feedback_matrix.gif"
) -> Optional[str]:
    """Animate the coupled feedback matrix across the epoch checkpoints
    (reference plot.py:341-408 animate_coupled_feedback_matrix, fed from the
    per-epoch state dicts). Returns the written path, or None when fewer
    than two checkpoints exist.
    """
    import jax

    from ..utils.plot import animate_coupled_feedback_matrix
    from .checkpoints import checkpoint_path, load_checkpoint

    mats = []
    coups = []
    has_coupling = False
    for epoch in range(-1, max_epochs):
        if not checkpoint_path(train_dir, epoch).exists():
            continue
        params = jax.tree_util.tree_map(
            np.asarray, load_checkpoint(train_dir, epoch)
        )
        mats.append(np.asarray(_coupled_matrix(model, params)))
        try:
            coup = model.apply(
                params, method=lambda m: m.feedback_loop.coupling_matrix()
            )
            coup = np.asarray(coup)
            if coup.ndim == 2:  # SCALAR mode only (FILTER is polynomial)
                coups.append(np.abs(coup))
                has_coupling = True
        except Exception:
            pass
    if len(mats) < 2:
        return None
    if mats[0].ndim == 3:  # FILTER mode: animate the order-0 tap
        mats = [m[0] for m in mats]
    path = str(Path(train_dir) / save_name)
    animate_coupled_feedback_matrix(
        mats, coups if has_coupling and len(coups) == len(mats) else None,
        save_path=path,
    )
    return path
