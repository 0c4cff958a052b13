"""Neural-acoustic-field (NAF) comparison data containers.

Reference behaviour: src/dataclass.py:8-59 — containers used when comparing
DiffGFDN against NAF baselines, plus a tolerant unpickler that remaps
legacy module paths.
"""

import pickle
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np


@dataclass
class NAFDatasetTrain:
    """Training-split container for NAF comparisons."""

    receiver_position: np.ndarray
    rirs: np.ndarray
    sample_rate: float
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class NAFDatasetInfer:
    """Inference-split container (positions only; RIRs predicted)."""

    receiver_position: np.ndarray
    predicted_rirs: Optional[np.ndarray] = None
    sample_rate: float = 48000.0
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class BarycentricInterpolatedDataset:
    """RIRs barycentrically interpolated from measured neighbours."""

    receiver_position: np.ndarray
    rirs: np.ndarray
    weights: np.ndarray              # (num_query, 3) barycentric weights
    simplex_indices: np.ndarray      # (num_query, 3) source-measurement ids
    sample_rate: float = 48000.0


class TolerantUnpickler(pickle.Unpickler):
    """Unpickler that remaps legacy module paths to this package.

    Lets pickles produced by the reference framework (whose classes lived
    under ``dataclass`` / ``spatial_sampling.dataloader``) load against our
    containers (reference: src/dataclass.py Slope2NoiseUnpickler idiom).
    """

    _REMAP = {
        ("dataclass", "NAFDatasetTrain"): NAFDatasetTrain,
        ("dataclass", "NAFDatasetInfer"): NAFDatasetInfer,
        ("dataclass", "BarycentricInterpolatedDataset"):
            BarycentricInterpolatedDataset,
    }

    def find_class(self, module, name):
        if (module, name) in self._REMAP:
            return self._REMAP[(module, name)]
        if module.startswith("spatial_sampling"):
            from . import spatial_dataset

            if hasattr(spatial_dataset, name):
                return getattr(spatial_dataset, name)
        if module.startswith("diff_gfdn"):
            from . import room_dataset

            if hasattr(room_dataset, name):
                return getattr(room_dataset, name)
        return super().find_class(module, name)


def load_pickle_tolerant(path):
    """Load a (possibly reference-produced) pickle with class remapping."""
    with open(path, "rb") as f:
        return TolerantUnpickler(f).load()


def barycentric_interpolate(
    measured_positions: np.ndarray,
    measured_rirs: np.ndarray,
    query_positions: np.ndarray,
) -> BarycentricInterpolatedDataset:
    """Barycentric (2-D Delaunay) RIR interpolation baseline."""
    from scipy.spatial import Delaunay

    pts = np.asarray(measured_positions)[:, :2]
    tri = Delaunay(pts)
    q = np.asarray(query_positions)[:, :2]
    simplex = tri.find_simplex(q)
    out_rirs = np.zeros((len(q), measured_rirs.shape[-1]), measured_rirs.dtype)
    weights = np.zeros((len(q), 3))
    indices = np.zeros((len(q), 3), np.int64)
    for i, s in enumerate(simplex):
        if s < 0:
            # outside the hull: nearest neighbour
            j = int(np.argmin(np.linalg.norm(pts - q[i], axis=-1)))
            out_rirs[i] = measured_rirs[j]
            weights[i, 0] = 1.0
            indices[i] = j
            continue
        verts = tri.simplices[s]
        t = tri.transform[s]
        bary = t[:2] @ (q[i] - t[2])
        w = np.append(bary, 1.0 - bary.sum())
        out_rirs[i] = np.einsum("k,kt->t", w, measured_rirs[verts])
        weights[i] = w
        indices[i] = verts
    return BarycentricInterpolatedDataset(
        receiver_position=np.asarray(query_positions),
        rirs=out_rirs,
        weights=weights,
        simplex_indices=indices,
    )
