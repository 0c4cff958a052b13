"""Static-shape batching for jit-compiled training.

Replaces the reference's torch DataLoader stack (dataloader.py:512-868) with
a numpy-side iterator producing dicts of equal-shape arrays:
* each batch carries all frequency bins but a fixed-size subset of receiver
  positions (static shapes => one XLA compile);
* splits: fixed seeded test split + random train/valid split
  (dataloader.py:707-745);
* z points live on (or slightly outside) the unit circle.
"""

from typing import Callable, Dict, Iterator, Optional, Tuple, Union

import numpy as np

from .room_dataset import RoomDataset

# a spectra field may be passed as a zero-arg thunk that is resolved (and
# cached) on first attribute access — arrays_from_room_dataset uses this so
# the production fast path (precomputed features + device-side early rfft)
# never pays the host-side full-grid rffts it does not read
_ArrayOrThunk = Union[np.ndarray, Callable[[], np.ndarray], None]


class BatchArrays:
    """Full-dataset feature arrays from which batches are gathered.

    Same construction signature as the former dataclass; the three target
    spectra additionally accept lazy thunks (see ``_ArrayOrThunk``).
    """

    def __init__(
        self,
        z_values: np.ndarray,                  # (F,) complex64
        source_position: np.ndarray,           # (R, 3) or (1, 3)
        listener_position: np.ndarray,         # (R, 3)
        norm_listener_position: np.ndarray,    # (R, 3)
        target_early_response: _ArrayOrThunk = None,  # (R, F) complex64
        target_late_response: _ArrayOrThunk = None,   # (R, F) complex64
        target_rir_response: _ArrayOrThunk = None,    # (R, F) complex64
        target_common_slope_amps: Optional[np.ndarray] = None,  # (R, .., S)
        mesh_2d: Optional[np.ndarray] = None,  # (L, 2)
        # per-item precomputed loss features (e.g. target EDC/EDR in dB),
        # gathered alongside the raw targets
        precomputed: Optional[Dict[str, np.ndarray]] = None,
        # faded early RIR segment (R, mixing_time samples) — when present,
        # trainers upload these ~2 MB of time samples and rfft ON DEVICE
        # instead of shipping the (R, F) early spectrum over the tunnel
        target_early_time: Optional[np.ndarray] = None,
        # full time-domain RIRs (R, T) float32 — when present, feature
        # precompute uploads these (as float16: half the tunnel bytes of
        # the complex64 spectra) and derives every spectrum on device
        target_rir_time: Optional[np.ndarray] = None,
    ):
        self.z_values = z_values
        self.source_position = source_position
        self.listener_position = listener_position
        self.norm_listener_position = norm_listener_position
        self._target_early_response = target_early_response
        self._target_late_response = target_late_response
        self._target_rir_response = target_rir_response
        self.target_common_slope_amps = target_common_slope_amps
        self.mesh_2d = mesh_2d
        self.precomputed = precomputed
        self.target_early_time = target_early_time
        self.target_rir_time = target_rir_time

    @staticmethod
    def _resolve(value: _ArrayOrThunk) -> Optional[np.ndarray]:
        return value() if callable(value) else value

    @property
    def target_early_response(self) -> np.ndarray:
        self._target_early_response = self._resolve(
            self._target_early_response
        )
        return self._target_early_response

    @target_early_response.setter
    def target_early_response(self, value: _ArrayOrThunk) -> None:
        self._target_early_response = value

    @property
    def target_late_response(self) -> np.ndarray:
        self._target_late_response = self._resolve(self._target_late_response)
        return self._target_late_response

    @target_late_response.setter
    def target_late_response(self, value: _ArrayOrThunk) -> None:
        self._target_late_response = value

    @property
    def target_rir_response(self) -> np.ndarray:
        self._target_rir_response = self._resolve(self._target_rir_response)
        return self._target_rir_response

    @target_rir_response.setter
    def target_rir_response(self, value: _ArrayOrThunk) -> None:
        self._target_rir_response = value

    @property
    def num_items(self) -> int:
        return self.listener_position.shape[0]


def arrays_from_room_dataset(
    room_data: RoomDataset, new_sampling_radius: Optional[float] = None
) -> BatchArrays:
    """Flatten a RoomDataset into contiguous batch arrays."""
    radius = 1.0 if new_sampling_radius in (None, 1.0) else new_sampling_radius
    assert radius >= 1.0
    z = (radius * np.exp(1j * room_data.freq_bins_rad)).astype(np.complex64)
    src = room_data.source_position.astype(np.float32)
    if src.shape[0] == 1:
        src = np.broadcast_to(src, (room_data.num_rec, 3)).copy()
    amps = room_data.amplitudes

    # lazy thunks: the dataset computes (and caches) each host-side
    # spectrum only when a consumer actually reads it — the production
    # fast path (precomputed features + device-side early rfft + float16
    # time-sample uploads) reads none of them, skipping three ~440 MB
    # single-core rffts at the 838 x 131072 scale. copy=False casts alias
    # (the spectra are already complex64 from float32 ffts).
    def _early():
        return room_data.early_rir_mag_response.astype(np.complex64,
                                                       copy=False)

    def _late():
        return room_data.late_rir_mag_response.astype(np.complex64,
                                                      copy=False)

    def _rir():
        return room_data.rir_mag_response.astype(np.complex64, copy=False)

    return BatchArrays(
        z_values=z,
        source_position=src,
        listener_position=room_data.receiver_position.astype(
            np.float32, copy=False
        ),
        norm_listener_position=room_data.norm_receiver_position.astype(
            np.float32, copy=False
        ),
        target_early_response=_early,
        target_late_response=_late,
        target_rir_response=_rir,
        target_early_time=getattr(room_data, "early_rir_time", None),
        target_rir_time=getattr(room_data, "rirs32", None),
        target_common_slope_amps=(
            None if amps is None else np.asarray(amps, np.float32)
        ),
        mesh_2d=room_data.mesh_2d.points.astype(np.float32),
    )


def init_example_batch(arrays: BatchArrays, batch_size: int) -> Dict:
    """Batch for ``model.init`` ONLY: real positions/z, ZERO target planes.

    Flax parameter shapes and initializer draws depend on input shapes,
    never on target values (targets are consumed by losses, and the
    model's early-injection add is value-linear), so init on zeroed
    targets yields bit-identical parameters — while gathering REAL
    targets would materialize the lazy host-side full-grid rffts the
    production fast path otherwise never runs (~10 s of single-core parse
    work at the 838 x 131072 scale). Target planes are created already
    truncated to INIT_FREQ_BINS, matching init_with_batch's shrink, so
    the allocation stays tiny.
    """
    from ..utils.cio import INIT_FREQ_BINS

    n = min(batch_size, arrays.num_items)
    idx = np.arange(n)
    nb = min(arrays.z_values.shape[0], INIT_FREQ_BINS)
    zeros = np.zeros((n, nb), np.complex64)
    batch = {
        "z_values": arrays.z_values,
        "source_position": arrays.source_position[idx],
        "listener_position": arrays.listener_position[idx],
        "norm_listener_position": arrays.norm_listener_position[idx],
        "target_early_response": zeros,
        "target_late_response": zeros,
        "target_rir_response": zeros,
    }
    if arrays.target_common_slope_amps is not None:
        batch["target_common_slope_amps"] = arrays.target_common_slope_amps[
            idx
        ]
    if arrays.mesh_2d is not None:
        batch["mesh_2d"] = arrays.mesh_2d
    # arrays.precomputed (loss features) is deliberately NOT included:
    # model.init never runs losses, and the features are device-resident —
    # gathering them here would block on (and re-fetch) the async queue
    return batch


def fixed_test_split(
    num_items: int, test_ratio: float = 0.1, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """(test_indices, remaining_indices) — seeded, stable across runs."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(num_items)
    test_size = int(num_items * test_ratio)
    return idx[:test_size], idx[test_size:]


def train_valid_split(
    indices: np.ndarray, split: float, seed: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Random split of the given indices into train/valid subsets."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(indices))
    n_train = int(len(indices) * split)
    return indices[perm[:n_train]], indices[perm[n_train:]]


def gather_batch(arrays: BatchArrays, idx: np.ndarray) -> Dict[str, np.ndarray]:
    """Materialize one batch dict (z values and mesh are shared constants)."""
    batch = {
        "z_values": arrays.z_values,
        "source_position": arrays.source_position[idx],
        "listener_position": arrays.listener_position[idx],
        "norm_listener_position": arrays.norm_listener_position[idx],
        "target_early_response": arrays.target_early_response[idx],
        "target_late_response": arrays.target_late_response[idx],
        "target_rir_response": arrays.target_rir_response[idx],
    }
    if arrays.target_common_slope_amps is not None:
        batch["target_common_slope_amps"] = arrays.target_common_slope_amps[idx]
    if arrays.mesh_2d is not None:
        batch["mesh_2d"] = arrays.mesh_2d
    if arrays.precomputed:
        for k, v in arrays.precomputed.items():
            batch[k] = v[idx]
    return batch


def iterate_batches(
    arrays: BatchArrays,
    indices: np.ndarray,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: Optional[int] = None,
    pad_to_batch: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield static-shape batches over the index set.

    ``drop_last=True`` keeps every batch the same shape (single compile).
    ``pad_to_batch`` instead repeats indices to fill the final batch.
    """
    idx = np.array(indices)
    if shuffle:
        rng = np.random.RandomState(seed)
        idx = idx[rng.permutation(len(idx))]
    n = len(idx)
    num_full = n // batch_size
    for k in range(num_full):
        yield gather_batch(arrays, idx[k * batch_size : (k + 1) * batch_size])
    rem = n - num_full * batch_size
    if rem and not drop_last:
        tail = idx[num_full * batch_size :]
        if pad_to_batch:
            # tile so the fill works even when len(idx) < batch_size
            # (a single concat of idx[:batch_size-rem] underfilled then,
            # breaking the static-shape contract)
            reps = int(np.ceil((batch_size - rem) / max(n, 1)))
            fill = np.tile(idx, reps)[: batch_size - rem]
            tail = np.concatenate([tail, fill])
        yield gather_batch(arrays, tail)


def num_batches(num_items: int, batch_size: int, drop_last: bool = True) -> int:
    """Batch count matching :func:`iterate_batches`."""
    if drop_last:
        return num_items // batch_size
    return int(np.ceil(num_items / batch_size))
