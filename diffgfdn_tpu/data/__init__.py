from .audio import read_wav, write_wav
from .batching import (
    arrays_from_room_dataset,
    BatchArrays,
    fixed_test_split,
    gather_batch,
    iterate_batches,
    num_batches,
    train_valid_split,
)
from .room_dataset import (
    early_late_split,
    Meshgrid,
    RIRData,
    RoomDataset,
    THREE_ROOM_ABSORPTION,
    THREE_ROOM_APERTURES,
    THREE_ROOM_DIMS,
    THREE_ROOM_START,
    ThreeRoomDataset,
)
from .synthetic import (
    generate_three_room_pickle,
    synthesize_amplitudes,
    synthetic_three_room_dataset,
)

__all__ = [
    "BatchArrays",
    "Meshgrid",
    "RIRData",
    "RoomDataset",
    "THREE_ROOM_ABSORPTION",
    "THREE_ROOM_APERTURES",
    "THREE_ROOM_DIMS",
    "THREE_ROOM_START",
    "ThreeRoomDataset",
    "arrays_from_room_dataset",
    "early_late_split",
    "fixed_test_split",
    "gather_batch",
    "generate_three_room_pickle",
    "iterate_batches",
    "num_batches",
    "read_wav",
    "synthesize_amplitudes",
    "synthetic_three_room_dataset",
    "train_valid_split",
    "write_wav",
]
