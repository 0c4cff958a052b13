from .band_parallel import BandParallelTrainer, make_band_loss_fn
from .freq_parallel import make_freq_sharded_step
from .mesh import (
    band_sharding,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch_dict,
)

__all__ = [
    "BandParallelTrainer",
    "band_sharding",
    "batch_sharding",
    "make_band_loss_fn",
    "make_freq_sharded_step",
    "make_mesh",
    "replicated",
    "shard_batch_dict",
]
