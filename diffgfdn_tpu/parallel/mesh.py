"""Device mesh construction for GFDN training.

Two mesh axes (SURVEY.md §2.7 / §5.8):
* ``band`` — "expert" axis: the 8 octave-band GFDNs train simultaneously as
  a vmapped leading axis sharded across devices (the reference runs 8
  independent python jobs, run_subband_training_treble.py:175-204);
* ``batch`` — data-parallel axis over receiver positions; loss reductions
  become XLA ``psum``s inserted by GSPMD.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_bands: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh of shape (band, batch) over all (or given) devices.

    ``num_bands`` devices are assigned to the band axis (clipped to what
    divides the device count); the rest go to data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    band = 1
    for cand in range(min(num_bands, n), 0, -1):
        if n % cand == 0:
            band = cand
            break
    arr = np.asarray(devices).reshape(band, n // band)
    return Mesh(arr, axis_names=("band", "batch"))


def batch_sharding(mesh: Mesh, has_band_axis: bool = False) -> NamedSharding:
    """Sharding for per-receiver arrays: receivers over the 'batch' axis."""
    if has_band_axis:
        return NamedSharding(mesh, P("band", "batch"))
    return NamedSharding(mesh, P("batch"))


def band_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-band stacked arrays (leading band axis)."""
    return NamedSharding(mesh, P("band"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_dict(batch: dict, mesh: Mesh) -> dict:
    """Device-put a batch dict: receiver-axis arrays sharded over 'batch'.

    ``z_values`` / ``mesh_2d`` (position-independent) are replicated.
    """
    out = {}
    repl = replicated(mesh)
    shard = batch_sharding(mesh)
    for k, v in batch.items():
        if k.startswith(("z_values", "mesh_2d", "sph_directions")):
            out[k] = jax.device_put(v, repl)
        else:
            out[k] = jax.device_put(v, shard)
    return out
