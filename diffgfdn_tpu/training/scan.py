"""Shared scanned-epoch machinery.

All three trainers (GFDNTrainer, BandParallelTrainer,
SpatialSamplingTrainer) run an epoch as ONE jitted ``lax.scan`` over its
steps: a single dispatch per epoch instead of one per step (each dispatch
costs ~3 ms wall on a tunnel-attached TPU, dominating sub-10 ms steps).
This module owns the scan skeleton — batch-index rows ride in as data and
per-step PRNG keys derive as ``fold_in(epoch_key, step)`` — so key
derivation / donation fixes happen in exactly one place.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def scan_epoch(
    step: Callable,
    carry,
    idx_mat: jnp.ndarray,
    epoch_key: Optional[jax.Array] = None,
) -> Tuple:
    """Run ``step`` over the rows of ``idx_mat`` as one ``lax.scan``.

    ``step(carry, idx, key) -> (carry, out)`` where ``idx`` is one row of
    ``idx_mat`` (a batch-index vector or a stacked-batch pytree slice) and
    ``key`` is ``fold_in(epoch_key, i)`` — or None when no ``epoch_key``
    is given (losses with no randomness skip the fold_in work).
    Returns ``(carry, outs)`` with ``outs`` stacked along the step axis.
    """
    if epoch_key is None:
        return jax.lax.scan(lambda c, x: step(c, x, None), carry, idx_mat)

    steps = jax.tree_util.tree_leaves(idx_mat)[0].shape[0]

    def body(c, xs):
        idx, i = xs
        return step(c, idx, jax.random.fold_in(epoch_key, i))

    return jax.lax.scan(
        body, carry, (idx_mat, jnp.arange(steps, dtype=jnp.uint32))
    )
