"""Frequency-axis ("sequence-parallel" analogue) sharded training.

The reference's long axis is the rFFT bin grid (~65k bins; SURVEY.md §5.7).
Each bin's (D Gamma^-1 - A) solve is independent, so the bin axis shards
cleanly: z values, targets, and the achieved response live sharded on the
``batch`` mesh axis's orthogonal partner; XLA inserts the all-gathers the
irfft-based losses need. This complements data parallelism for
small-receiver / huge-nfft workloads (e.g. single-position fits where the
whole unit circle is one batch).
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.cio import decode_batch, encode_batch


def make_freq_sharded_step(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    freq_axis: str = "batch",
):
    """Jitted training step with the frequency axis sharded over ``freq_axis``.

    ``loss_fn(params, batch, key) -> (total, aux)`` must consume decoded
    batches. Batch arrays whose last data axis is the bin axis are sharded
    on it; params replicate.
    """
    # rFFT grids have 2^k + 1 bins — never divisible by the device count —
    # so inputs arrive replicated and the bin axis is sharded INSIDE the
    # program via with_sharding_constraint (GSPMD pads non-divisible axes)
    zsh = NamedSharding(mesh, P(freq_axis))

    def constrain(batch: Dict) -> Dict:
        num_bins = batch["z_values"].shape[0]
        out = {}
        for k, v in batch.items():
            if k == "z_values":
                out[k] = jax.lax.with_sharding_constraint(v, zsh)
            elif (
                isinstance(v, jnp.ndarray)
                and jnp.iscomplexobj(v)
                and v.ndim >= 1
                and v.shape[-1] == num_bins
            ):
                # target spectra: (F,) single-pos or (B, F) batched — the
                # bin axis is always last
                spec = P(*([None] * (v.ndim - 1) + [freq_axis]))
                out[k] = jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, spec)
                )
            else:
                out[k] = v
        return out

    def step(params, opt_state, enc_batch, key):
        batch = constrain(decode_batch(enc_batch))
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, aux

    jitted = jax.jit(step)

    def run(params, opt_state, batch: Dict, key):
        return jitted(params, opt_state, encode_batch(batch), key)

    return run
