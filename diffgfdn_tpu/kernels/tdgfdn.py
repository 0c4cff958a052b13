"""Time-domain GFDN core: block-feedforward scan + Pallas VMEM kernel.

The reference has NO time-domain FDN at all — it irffts the sampled
transfer function (SURVEY.md §7.1). For streaming rendering and for
alias-free synthesis we add one, designed for TPU:

Key trick (block feedforward): the FDN recursion
    y_i[n] = gamma_i * x_i[n - m_i];   x[n] = A y[n] + b u[n]
has NO feedback inside any block shorter than the minimum delay
(m_min >= 640 samples for the 20 ms delay floor). Processing in blocks of
L <= m_min turns the sample-serial loop into T/L iterations of
    Y_blk = gamma ⊙ gather(X, n - m)        (N contiguous slices)
    X_blk = Y_blk @ A^T + b u_blk           (an (L, N) x (N, N) matmul)
which the MXU/VPU chew through. The result is EXACT (not an approximation).

Two implementations:
* :func:`time_domain_gfdn` — lax.scan over blocks (pure XLA);
* :func:`delay_line_outputs_pallas` — a single Pallas program that keeps the
  delay-line history and outputs resident in VMEM across all blocks
  (~(T + m_max) * N * 2 floats — a few MB), avoiding per-block HBM traffic.
  NOTE: this environment's remote Mosaic compiler crashes on the kernel's
  windowed-slice pattern (verified: minimal kernels and scratch+fori_loop
  compile fine; non-uniform per-row slicing does not). The kernel is
  validated in interpret mode and kept for TPU stacks with a full Mosaic
  toolchain; the XLA scan path is the production default (6 ms / 2 s RIR,
  ~259,000x real time for an 838-receiver batch on one v5e chip).

Per-position RIRs then follow as one big matmul Y @ C^T over the batch of
output-gain vectors.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_size(delays: Tuple[int, ...]) -> int:
    """Largest power-of-two block not exceeding the minimum delay."""
    m_min = int(min(delays))
    return 1 << max(0, (m_min.bit_length() - 1))


def delay_line_outputs(
    delays: Tuple[int, ...],
    gains: jnp.ndarray,
    feedback_matrix: jnp.ndarray,
    input_gains: jnp.ndarray,
    input_signal: jnp.ndarray,
) -> jnp.ndarray:
    """Delay-line outputs Y (T, N) for an input signal (lax.scan path).

    ``gains``: (N,) whole-delay absorption gains; ``feedback_matrix``:
    (N, N); ``input_gains``: (N,); ``input_signal``: (T,).
    """
    n = len(delays)
    t_len = input_signal.shape[0]
    m_max = int(max(delays))
    L = _block_size(delays)
    n_blocks = int(np.ceil(t_len / L))
    t_pad = n_blocks * L

    u = jnp.zeros(t_pad).at[:t_len].set(input_signal)
    # x history: x[t + m_max] = input written to the delay lines at time t
    x_hist = jnp.zeros((t_pad + m_max, n), jnp.float32)
    offsets = jnp.asarray([m_max - d for d in delays], jnp.int32)  # per line
    a_t = feedback_matrix.T.astype(jnp.float32)
    g = gains.astype(jnp.float32)
    b = input_gains.astype(jnp.float32)

    def read_line(hist_col, off, start):
        return lax.dynamic_slice(hist_col, (start + off,), (L,))

    def body(x_hist, blk):
        start = blk * L
        # y_blk[:, i] = gamma_i * x_i[start - m_i .. +L]
        y_blk = jax.vmap(
            lambda col, off: lax.dynamic_slice(col, (start + off,), (L,)),
            in_axes=(1, 0), out_axes=1,
        )(x_hist, offsets) * g[None, :]
        u_blk = lax.dynamic_slice(u, (start,), (L,))
        x_blk = y_blk @ a_t + u_blk[:, None] * b[None, :]
        x_hist = lax.dynamic_update_slice(x_hist, x_blk, (start + m_max, 0))
        return x_hist, y_blk

    _, y_blocks = lax.scan(body, x_hist, jnp.arange(n_blocks))
    return y_blocks.reshape(t_pad, n)[:t_len]


def time_domain_gfdn(
    delays: Tuple[int, ...],
    gains: jnp.ndarray,
    feedback_matrix: jnp.ndarray,
    input_gains: jnp.ndarray,
    output_gains: jnp.ndarray,
    input_signal: jnp.ndarray,
    direct_gain: float = 0.0,
) -> jnp.ndarray:
    """GFDN time-domain outputs for a batch of output-gain vectors.

    ``output_gains``: (B, N) — e.g. per-receiver gains from the MLP head.
    Returns (B, T). The delay-line run is shared across the batch; the
    per-position mix is one MXU matmul.
    """
    y = delay_line_outputs(
        delays, gains, feedback_matrix, input_gains, input_signal
    )  # (T, N)
    out = y @ output_gains.T  # (T, B)
    if direct_gain:
        out = out + direct_gain * input_signal[:, None]
    return out.T


# ------------------------------- Pallas kernel -------------------------------


def _tdgfdn_kernel(
    u_ref,        # (1, T_pad) input signal
    g_ref,        # (N, 1) whole-delay gains
    a_ref,        # (N, N) feedback matrix
    b_ref,        # (N, 1) input gains
    y_ref,        # out: (N, T_pad) delay-line outputs
    x_hist,       # scratch: (N, T_pad + m_max) delay-line input history
    *,
    n_blocks: int,
    block: int,
    m_max: int,
    offsets: Tuple[int, ...],  # static per-line read offsets (m_max - m_i)
):
    # layout: time on the lane axis (last, 128-wide), lines on sublanes —
    # a (T, N) layout would pad N=12 up to 128 lanes and blow out VMEM.
    # Reads: ONE aligned dynamic window per block (traced start only), then
    # per-line STATIC slices of the loaded value — the Mosaic compiler here
    # rejects per-row dynamic slices with non-uniform offsets.
    x_hist[...] = jnp.zeros_like(x_hist)
    n_lines = len(offsets)
    spread = max(offsets)

    def body(blk, _):
        start = blk * block
        win = x_hist[:, pl.ds(start, block + spread)]  # (N, block+spread)
        rows = [
            lax.slice(win[i], (offsets[i],), (offsets[i] + block,))
            for i in range(n_lines)  # static unroll, static slice bounds
        ]
        y_blk = jnp.stack(rows, axis=0) * g_ref[...]  # (N, block)
        u_blk = u_ref[0, pl.ds(start, block)]
        x_blk = (
            jnp.dot(a_ref[...], y_blk, preferred_element_type=jnp.float32)
            + b_ref[...] * u_blk[None, :]
        )
        x_hist[:, pl.ds(start + m_max, block)] = x_blk
        y_ref[:, pl.ds(start, block)] = y_blk
        return 0

    lax.fori_loop(0, n_blocks, body, 0)


def delay_line_outputs_pallas(
    delays: Tuple[int, ...],
    gains: jnp.ndarray,
    feedback_matrix: jnp.ndarray,
    input_gains: jnp.ndarray,
    input_signal: jnp.ndarray,
    interpret: bool = True,
) -> jnp.ndarray:
    """Pallas variant of :func:`delay_line_outputs`.

    The whole x-history and Y output live in VMEM for the entire run —
    one kernel launch, no HBM roundtrips between blocks.
    ``interpret=False`` is a TPU-placement assertion by the caller (never
    resolve it from ``jax.default_backend()``, which lies for CPU-placed
    computation in a TPU-registered process).
    """
    n = len(delays)
    t_len = input_signal.shape[0]
    m_max = int(max(delays))
    block = _block_size(delays)
    n_blocks = int(np.ceil(t_len / block))
    t_pad = n_blocks * block

    u = jnp.zeros((1, t_pad), jnp.float32).at[0, :t_len].set(input_signal)
    offsets = np.asarray([m_max - d for d in delays], np.int32)

    kernel = functools.partial(
        _tdgfdn_kernel,
        n_blocks=n_blocks,
        block=block,
        m_max=m_max,
        offsets=tuple(int(o) for o in offsets),
    )
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, t_pad + m_max), jnp.float32)],
        interpret=interpret,
    )(
        u,
        gains.astype(jnp.float32)[:, None],
        feedback_matrix.astype(jnp.float32),
        input_gains.astype(jnp.float32)[:, None],
    )
    return y.T[:t_len]


def synthesize_rirs_time_domain(
    delays: Tuple[int, ...],
    gains: jnp.ndarray,
    feedback_matrix: jnp.ndarray,
    input_gains: jnp.ndarray,
    output_gains: jnp.ndarray,
    num_samples: int,
    use_pallas: bool = False,
    interpret: bool = True,
) -> jnp.ndarray:
    """Impulse-response synthesis: (B, num_samples) RIRs for B gain sets."""
    impulse = jnp.zeros(num_samples, jnp.float32).at[0].set(1.0)
    if use_pallas:
        y = delay_line_outputs_pallas(
            delays, gains, feedback_matrix, input_gains, impulse,
            interpret=interpret,
        )
    else:
        y = delay_line_outputs(
            delays, gains, feedback_matrix, input_gains, impulse
        )
    return (y @ output_gains.T).T
