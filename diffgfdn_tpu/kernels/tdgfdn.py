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
* :func:`delay_line_outputs_pallas` — a Pallas grid over blocks with a
  SHIFTING delay-line history held in VMEM scratch. The formulation was
  reached by probing the Mosaic compiler (round 3): dynamic-start vector
  stores ("cannot statically prove index in bounds") and stacks of
  lane-misaligned row slices ("tpu.concatenate offset mismatch") are
  rejected — so EVERY index here is static: the history lives at a fixed
  position (store block at the tail, shift left by one block), each line's
  delayed read is a static 0/1 SELECTION MATMUL on one shared window (the
  output's lane offset is always 0, so the row stack concatenates), and
  the per-block output is written through the grid BlockSpec. COMPILES on
  this stack and runs at XLA-scan speed with f32-exact accuracy:
  2 s / 12-line flagship = 7.9 ms, |err| vs float64 = 2.4e-8 with
  precision=HIGHEST dots (the scan path's default-precision matmuls
  accumulate ~7e-4).

Per-position RIRs then follow as one big matmul Y @ C^T over the batch of
output-gain vectors.

Frequency-dependent decay is fully supported: per-line SOS/IIR absorption
filters run EXACTLY via block state-space processing, and FILTER-mode
polynomial coupling A(z) via a carried output tail — see
:func:`delay_line_outputs_filtered` and the section notes below. Every
realistic config (ops/absorption.py GEQ/Prony fits) therefore synthesizes
alias-free in the time domain.
"""

import functools
import logging
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger("diffgfdn_tpu")


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
        # HIGHEST: rounding feeds back through the recursion — the default
        # bf16 matmul accumulates ~7e-4 abs error over a 2 s tail (measured
        # vs float64); full-f32 is exact to ~2e-8 and the (L, N) x (N, N)
        # matmul is negligible next to the gathers
        x_blk = (
            jnp.matmul(y_blk, a_t, precision=jax.lax.Precision.HIGHEST)
            + u_blk[:, None] * b[None, :]
        )
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

# VMEM budget for the static selection tensor (N, spread+block, block); the
# block size shrinks until it fits (Mosaic scoped-vmem OOMs around ~20 MB
# of stack-resident constants on this stack — 26.6 MB failed, 10.1 MB ran)
_SEL_VMEM_BUDGET_BYTES = 12 * 2 ** 20


def _pallas_block_size(delays: Tuple[int, ...]) -> Optional[int]:
    """Largest block (<= min delay, <= 256) whose selection tensor fits.

    Returns None when no block size fits: the tensor is dominated by the
    delay SPREAD (n * spread * block floats), which halving the block
    barely reduces — a wide-spread delay set can exceed the budget even at
    the block floor, and the caller must use the XLA scan path instead.
    """
    n = len(delays)
    spread = int(max(delays)) - int(min(delays))
    block = min(_block_size(delays), 256)
    while block > 8 and n * (spread + block) * block * 4 > _SEL_VMEM_BUDGET_BYTES:
        block //= 2
    if n * (spread + block) * block * 4 > _SEL_VMEM_BUDGET_BYTES:
        return None
    return block


def _tdgfdn_kernel(
    u_ref,        # (1, block) input block (grid-sliced)
    g_ref,        # (N, 1) whole-delay gains
    a_ref,        # (N, N) feedback matrix
    b_ref,        # (N, 1) input gains
    sel_ref,      # (N, spread+block, block) static 0/1 de-offset selectors
    y_ref,        # out: (N, block) delay-line outputs (grid-sliced)
    hist,         # scratch: (N, m_max + block) shifting history
    *,
    block: int,
    m_max: int,
    spread: int,
    n_lines: int,
):
    # Mosaic constraints (probed, see module notes): no dynamic-start
    # stores, no concatenation of lane-misaligned slices. Everything here
    # is static: hist[:, j] = x[t0 - m_max + j]; line i's delayed block is
    # win @ sel[i] (an MXU matmul whose result is always lane-offset 0);
    # the new block lands at the FIXED tail and the history shifts left.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        hist[...] = jnp.zeros_like(hist)

    win = hist[:, : spread + block]  # static read, offset 0
    rows = [
        jnp.dot(
            win[k : k + 1, :],
            sel_ref[k],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[0]
        for k in range(n_lines)
    ]
    y_blk = jnp.stack(rows, axis=0) * g_ref[...]  # (N, block)
    x_blk = (
        jnp.dot(
            a_ref[...],
            y_blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + b_ref[...] * u_ref[...]
    )
    # store x[t0 .. t0+block) at the tail (old frame), THEN shift left
    hist[:, m_max:] = x_blk
    hist[:, :m_max] = lax.slice(hist[...], (0, block), (n_lines, m_max + block))
    y_ref[...] = y_blk


def delay_line_outputs_pallas(
    delays: Tuple[int, ...],
    gains: jnp.ndarray,
    feedback_matrix: jnp.ndarray,
    input_gains: jnp.ndarray,
    input_signal: jnp.ndarray,
    interpret: bool = True,
) -> jnp.ndarray:
    """Pallas variant of :func:`delay_line_outputs` (compiles on TPU).

    The delay-line history lives in VMEM scratch across the whole run (a
    shifting (N, m_max + block) window — no HBM roundtrips between blocks)
    and both matmuls run at precision=HIGHEST: |err| vs float64 is ~2e-8
    where the scan path's default-precision matmuls accumulate ~7e-4.
    ``interpret=False`` is a TPU-placement assertion by the caller (never
    resolve it from ``jax.default_backend()``, which lies for CPU-placed
    computation in a TPU-registered process).
    """
    n = len(delays)
    t_len = input_signal.shape[0]
    m_max = int(max(delays))
    block = _pallas_block_size(delays)
    if block is None:
        # selection tensor cannot fit VMEM at any block size (wide delay
        # spread) — the XLA scan computes the identical recursion
        logger.warning(
            "tdgfdn Pallas kernel skipped: delay spread %d needs more VMEM "
            "than the %d MB selection budget; using the XLA scan path",
            int(max(delays)) - int(min(delays)),
            _SEL_VMEM_BUDGET_BYTES >> 20,
        )
        return delay_line_outputs(
            delays, gains, feedback_matrix, input_gains, input_signal
        )
    n_blocks = int(np.ceil(t_len / block))
    t_pad = n_blocks * block

    u = jnp.zeros((1, t_pad), jnp.float32).at[0, :t_len].set(input_signal)
    offsets = tuple(m_max - int(d) for d in delays)
    spread = max(offsets)
    sel = np.zeros((n, spread + block, block), np.float32)
    for i in range(n):
        sel[i, offsets[i] : offsets[i] + block] = np.eye(block)

    kernel = functools.partial(
        _tdgfdn_kernel,
        block=block,
        m_max=m_max,
        spread=spread,
        n_lines=n,
    )
    y = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((n, t_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec(sel.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n, block), lambda i: (0, i)),
        scratch_shapes=[pltpu.VMEM((n, m_max + block), jnp.float32)],
        interpret=interpret,
    )(
        u,
        gains.astype(jnp.float32)[:, None],
        feedback_matrix.astype(jnp.float32),
        input_gains.astype(jnp.float32)[:, None],
        jnp.asarray(sel),
    )
    return y.T[:t_len]


# ------------------------- scan vs kernel policy ----------------------------
# Both paths compute the identical recursion at f32-exact accuracy
# (precision=HIGHEST matmuls); the choice is purely a speed call. Round-3/4
# measurements on the real chip put them at parity (kernel 7.7-7.9 ms vs
# scan 6.9-7.7 ms at the 2 s / 12-line flagship scale), so the DEFAULT
# absent a measurement is the scan. bench.py re-measures both every round
# (metric ``tdgfdn_pallas_x_realtime``) and records the result here, making
# the selection a measured policy rather than a hardcoded flag.

_KERNEL_TIMINGS: dict = {}

# Selection hysteresis: the kernel is chosen only when measured at least
# this much FASTER than the scan (kernel_dt <= MARGIN * scan_dt). The two
# paths sit near parity on this workload and single measurements through
# the shared TPU tunnel wander by tens of percent with contention (round-4
# builder session measured the kernel 1.61x faster; the driver's run of
# the same bench the same day measured 1.02x) — without a decisive margin
# a noisy reading flips production behavior round to round. 0.9 means a
# >= 10% measured win is required; parity defaults to the scan.
_KERNEL_SELECTION_MARGIN = 0.9


def record_kernel_timing(
    delays: Tuple[int, ...], kernel_dt: float, scan_dt: float
) -> None:
    """Record a measured kernel-vs-scan comparison for a delay signature.

    ``kernel_dt``/``scan_dt``: best wall-clock per synthesis run, seconds.
    Consulted by :func:`use_pallas_kernel` in the same process.
    """
    _KERNEL_TIMINGS[tuple(int(d) for d in delays)] = (
        float(kernel_dt), float(scan_dt)
    )


def use_pallas_kernel(
    delays: Tuple[int, ...], devices=None
) -> bool:
    """Measured selection policy for the compiled Pallas TD kernel.

    True only when (a) the computation is TPU-placed (the placement
    contract — NEVER ``jax.default_backend()``, which lies for CPU-placed
    computation in a TPU-registered process, utils/placement.py), (b) the
    selection tensor fits the VMEM budget for this delay signature, and
    (c) a recorded measurement (:func:`record_kernel_timing`) shows the
    kernel DECISIVELY faster than the scan — at least the
    ``_KERNEL_SELECTION_MARGIN`` hysteresis (>= 10% measured win), so a
    parity-level reading inside tunnel measurement noise cannot flip
    production behavior between rounds. Without a measurement the scan is
    chosen: recorded comparisons sit at parity (BASELINE.md round-3/4
    kernel tables; bench.py re-measures both paths interleaved each round
    and records them as ``tdgfdn_kernel_ms`` / ``tdgfdn_scan_ms``).
    """
    from ..utils.placement import placement_is_tpu

    if not placement_is_tpu(devices):
        return False
    if _pallas_block_size(delays) is None:
        return False
    timing = _KERNEL_TIMINGS.get(tuple(int(d) for d in delays))
    return timing is not None and timing[0] <= _KERNEL_SELECTION_MARGIN * timing[1]


def synthesize_rirs_time_domain(
    delays: Tuple[int, ...],
    gains: jnp.ndarray,
    feedback_matrix: jnp.ndarray,
    input_gains: jnp.ndarray,
    output_gains: jnp.ndarray,
    num_samples: int,
    use_pallas: Optional[bool] = None,
    interpret: bool = True,
) -> jnp.ndarray:
    """Impulse-response synthesis: (B, num_samples) RIRs for B gain sets.

    ``use_pallas=None`` (default) resolves scan-vs-kernel through the
    measured policy :func:`use_pallas_kernel`; an explicit bool forces the
    path. ``interpret`` only applies to the kernel path (False asserts TPU
    placement by the caller).
    """
    impulse = jnp.zeros(num_samples, jnp.float32).at[0].set(1.0)
    if use_pallas is None:
        use_pallas = use_pallas_kernel(delays)
        interpret = False if use_pallas else interpret
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


# ----------------- frequency-dependent absorption (exact) -------------------
#
# Realistic GFDN configs attach an SOS/IIR absorption filter gamma_i(z) to
# every delay line (ops/absorption.py fits them from per-band decay times;
# reference: absorption_filters.py:56-155). The loop then reads
#     y_i[n] = (gamma_i * x_i)[n - m_i];   x[n] = A(z) y[n] + b u[n]
# i.e. the filter acts on the DELAYED line signal — so inside a block of
# L <= m_min samples the filter input is fully known history and the block
# feedforward trick above still applies. The recursion *within* the filter
# is handled EXACTLY with block state-space processing:
#
# with (T, B, C, D) the cascade's state-space and s the state at block
# start, the block output splits into
#     y[n] = C T^n s  +  sum_{k<=n} h[n-k] u[k],        n = 0..L-1
#     s'   = T^L s    +  sum_k T^{L-1-k} B u[k]
# where h[0] = D, h[j] = C T^{j-1} B are the filter's FIRST L impulse-
# response samples. The convolution term is an exact linear convolution
# (zero-padded rFFT product per block); the infinite IR tail is carried by
# the state — no truncation error anywhere. All precomputation is host-side
# float64; the in-scan work is two small einsums + one length-2L FFT per
# block, negligible next to the (L, N) x (N, N) feedback matmul.
#
# FILTER-mode coupling A(z) = sum_o A_o z^-o (feedback_loop.py FIR
# paraunitary, order ~32) is supported by carrying the last order-1 samples
# of y across blocks and forming x[n] = sum_o y[n-o] A_o^T as a static sum
# of shifted (L, N) x (N, N) matmuls.


class BlockFilterBank(NamedTuple):
    """Per-delay-line block state-space filter constants (host numpy f32).

    Shapes: ``h`` (N, L) first-L impulse response; ``p`` (N, L, m) initial-
    state response rows C T^n; ``q`` (N, m, L) input-to-state columns
    T^{L-1-k} B; ``tl`` (N, m, m) = T^L. ``m`` = state dimension.
    """

    h: np.ndarray
    p: np.ndarray
    q: np.ndarray
    tl: np.ndarray

    @property
    def block(self) -> int:
        return self.h.shape[1]


def sos_cascade_to_statespace(sos: np.ndarray):
    """(S, 3, 2) biquad cascade -> series state-space (T, B, C, D), float64.

    Per-section transposed direct-form II realization, composed in series.
    Convention matches ops.biquad.sos_frequency_response: section k is
    (b0 + b1 z^-1 + b2 z^-2) / (a0 + a1 z^-1 + a2 z^-2).
    """
    t = np.zeros((0, 0))
    bv = np.zeros(0)
    cv = np.zeros(0)
    d = 1.0
    for k in range(sos.shape[0]):
        b = np.asarray(sos[k, :, 0], np.float64)
        a = np.asarray(sos[k, :, 1], np.float64)
        b = b / a[0]
        a = a / a[0]
        a_k = np.array([[-a[1], 1.0], [-a[2], 0.0]])
        b_k = np.array([b[1] - a[1] * b[0], b[2] - a[2] * b[0]])
        c_k = np.array([1.0, 0.0])
        d_k = b[0]
        m_prev = t.shape[0]
        t = np.block(
            [
                [t, np.zeros((m_prev, 2))],
                [np.outer(b_k, cv).reshape(2, m_prev), a_k],
            ]
        )
        bv = np.concatenate([bv, b_k * d])
        cv = np.concatenate([d_k * cv, c_k])
        d = d_k * d
    return t, bv, cv, d


def iir_to_statespace(b: np.ndarray, a: np.ndarray):
    """Direct-form IIR (b, a) -> controllable-canonical (T, B, C, D), f64."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = b / a[0]
    a = a / a[0]
    order = len(a) - 1
    b = np.concatenate([b, np.zeros(max(0, order + 1 - len(b)))])[: order + 1]
    t = np.zeros((order, order))
    t[0, :] = -a[1:]
    t[1:, :-1] = np.eye(order - 1)
    bv = np.zeros(order)
    bv[0] = 1.0
    cv = b[1:] - a[1:] * b[0]
    d = b[0]
    return t, bv, cv, d


def _block_constants(t, bv, cv, d, block: int):
    """(h, P, Q, T^L) block constants for one state-space filter, f64."""
    m = t.shape[0]
    p = np.zeros((block, m))
    q = np.zeros((m, block))
    tn = np.eye(m)
    for n in range(block):
        p[n] = cv @ tn  # C T^n
        q[:, block - 1 - n] = tn @ bv  # T^n B at column L-1-n
        tn = tn @ t
    h = np.zeros(block)
    h[0] = d
    if block > 1:
        h[1:] = p[: block - 1] @ bv  # C T^{j-1} B
    return h, p, q, tn  # tn == T^L


def _bank_from_statespaces(spaces, block: int) -> BlockFilterBank:
    hs, ps, qs, tls = [], [], [], []
    for t, bv, cv, d in spaces:
        h, p, q, tl = _block_constants(t, bv, cv, d, block)
        hs.append(h)
        ps.append(p)
        qs.append(q)
        tls.append(tl)
    return BlockFilterBank(
        h=np.stack(hs).astype(np.float32),
        p=np.stack(ps).astype(np.float32),
        q=np.stack(qs).astype(np.float32),
        tl=np.stack(tls).astype(np.float32),
    )


def filter_bank_from_sos(
    sos_coeffs: np.ndarray, delays: Tuple[int, ...]
) -> BlockFilterBank:
    """Block filter bank from (N, S, 3, 2) absorption SOS cascades."""
    block = _block_size(delays)
    return _bank_from_statespaces(
        [sos_cascade_to_statespace(np.asarray(sos_coeffs[i]))
         for i in range(sos_coeffs.shape[0])],
        block,
    )


def filter_bank_from_iir(
    iir_coeffs: np.ndarray, delays: Tuple[int, ...]
) -> BlockFilterBank:
    """Block filter bank from (N, order+1, 2) absorption IIR coefficients."""
    block = _block_size(delays)
    return _bank_from_statespaces(
        [iir_to_statespace(iir_coeffs[i, :, 0], iir_coeffs[i, :, 1])
         for i in range(iir_coeffs.shape[0])],
        block,
    )


def filter_bank_from_gains(
    gains: np.ndarray, delays: Tuple[int, ...]
) -> BlockFilterBank:
    """Trivial (stateless) bank for scalar per-line gains — used to drive the
    filtered path with FILTER-mode coupling but broadband absorption."""
    block = _block_size(delays)
    spaces = [
        (np.zeros((1, 1)), np.zeros(1), np.zeros(1), float(g)) for g in gains
    ]
    return _bank_from_statespaces(spaces, block)


def delay_line_outputs_filtered(
    delays: Tuple[int, ...],
    filter_bank: BlockFilterBank,
    feedback: jnp.ndarray,
    input_gains: jnp.ndarray,
    input_signal: jnp.ndarray,
) -> jnp.ndarray:
    """Delay-line outputs Y (T, N) with per-line absorption FILTERS.

    ``feedback``: (N, N) static matrix, or (order, N, N) for FILTER-mode
    polynomial coupling A(z) = sum_o A_o z^-o. Exact — see module notes.
    """
    n = len(delays)
    t_len = input_signal.shape[0]
    m_max = int(max(delays))
    L = filter_bank.block
    assert L <= min(delays), "filter bank block exceeds the minimum delay"
    n_blocks = int(np.ceil(t_len / L))
    t_pad = n_blocks * L

    u = jnp.zeros(t_pad).at[:t_len].set(input_signal)
    x_hist = jnp.zeros((t_pad + m_max, n), jnp.float32)
    offsets = jnp.asarray([m_max - d for d in delays], jnp.int32)
    b = input_gains.astype(jnp.float32)

    poly = feedback.ndim == 3
    if poly:
        order = feedback.shape[0]
        a_t = jnp.transpose(feedback, (0, 2, 1)).astype(jnp.float32)
    else:
        order = 1
        a_t = feedback.T.astype(jnp.float32)

    # filter constants (f32); the rFFT of h is computed in-program so no
    # complex constant crosses the jit boundary (TPU transfer limitation)
    hf = jnp.fft.rfft(jnp.asarray(filter_bank.h), 2 * L, axis=-1).T  # (L+1, N)
    p_c = jnp.asarray(filter_bank.p)  # (N, L, m)
    q_c = jnp.asarray(filter_bank.q)  # (N, m, L)
    tl_c = jnp.asarray(filter_bank.tl)  # (N, m, m)
    m_state = p_c.shape[-1]

    def body(carry, blk):
        x_hist, s, y_tail = carry
        start = blk * L
        # delayed line signals for this block: u_lines[:, i] = x_i[. - m_i]
        u_lines = jax.vmap(
            lambda col, off: lax.dynamic_slice(col, (start + off,), (L,)),
            in_axes=(1, 0), out_axes=1,
        )(x_hist, offsets)  # (L, N)

        # exact block filtering: within-block convolution + state response
        uf = jnp.fft.rfft(u_lines, 2 * L, axis=0)  # (L+1, N)
        conv = jnp.fft.irfft(uf * hf, 2 * L, axis=0)[:L]  # (L, N)
        y_blk = conv + jnp.einsum("nlm,nm->ln", p_c, s)
        s = jnp.einsum("nab,nb->na", tl_c, s) + jnp.einsum(
            "nml,ln->nm", q_c, u_lines
        )

        u_blk = lax.dynamic_slice(u, (start,), (L,))
        # HIGHEST precision on the recursion matmuls (see delay_line_outputs)
        hi = jax.lax.Precision.HIGHEST
        if poly:
            y_ext = jnp.concatenate([y_tail, y_blk], axis=0)  # (L+order-1, N)
            x_blk = u_blk[:, None] * b[None, :]
            for o in range(order):  # static unroll over the FIR order
                sl = lax.slice(
                    y_ext, (order - 1 - o, 0), (order - 1 - o + L, n)
                )
                x_blk = x_blk + jnp.matmul(sl, a_t[o], precision=hi)
            y_tail = lax.slice(y_ext, (L, 0), (L + order - 1, n))
        else:
            x_blk = (
                jnp.matmul(y_blk, a_t, precision=hi)
                + u_blk[:, None] * b[None, :]
            )
        x_hist = lax.dynamic_update_slice(x_hist, x_blk, (start + m_max, 0))
        return (x_hist, s, y_tail), y_blk

    init = (
        x_hist,
        jnp.zeros((n, m_state), jnp.float32),
        jnp.zeros((order - 1, n), jnp.float32),
    )
    _, y_blocks = lax.scan(body, init, jnp.arange(n_blocks))
    return y_blocks.reshape(t_pad, n)[:t_len]


def synthesize_rirs_time_domain_filtered(
    delays: Tuple[int, ...],
    filter_bank: BlockFilterBank,
    feedback: jnp.ndarray,
    input_gains: jnp.ndarray,
    output_gains: jnp.ndarray,
    num_samples: int,
    direct_gains: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Alias-free RIR synthesis with filtered absorption: (B, num_samples).

    The delay-line run is shared across the batch of output-gain vectors
    (B, N); the per-position mix is one MXU matmul.
    """
    impulse = jnp.zeros(num_samples, jnp.float32).at[0].set(1.0)
    y = delay_line_outputs_filtered(
        delays, filter_bank, feedback, input_gains, impulse
    )
    out = (y @ output_gains.T).T
    if direct_gains is not None:
        out = out + direct_gains[:, None] * impulse[None, :]
    return out
