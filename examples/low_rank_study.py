#!/usr/bin/env python
"""Rank-1 CS amplitude decomposition drives a TRAINED-FREE GFDN render.

The reference's ``notebooks/low_rank_amplitude_matrix_decomposition.ipynb``
factors the (num_src x num_rec) common-slopes amplitude matrix per slope
with a rank-1 SVD (``low_rank_decomp.py:24-266``) and uses the factors as
the input/output gains of a DiffGFDNSinglePos WITHOUT ANY TRAINING — the
claim being that position dependence separates into source gains x
receiver gains, so one decomposition renders the whole grid.

This script reproduces the study end-to-end with this framework:

1. synthesize a near-rank-1 multi-source CS amplitude tensor on the
   three-room grid (the product structure + small perturbation);
2. ``low_rank.get_source_receiver_gains`` -> per-slope source/receiver
   gains + explained-variance ratios (near 1 when the separation holds);
3. calibrate each group's kernel energy scale rho_k ONCE from a unit-gain
   probe's Schroeder EDC (closed form — the role of the reference
   trainer's sub-FDN energy normalization, trainer.py:317-332), then
   render every (src, rec) pair through ``synthesize_rirs_time_domain``
   — the production time-domain core — with the rank-1 gains as
   input/output scalars, NO training anywhere;
4. compare each rendered RIR's EDC (dB) against the ANALYTIC common-
   slopes EDC of the true amplitudes, and plot the per-receiver error
   over the floor plan — the reference's ``plot_edc_error_in_space``.

``tests/test_examples.py`` pins: explained ratio > 0.95 on near-rank-1
data, and the trained-free render's EDC tracks the true CS EDC within a
few dB across the grid.

Run: python examples/low_rank_study.py [--out /tmp/low_rank]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FS = 8000.0
DECAYS = (0.05, 0.25, 0.12)  # well-separated slopes (one per room)
DELAYS = (163, 179, 191, 211, 223, 227, 233, 239, 251, 257, 263, 269)
NUM_GROUPS = 3


def make_amplitudes(num_src=3, seed=0):
    """Near-rank-1 (num_src, num_rec, num_slopes) CS amplitude tensor."""
    from diffgfdn_tpu.data.room_dataset import (
        THREE_ROOM_DIMS,
        THREE_ROOM_START,
    )
    from diffgfdn_tpu.data.synthetic import (
        room_centers,
        synthesize_amplitudes,
    )

    rng = np.random.RandomState(seed)
    rec = []
    for k in range(3):
        x = rng.uniform(THREE_ROOM_START[k][0] + 0.3,
                        THREE_ROOM_START[k][0] + THREE_ROOM_DIMS[k][0] - 0.3,
                        8)
        y = rng.uniform(THREE_ROOM_START[k][1] + 0.3,
                        THREE_ROOM_START[k][1] + THREE_ROOM_DIMS[k][1] - 0.3,
                        8)
        rec.append(np.stack([x, y, np.full(8, 1.5)], axis=-1))
    rec_pos = np.concatenate(rec)
    rec_amps = synthesize_amplitudes(rec_pos, seed)  # (R, 3)

    centers = room_centers()
    src_pos = np.concatenate(
        [centers + rng.randn(3, 2) * 0.3, np.full((3, 1), 1.5)], axis=-1
    )[:num_src]
    src_amps = synthesize_amplitudes(src_pos, seed + 1)  # (S, 3)

    # product structure (rank-1 per slope) + 3% multiplicative noise
    amps = src_amps[:, None, :] * rec_amps[None, :, :]
    amps *= 1.0 + 0.03 * rng.randn(*amps.shape)
    return np.maximum(amps, 1e-6), rec_pos, src_pos


def _gfdn_statics(seed=1):
    """Per-line absorption gains + block-diagonal orthogonal mixing."""
    import jax.numpy as jnp

    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.unitary import orthogonal_from_skew

    rng = np.random.RandomState(seed)
    nper = len(DELAYS) // NUM_GROUPS
    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            DECAYS[k], np.asarray(DELAYS[k * nper:(k + 1) * nper]), FS))
        for k in range(NUM_GROUPS)
    ]).astype(np.float32)
    a = np.zeros((len(DELAYS), len(DELAYS)), np.float32)
    for k in range(NUM_GROUPS):
        blk = np.asarray(orthogonal_from_skew(
            jnp.asarray(rng.randn(nper, nper), jnp.float32)))
        a[k * nper:(k + 1) * nper, k * nper:(k + 1) * nper] = blk
    return gains, a, nper


def _calibrate_group_energies(gains, a, nper, t_len, t0):
    """Kernel energy scale rho_k per group from a unit-gain probe's EDC.

    After the onset ramp the group-k probe's energy envelope is
    ``rho_k e^{-lam_k t}``, so its Schroeder EDC obeys
    ``EDC(t0) = rho_k (fs / lam_k) e^{-lam_k t0}`` — one closed-form read,
    no decay fitting (NNLS on GFDN onset ramps is ill-conditioned)."""
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.tdgfdn import synthesize_rirs_time_domain
    from diffgfdn_tpu.ops.basic import LOG10E6

    lam = LOG10E6 / np.asarray(DECAYS)
    b1 = np.ones(len(DELAYS), np.float32) / np.sqrt(nper)
    c0 = np.zeros((NUM_GROUPS, len(DELAYS)), np.float32)
    for k in range(NUM_GROUPS):
        c0[k, k * nper:(k + 1) * nper] = 1.0 / np.sqrt(nper)
    probes = np.asarray(synthesize_rirs_time_domain(
        DELAYS, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b1),
        jnp.asarray(c0), t_len,
    ))
    t = np.arange(t_len) / FS
    rho = np.zeros(NUM_GROUPS)
    for k in range(NUM_GROUPS):
        edc = np.flip(np.cumsum(np.flip(probes[k] ** 2)))
        rho[k] = edc[t0] * lam[k] / FS * np.exp(lam[k] * t[t0])
    return rho, lam


def run(out_dir="/tmp/low_rank", seed=0):
    import jax.numpy as jnp

    from diffgfdn_tpu.data.room_dataset import (
        THREE_ROOM_DIMS,
        THREE_ROOM_START,
    )
    from diffgfdn_tpu.kernels.tdgfdn import synthesize_rirs_time_domain
    from diffgfdn_tpu.low_rank import get_source_receiver_gains
    from diffgfdn_tpu.utils.plot import plot_position_map

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    amps, rec_pos, src_pos = make_amplitudes(seed=seed)
    num_src, num_rec, _ = amps.shape

    g_in, g_out, explained = get_source_receiver_gains(amps)
    print("explained variance per slope:", np.round(explained, 4))

    gains, a, nper = _gfdn_statics(seed + 1)
    t_len = int(4.0 * max(DECAYS) * FS)
    t0 = int(0.06 * FS)  # past the echo-density onset ramp
    t1 = int(2.0 * max(DECAYS) * FS)  # before the truncation tail
    rho, lam = _calibrate_group_energies(gains, a, nper, t_len, t0)
    t = np.arange(t_len) / FS

    # render all (src, rec) pairs trained-free: per-group input taps
    # sqrt(g_in/rho), output taps sqrt(g_out) -> rendered energy envelope
    # is g_in*g_out*e^{-lam t} by construction
    edc_err = np.zeros((num_src, num_rec))
    for s in range(num_src):
        b_vec = np.repeat(
            np.sqrt(np.maximum(g_in[s], 1e-9) / rho), nper
        ).astype(np.float32) / np.sqrt(nper)
        c_mat = np.repeat(
            np.sqrt(np.maximum(g_out, 1e-9)), nper, axis=1
        ).astype(np.float32) / np.sqrt(nper)
        rendered = np.asarray(synthesize_rirs_time_domain(
            DELAYS, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b_vec),
            jnp.asarray(c_mat), t_len,
        ))  # (num_rec, T)
        edc = np.flip(np.cumsum(np.flip(rendered ** 2, axis=-1), axis=-1),
                      axis=-1)
        # analytic common-slopes EDC of the TRUE amplitudes
        target = (amps[s] / lam * FS) @ np.exp(-np.outer(lam, t))
        d = 10.0 * np.log10(edc[:, t0:t1] + 1e-30) - 10.0 * np.log10(
            target[:, t0:t1] + 1e-30
        )
        edc_err[s] = np.mean(np.abs(d), axis=-1)
    mean_err = float(np.mean(edc_err))
    print(f"mean |EDC error| of the trained-free render: {mean_err:.2f} dB")

    plot_position_map(
        rec_pos, edc_err.mean(axis=0),
        list(THREE_ROOM_DIMS), list(THREE_ROOM_START),
        title="rank-1 trained-free render: EDC error", cbar_label="dB",
        save_path=str(out / "low_rank_edc_error_map.png"),
    )
    return {
        "explained": explained,
        "mean_edc_err_db": mean_err,
        "num_src": num_src,
        "num_rec": num_rec,
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/low_rank")
    args = parser.parse_args()
    print(run(args.out))
