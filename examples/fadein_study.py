#!/usr/bin/env python
"""Fade-in behaviour of coupled-room GFDNs.

The reference studies this in ``notebooks/investigate_fadein_behaviour.ipynb``:
coupled rooms with no source-listener line of sight show a FADE-IN — the
RIR envelope is a *difference* of exponentials, rising with the shorter
decay rate and falling with the longer one (the convolution of the two
rooms' exponential kernels). The questions the notebook answers, reproduced
here with this framework's time-domain synthesis core:

1. The analytic target: ``conv(e^{-d1 t}, e^{-d2 t}) ∝ e^{-d2 t} - e^{-d1 t}``
   (d1 > d2) — fade-in slope set by the SHORTER T60, fade-out by the longer.
2. A 2-group GFDN reproduces it exactly when the group output weights have
   OPPOSITE SIGNS with magnitudes ``1/sqrt(|d2 - d1|)`` — the summed output
   is the weighted difference of the two groups' exponential envelopes.
3. Inter-group coupling in the feedback matrix produces the same effect:
   in the first echoes the cross-terms subtract energy, so even same-sign
   output taps fade in when the coupling angle is nonzero.

Every synthesized case runs through
:func:`diffgfdn_tpu.kernels.tdgfdn.synthesize_rirs_time_domain` — the same
scan/Pallas core production RIR synthesis uses — with all four cases
batched into ONE call (the B axis), not one run per case as in the
notebook.

Run: python examples/fadein_study.py [--out /tmp/fadein.png] [--fs 16000]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synthesize_cases(fs=16000.0, t60s=(0.25, 0.9), dur_s=0.7, seed=0):
    """Return (t, rirs dict, analytic envelope, first-arrival time, u).

    ``u`` is the shared LOSSLESS 4-line kernel: with both groups sharing
    delays and mixing matrix, every synthesized case factors exactly as
    ``sum_g c_g e^{-d_g t} u(t)`` — the +/- tap case is the
    difference-of-exponentials fade-in modulating ``u`` sample-for-sample.
    """
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.tdgfdn import synthesize_rirs_time_domain
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.unitary import orthogonal_from_skew

    rng = np.random.RandomState(seed)
    # BOTH groups share delays AND mixing matrix: their echo patterns are
    # then sample-coherent and differ only in the per-echo decay, so the
    # +/- tap difference cancels echo-by-echo at onset — the notebook's
    # condition for exact difference-of-exponentials fade-in. Independent
    # group structures give incoherent tails whose powers ADD (no fade-in).
    # short delays: the first echo must arrive well BEFORE the fade-in
    # peak t* = ln(d1/d2)/(d1-d2) (~64 ms for these T60s), and the echo
    # field must densify quickly, or the rising envelope is invisible
    base = (31, 43, 57, 73)
    delays = base + base
    nper = 4
    num = int(dur_s * fs)

    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            t60s[g], np.asarray(base), fs))
        for g in range(2)
    ]).astype(np.float32)

    # shared orthogonal mixing + scalar coupling Phi kron I (the model's
    # SCALAR coupling structure, models/feedback_loop.py)
    skew = jnp.asarray(rng.randn(1, nper, nper).astype(np.float32) * 0.5)
    block = np.asarray(orthogonal_from_skew(skew))[0]
    blocks = np.stack([block, block])

    def coupled(theta):
        phi = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]], np.float32)
        a = np.zeros((8, 8), np.float32)
        for g in range(2):
            for h in range(2):
                a[g * nper:(g + 1) * nper, h * nper:(h + 1) * nper] = (
                    phi[g, h] * blocks[h]
                )
        return a

    b_in = np.full(8, 1.0 / np.sqrt(8), np.float32)
    d = 3.0 * np.log(10) / np.asarray(t60s)  # decay rates (1/s)
    w = 1.0 / np.sqrt(abs(d[1] - d[0]))
    c_cases = np.stack([
        np.full(8, 0.35, np.float32),                          # same-sign taps
        np.concatenate([np.full(4, w), np.full(4, -w)]) * 0.2,  # +/- difference
        np.full(8, 0.35, np.float32),                          # same-sign, coupled
        np.concatenate([np.full(4, w), np.full(4, -w)]) * 0.2,  # +/- , coupled
    ]).astype(np.float32)

    # one batched synthesis per feedback matrix (cases share the core)
    rirs = {}
    y0 = np.asarray(synthesize_rirs_time_domain(
        delays, jnp.asarray(gains), jnp.asarray(coupled(0.0)),
        jnp.asarray(b_in), jnp.asarray(c_cases[:2]), num))
    yc = np.asarray(synthesize_rirs_time_domain(
        delays, jnp.asarray(gains), jnp.asarray(coupled(np.pi / 5)),
        jnp.asarray(b_in), jnp.asarray(c_cases[2:]), num))
    rirs["uncoupled, same-sign taps"] = y0[0]
    rirs["uncoupled, +/- taps"] = y0[1]
    rirs["coupled (36deg), same-sign taps"] = yc[0]
    rirs["coupled (36deg), +/- taps"] = yc[1]

    # the shared lossless kernel (gains = 1) of ONE 4-line group
    u = np.asarray(synthesize_rirs_time_domain(
        base, jnp.ones(nper, jnp.float32), jnp.asarray(blocks[0]),
        jnp.asarray(b_in[:nper]), jnp.ones((1, nper), jnp.float32), num))[0]

    t = np.arange(num) / fs
    # envelopes start at the first echo (min delay); the analytic target
    # is anchored there too
    t0 = min(delays) / fs
    ts = np.maximum(t - t0, 0.0)
    analytic = np.exp(-d[1] * ts) - np.exp(-d[0] * ts)
    analytic /= analytic.max()
    return t, rirs, analytic, t0, u


def envelope_db(x, win):
    """Moving-RMS envelope in dB, unit peak."""
    e = np.convolve(x ** 2, np.ones(win) / win, mode="same")
    e = np.sqrt(np.maximum(e, 1e-30))
    return 20.0 * np.log10(e / e.max() + 1e-15)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fadein.png")
    ap.add_argument("--fs", type=float, default=16000.0)
    args = ap.parse_args(argv)

    t, rirs, analytic, t0, u = synthesize_cases(fs=args.fs)
    win = int(0.01 * args.fs)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.2))
    for name, rir in rirs.items():
        axes[0].plot(t, envelope_db(rir, win), lw=1.2, label=name)
    axes[0].plot(t, 20 * np.log10(analytic + 1e-15), "k--", lw=1.5,
                 label="analytic $e^{-d_2 t} - e^{-d_1 t}$")
    axes[0].set_ylim(-70, 3)
    axes[0].set_xlabel("time (s)")
    axes[0].set_ylabel("envelope (dB)")
    axes[0].legend(fontsize=7)
    axes[0].set_title("RIR envelopes")

    zoom = t < t0 + 0.12
    for name, rir in rirs.items():
        axes[1].plot(t[zoom], envelope_db(rir, win)[zoom], lw=1.2)
    axes[1].plot(t[zoom], 20 * np.log10(analytic + 1e-15)[zoom], "k--", lw=1.5)
    axes[1].set_xlabel("time (s)")
    axes[1].set_title("early window: fade-in")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")

    # the EXACT identity behind the fade-in: with shared structure the
    # +/- case is (e^{-d2 t} - e^{-d1 t}) modulating the lossless kernel
    d = 3.0 * np.log(10) / np.asarray((0.25, 0.9))
    w = 0.2 / np.sqrt(abs(d[1] - d[0]))
    pred = w * (np.exp(-d[0] * t) - np.exp(-d[1] * t)) * u
    got = rirs["uncoupled, +/- taps"]
    err = np.max(np.abs(got - pred)) / (np.max(np.abs(got)) + 1e-30)
    print(f"difference-of-exponentials identity: max err "
          f"{err:.2e} of peak (f32 rounding compounds over the recursion)")
    # fade-in vs fade-out: energy-envelope peak time relative to arrival
    for name in ("uncoupled, +/- taps", "uncoupled, same-sign taps"):
        env = envelope_db(rirs[name], win)
        print(f"  {name}: envelope peaks {t[np.argmax(env)] - t0:+.3f} s "
              "after first arrival")


if __name__ == "__main__":
    main()
