#!/usr/bin/env python
"""Colouration of filtered-and-summed subband GFDNs.

The reference studies this in ``notebooks/investigate_fdn_colouration.ipynb``:
subband decomposition trains one GFDN per octave band and reconstructs the
full-band RIR as a filtered sum — how much spectral colouration does each
reconstruction strategy add? Reproduced here on this framework's
frequency-sampled loop response and filterbank ops:

1. **Plain sum** of the 8 subband GFDN responses — bands overlap and beat
   against each other; strongest colouration.
2. **Amplitude-preserving filterbank sum** ``sum_b W_b(f) H_b(f)`` with the
   reconstructing fractional-octave bank
   (:func:`ops.filterbanks.subband_filter_response`) — the production
   reconstruction used by subband training and inference.
3. **Time-reversed (dual) filterbank** filtering of the per-band
   time-domain RIRs (:func:`ops.filterbanks.time_reversed_filtering`) —
   the notebook's zero-phase alternative; magnitude-squared weighting at
   the cost of doubled filter length.

Two quantitative readouts (the notebook's visual comparisons made
numeric):

* **colouration** — the standard deviation (dB) of the summed magnitude
  response over the passband after removing the octave-scale trend
  (spectral ripple). A plain sum of 8 full-band FDNs *averages* their
  ripple, so it can look flattest — but it is WRONG in time:
* **per-band decay** — each subband GFDN carries its band's prescribed
  T60. In the plain sum every band region also receives the slow
  low-band FDN's energy, so high-band decay is contaminated toward the
  LONGEST T60; the filtered sums restore the prescribed per-band decay.
  Measured as the top-band Schroeder decay over the synthesis window.

Run: python examples/fdn_colouration.py [--out /tmp/colouration.png]
     [--nfft 16384]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def band_responses(nfft=16384, fs=32000.0, seed=0):
    """Frequency responses (num_bands, F) of 8 per-band GFDNs + the bank."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.models.feedback_loop import FeedbackLoop
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response

    centres = [62.5 * 2.0 ** k for k in range(8)]
    # a plausible room: T60 falling with frequency (1.2 s at 62.5 Hz down
    # to ~0.28 s at 8 kHz — typical air/material HF absorption)
    t60s = 1.2 * (np.asarray(centres) / 62.5) ** -0.3
    delays = (241, 311, 379, 433, 509, 587)
    f = nfft // 2 + 1
    # complex stays INSIDE jit and crosses the device boundary as re/im
    # planes: this TPU backend has no eager complex ops or transfers
    z_host = np.exp(1j * np.linspace(0.0, np.pi, f)).astype(np.complex64)
    z_ri = jnp.asarray(np.stack([z_host.real, z_host.imag], -1))

    resps = []
    for b, fc in enumerate(centres):
        gains = np.asarray(
            decay_times_to_gain_per_sample(t60s[b], np.asarray(delays), fs)
        )
        loop = FeedbackLoop(
            sample_rate=fs, num_groups=1,
            num_delay_lines_per_group=len(delays), delays=delays,
            gains=gains,
        )
        params = jax.jit(
            lambda k, zri, lp=loop: lp.init(k, zri[..., 0] + 1j * zri[..., 1])
        )(jax.random.PRNGKey(seed + b), z_ri)

        @jax.jit
        def h_of(p, zri, lp=loop):
            pm = lp.apply(p, zri[..., 0] + 1j * zri[..., 1])
            h = jnp.sum(pm, axis=(1, 2)) / len(delays)
            return jnp.stack([jnp.real(h), jnp.imag(h)], -1)

        hri = np.asarray(h_of(params, z_ri))
        resps.append(hri[..., 0] + 1j * hri[..., 1])
    h_bands = np.stack(resps)  # (8, F) complex

    w_bands = np.stack([
        subband_filter_response(fc, (min(centres), max(centres)), 1, fs, nfft)
        for fc in centres
    ])  # (8, F) complex
    return np.asarray(centres), h_bands, w_bands, t60s


def band_decay_db(h, w_band, nfft, fs, t_frac=(0.1, 0.9),
                  undo_delay_samps=0):
    """Schroeder decay (dB) of a band-filtered response over the window.

    ``h``: full-band response (F,) complex; ``w_band``: the band filter
    response (F,) — applied ZERO-PHASE (|W|) so the extraction itself adds
    no group delay to the decay measurement. ``undo_delay_samps`` removes
    a known linear-phase delay already inside ``h`` (the reconstruction
    bank's n_samples/2) so the windowed EDC is not shifted/wrapped.
    Returns the dB drop of the band EDC between the two time fractions —
    larger magnitude = faster in-band decay.
    """
    h = np.asarray(h)
    if undo_delay_samps:
        freqs = np.fft.rfftfreq(nfft, d=1.0 / fs)
        h = h * np.exp(2j * np.pi * freqs * undo_delay_samps / fs)
    rir = np.fft.irfft(h * np.abs(np.asarray(w_band)), nfft)
    e = np.cumsum(rir[::-1] ** 2)[::-1]
    e = e / (e[0] + 1e-30)
    i0, i1 = int(t_frac[0] * nfft), int(t_frac[1] * nfft)
    return 10.0 * np.log10(e[i1] + 1e-30) - 10.0 * np.log10(e[i0] + 1e-30)


def colouration_db(mag, freqs, lo, hi):
    """Std of the dB magnitude over [lo, hi] Hz (smoothed trend removed)."""
    sel = (freqs >= lo) & (freqs <= hi)
    db = 20.0 * np.log10(np.abs(mag[sel]) + 1e-12)
    # remove the slow trend (octave-scale moving average) so only
    # colouration ripple is scored
    k = max(len(db) // 64, 8)
    trend = np.convolve(db, np.ones(k) / k, mode="same")
    return float(np.std(db - trend))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/colouration.png")
    ap.add_argument("--nfft", type=int, default=16384)
    ap.add_argument("--fs", type=float, default=32000.0)
    args = ap.parse_args(argv)

    from diffgfdn_tpu.ops.filterbanks import (
        reconstructing_fractional_octave_bands,
        time_reversed_filtering,
    )

    centres, h_bands, w_bands, t60s = band_responses(args.nfft, args.fs)
    freqs = np.fft.rfftfreq(args.nfft, d=1.0 / args.fs)

    plain = h_bands.sum(0)
    filtered = (w_bands * h_bands).sum(0)

    # time-reversed dual filterbank on the per-band TD RIRs
    rirs = np.fft.irfft(h_bands, args.nfft, axis=-1).T  # (T, 8)
    coeffs, _ = reconstructing_fractional_octave_bands(
        1, (min(centres), max(centres)), n_samples=2 ** 12,
        sampling_rate=args.fs,
    )
    tr = time_reversed_filtering(rirs, coeffs).sum(-1)
    tr_mag = np.fft.rfft(tr[: args.nfft])

    lo, hi = centres[0], min(centres[-1], args.fs / 2 * 0.9)
    # linear-phase delays to undo in the decay measurement: the
    # reconstruction FIRs carry n_samples/2 group delay; the time-reversed
    # dual's energy sits at the same offset (conjugate linear phase mod
    # fft_size)
    n0 = coeffs.shape[-1] // 2
    rows = [
        ("plain sum", plain, 0),
        ("filterbank sum", filtered, n0),
        ("time-reversed filterbank", tr_mag, n0),
    ]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 4.2))
    print(f"colouration (dB std of detrended magnitude, {lo:.0f}-{hi:.0f} Hz)"
          " / top-band decay over the window (dB):")
    w_top = w_bands[-1]
    for name, h, delay in rows:
        c = colouration_db(h, freqs, lo, hi)
        d = band_decay_db(h, w_top, args.nfft, args.fs,
                          undo_delay_samps=delay)
        ax.semilogx(freqs[1:], 20 * np.log10(np.abs(h[1:]) + 1e-12),
                    lw=0.9, label=f"{name} ({c:.2f} dB ripple)")
        print(f"  {name:28s} ripple {c:5.2f}   top-band decay {d:7.1f}")
    d_ref = band_decay_db(h_bands[-1], w_top, args.nfft, args.fs)
    print(f"  {'(top-band GFDN alone)':28s} {'':14s}"
          f" top-band decay {d_ref:7.1f}")
    ax.set_xlim(lo / 1.5, hi * 1.1)
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("|H| (dB)")
    ax.legend(fontsize=8)
    ax.set_title("summed subband GFDN responses")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
