#!/usr/bin/env python
"""Can the EDR loss be computed from DFT bins without an explicit STFT?

The reference asks this in ``notebooks/check_edr_loss.ipynb``: the EDR loss
needs STFT bins ``H(k, m)`` of the RIR, but training only has the DFT bins
``H(k)``. The notebook tries the convolution-rule shortcut — modulate the
spectrum by ``e^{-j w mR}`` per hop and multiply by the window's DFT — and
concludes: **"This does not give a good match since we are using the DFT of
the signal, and not its DTFT."** Multiplying sampled spectra is CIRCULAR
time-domain convolution, and truncating the product to the first ``nfft``
bins is not windowing — so the loss pipeline must irfft to time first,
which is exactly what ``losses/gfdn.py``'s ``edr_loss`` does (reference:
losses.py:430-451).

This script reproduces both constructions on a synthetic two-slope RIR,
saves the true-STFT EDR next to the DFT-shortcut "EDR", and quantifies the
mismatch; ``tests/test_examples.py`` pins the conclusion (the shortcut's
EDR error is orders of magnitude above the true STFT's numerical noise).

Run: python examples/check_edr_loss.py [--out /tmp/check_edr]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_rir(fs=8000.0, dur_s=0.25, decay_times=(0.08, 0.15), seed=0):
    """Two-slope shaped-noise RIR + its rFFT (the training-side data)."""
    import jax

    from diffgfdn_tpu.ops.basic import shaped_wgn

    n = int(dur_s * fs)
    rir = np.asarray(
        shaped_wgn(
            np.array([[0.7, 0.3]], np.float32),
            np.asarray(decay_times, np.float32),
            n, fs, jax.random.PRNGKey(seed),
        )
    ).reshape(-1)
    return rir, np.fft.rfft(rir)


def stft_edr(rir, win_size=512, hop_size=256):
    """Ground truth: time-domain STFT -> EDR (ops/stft.py, the loss path)."""
    import jax.numpy as jnp

    from diffgfdn_tpu.ops.stft import edr_from_stft, stft

    s = stft(jnp.asarray(rir, jnp.float32), win_size, hop_size)
    return np.asarray(edr_from_stft(s))  # (F, T) dB


def dft_shortcut_edr(response, win_size=512, hop_size=256):
    """The notebook's convolution-rule shortcut, faithfully reproduced.

    Per hop m: modulate the rFFT spectrum by e^{-j w m R}, multiply by the
    window's rFFT, keep the first win_size//2+1 bins as that frame's
    "spectrum" (check_edr_loss.ipynb, get_custom_stft_from_dft).
    """
    num_freq_bins = 2 * (len(response) - 1)
    omega = 2.0 * np.pi * np.fft.rfftfreq(num_freq_bins)
    window = np.hanning(win_size + 1)[:-1]  # periodic hann, as the loss path
    wresp = np.fft.rfft(window, num_freq_bins)
    num_windows = (num_freq_bins - win_size) // hop_size + 1
    nbins = win_size // 2 + 1
    frames = np.zeros((num_windows, nbins), np.complex64)
    for m in range(num_windows):
        shifted = response * np.exp(-1j * omega * (m * hop_size))
        frames[m] = (shifted * wresp)[:nbins]
    # backward cumulative energy over frames -> "EDR" (dB), frames on axis -1
    p = np.abs(frames.T) ** 2  # (F, T)
    edr = np.flip(np.cumsum(np.flip(p, axis=-1), axis=-1), axis=-1)
    return 10.0 * np.log10(edr + np.finfo(np.float32).tiny)


def run(out_dir="/tmp/check_edr", fs=8000.0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rir, response = make_rir(fs=fs)

    edr_true = stft_edr(rir)
    # same construction from the irfft'd spectrum: numerically identical —
    # the loss path's irfft(H) -> stft is exact, no shortcut needed
    edr_via_irfft = stft_edr(np.fft.irfft(response, len(rir)))
    edr_shortcut = dft_shortcut_edr(response)

    t = min(edr_true.shape[-1], edr_shortcut.shape[-1])
    f = min(edr_true.shape[0], edr_shortcut.shape[0])
    err_irfft = float(np.max(np.abs(edr_true - edr_via_irfft)))
    err_shortcut = float(
        np.mean(np.abs(edr_true[:f, :t] - edr_shortcut[:f, :t]))
    )

    fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
    for ax, e, title in (
        (axes[0], edr_true, "EDR from time-domain STFT"),
        (axes[1], edr_shortcut[:f, :t], "EDR from DFT shortcut"),
    ):
        im = ax.imshow(e, aspect="auto", origin="lower", cmap="magma")
        ax.set_title(title)
        ax.set_xlabel("frame")
    axes[0].set_ylabel("frequency bin")
    fig.colorbar(im, ax=axes, label="dB")
    fig.savefig(out / "edr_comparison.png", dpi=120)
    plt.close(fig)

    print(f"irfft->STFT EDR max error:      {err_irfft:.2e} dB (exact)")
    print(f"DFT-shortcut EDR mean error:    {err_shortcut:.2f} dB (invalid)")
    return {"err_irfft_db": err_irfft, "err_shortcut_db": err_shortcut}


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/check_edr")
    args = parser.parse_args()
    run(args.out)
