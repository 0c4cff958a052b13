"""Plot diagnostics (matplotlib, host-side).

The reference's primary observability surface is matplotlib figure dumps
(plot.py:39-1207, spatial_sampling/solver.py:265-448). This module covers
the load-bearing subset: loss curves, EDC/EDR comparisons, magnitude
responses, T60 absorption-filter fits, spectrograms, floor-plan scatter
maps of amplitudes / EDC errors, and room-geometry drawing.
"""

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..ops.basic import db_np


def save_or_show(fig, save_path: Optional[str] = None):
    if save_path is not None:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=150)
        plt.close(fig)
    return fig


def plot_loss_curves(
    train_loss: Sequence[float],
    valid_loss: Optional[Sequence[float]] = None,
    individual: Optional[List[dict]] = None,
    save_path: Optional[str] = None,
):
    """Composite + per-term loss curves (reference: save_results.py:92-138)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(train_loss, label="train")
    if valid_loss is not None and len(valid_loss):
        ax.plot(valid_loss, label="valid")
    if individual:
        keys = individual[0].keys()
        for k in keys:
            ax.plot([d[k] for d in individual], "--", alpha=0.6, label=k)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    ax.grid(alpha=0.3)
    return save_or_show(fig, save_path)


def plot_edc_comparison(
    rirs: np.ndarray,
    labels: Sequence[str],
    fs: float,
    save_path: Optional[str] = None,
):
    """Overlay Schroeder EDCs of several RIRs in dB."""
    fig, ax = plt.subplots(figsize=(7, 4))
    for rir, label in zip(rirs, labels):
        edc = np.flip(np.cumsum(np.flip(np.asarray(rir) ** 2)))
        edc = edc / (edc[0] + 1e-12)
        t = np.arange(len(edc)) / fs
        ax.plot(t, 10 * np.log10(edc + 1e-12), label=label)
    ax.set_xlabel("time [s]")
    ax.set_ylabel("EDC [dB]")
    ax.set_ylim(-80, 5)
    ax.legend()
    ax.grid(alpha=0.3)
    return save_or_show(fig, save_path)


def plot_magnitude_response(
    responses: np.ndarray,
    freqs_hz: np.ndarray,
    labels: Sequence[str],
    save_path: Optional[str] = None,
):
    """Magnitude responses on a log-frequency axis."""
    fig, ax = plt.subplots(figsize=(7, 4))
    for resp, label in zip(np.atleast_2d(responses), labels):
        ax.semilogx(freqs_hz, db_np(resp), label=label, alpha=0.8)
    ax.set_xlabel("frequency [Hz]")
    ax.set_ylabel("magnitude [dB]")
    ax.legend()
    ax.grid(alpha=0.3, which="both")
    return save_or_show(fig, save_path)


def plot_t60_filter_response(
    band_centre_hz: np.ndarray,
    target_gains: np.ndarray,
    num_coeffs: np.ndarray,
    den_coeffs: np.ndarray,
    fs: float,
    save_path: Optional[str] = None,
):
    """Absorption-filter fits vs per-band targets (plot.py:39-100 parity)."""
    from ..ops.biquad import sos_response_np

    freqs = np.geomspace(20.0, fs / 2 * 0.95, 512)
    fig, ax = plt.subplots(figsize=(7, 4))
    num_lines = num_coeffs.shape[1] if num_coeffs.ndim == 3 else 1
    for i in range(min(num_lines, 8)):
        if num_coeffs.ndim == 3:  # (n_sections, n_lines, 3)
            sos = np.concatenate(
                [num_coeffs[:, i, :], den_coeffs[:, i, :]], axis=-1
            )
        else:
            sos = np.concatenate([num_coeffs, den_coeffs], axis=-1)
        resp = sos_response_np(sos, freqs, fs)
        ax.semilogx(freqs, db_np(resp), alpha=0.7, label=f"line {i}")
        ax.semilogx(
            band_centre_hz, db_np(np.atleast_2d(target_gains)[min(
                i, np.atleast_2d(target_gains).shape[0] - 1)]), "o"
        )
    ax.set_xlabel("frequency [Hz]")
    ax.set_ylabel("gain [dB]")
    ax.set_title("absorption filter fits")
    ax.grid(alpha=0.3, which="both")
    return save_or_show(fig, save_path)


def plot_spectrogram(
    rir: np.ndarray,
    fs: float,
    win: int = 512,
    save_path: Optional[str] = None,
):
    """Log-magnitude spectrogram of an RIR."""
    from scipy.signal import stft as scipy_stft

    f, t, s = scipy_stft(rir, fs=fs, nperseg=win)
    fig, ax = plt.subplots(figsize=(7, 4))
    im = ax.pcolormesh(
        t, f, 20 * np.log10(np.abs(s) + 1e-9), shading="auto", cmap="magma"
    )
    fig.colorbar(im, ax=ax, label="dB")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("frequency [Hz]")
    return save_or_show(fig, save_path)


def draw_room_boundaries(
    ax,
    room_dims: List,
    room_start_coord: List,
    aperture_coords: Optional[List] = None,
):
    """Draw the coupled-room floor plan (replaces slope2noise.RoomGeometry)."""
    for dims, start in zip(room_dims, room_start_coord):
        rect = plt.Rectangle(
            (start[0], start[1]), dims[0], dims[1],
            fill=False, edgecolor="k", linewidth=1.5,
        )
        ax.add_patch(rect)
    if aperture_coords:
        for ap in aperture_coords:
            (x0, y0), (x1, y1) = ap
            ax.plot([x0, x1], [y0, y1], "w-", linewidth=3)
            ax.plot([x0, x1], [y0, y1], "g--", linewidth=1.5)
    ax.set_aspect("equal")
    return ax


def plot_position_map(
    positions: np.ndarray,
    values: np.ndarray,
    room_dims: List,
    room_start_coord: List,
    aperture_coords: Optional[List] = None,
    title: str = "",
    cbar_label: str = "",
    save_path: Optional[str] = None,
):
    """Scatter a per-position quantity over the floor plan.

    Used for CS amplitude maps and EDC-error maps
    (reference: spatial_sampling/solver.py:265-448).
    """
    fig, ax = plt.subplots(figsize=(7, 6))
    draw_room_boundaries(ax, room_dims, room_start_coord, aperture_coords)
    sc = ax.scatter(
        positions[:, 0], positions[:, 1], c=values, cmap="viridis", s=35
    )
    fig.colorbar(sc, ax=ax, label=cbar_label)
    ax.set_title(title)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    return save_or_show(fig, save_path)


def plot_matrix(
    matrix: np.ndarray, title: str = "", save_path: Optional[str] = None
):
    """Heat map of a (coupled feedback) matrix."""
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(np.asarray(matrix), cmap="RdBu_r")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    return save_or_show(fig, save_path)


def order_position_matrices(
    positions: np.ndarray, values: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Sort positions (and a parallel value array) in raster x/y order.

    Reference: plot.py (order_position_matrices) — stable lexicographic sort
    by (y, x) so per-position matrices can be displayed as grids.
    """
    order = np.lexsort((positions[:, 0], positions[:, 1]))
    return positions[order], values[order]


def plot_edr_error_map(
    positions: np.ndarray,
    edr_errors_db: np.ndarray,
    room_dims: List,
    room_start_coord: List,
    save_path: Optional[str] = None,
):
    """Mean EDR error per receiver over the floor plan."""
    return plot_position_map(
        positions,
        edr_errors_db,
        room_dims,
        room_start_coord,
        title="mean EDR error",
        cbar_label="dB",
        save_path=save_path,
    )
