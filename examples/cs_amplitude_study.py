#!/usr/bin/env python
"""Statistical structure of common-slopes amplitudes over the grid.

The reference's ``notebooks/analyse_common_slope_amplitudes.ipynb`` asks
two questions about the (num_rec, num_slopes) CS amplitude matrix of the
three-room dataset:

1. **Do the amplitudes cluster by room?** It fits a 3-component Gaussian
   mixture to the per-receiver amplitude vectors, sorts the components by
   mean level, and finds each component collects one room's receivers —
   so plausible amplitude fields for NEW positions can be SAMPLED from
   the room-conditioned GMM (the notebook draws synthetic positions per
   room and samples their amplitudes from the matched component).
2. **How fast do the amplitudes vary in space?** A 2-D spatial rFFT of
   the gridded amplitude map shows the energy concentrated at LOW spatial
   frequencies — the field is smooth, which is what makes a small
   position-conditioned MLP (and coarse receiver grids) sufficient.

Reproduced here on the synthetic three-room dataset: per-band amplitude
maps over the floor plan, GMM fit + room-assignment accuracy, GMM
sampling for fresh positions, and the spatial-spectrum low-pass ratio.
``tests/test_examples.py`` pins both conclusions (assignment accuracy and
low-frequency energy concentration).

Run: python examples/cs_amplitude_study.py [--out /tmp/cs_amps]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sort_gmm_by_means(means, covs, weights):
    """Order components by descending mean level (room 1 = loudest,
    it contains the source; reference notebook, sort_gmm_by_means)."""
    order = np.flip(np.argsort(np.mean(means, axis=-1)))
    return means[order], covs[order], weights[order]


def fit_gmm(data, n_components=3, seed=0):
    """3-component full-covariance GMM (sklearn when present, else EM)."""
    try:
        from sklearn.mixture import GaussianMixture

        gmm = GaussianMixture(
            n_components=n_components, random_state=seed, n_init=3
        ).fit(data)
        return gmm.means_, gmm.covariances_, gmm.weights_
    except ImportError:
        # minimal EM fallback (diagonal-regularized full covariance)
        rng = np.random.RandomState(seed)
        n, d = data.shape
        means = data[rng.choice(n, n_components, replace=False)]
        covs = np.stack([np.cov(data.T) + 1e-6 * np.eye(d)] * n_components)
        w = np.full(n_components, 1.0 / n_components)
        for _ in range(100):
            # E-step: responsibilities
            log_p = np.stack([
                -0.5 * np.sum(
                    (data - means[k]) @ np.linalg.inv(covs[k])
                    * (data - means[k]), axis=1
                )
                - 0.5 * np.linalg.slogdet(covs[k])[1]
                + np.log(w[k])
                for k in range(n_components)
            ])
            log_p -= log_p.max(axis=0)
            r = np.exp(log_p)
            r /= r.sum(axis=0)
            # M-step
            nk = r.sum(axis=1) + 1e-9
            means = (r @ data) / nk[:, None]
            for k in range(n_components):
                diff = data - means[k]
                covs[k] = (r[k][:, None] * diff).T @ diff / nk[k]
                covs[k] += 1e-6 * np.eye(d)
            w = nk / n
        return means, covs, w


def gmm_assign(data, means, covs, weights):
    """Most-likely component per row."""
    log_p = np.stack([
        -0.5 * np.sum(
            (data - means[k]) @ np.linalg.inv(covs[k]) * (data - means[k]),
            axis=1,
        )
        - 0.5 * np.linalg.slogdet(covs[k])[1]
        + np.log(weights[k] + 1e-12)
        for k in range(len(weights))
    ])
    return np.argmax(log_p, axis=0)


def spatial_lowpass_ratio(positions, values, grid_m=0.3, cutoff_cyc_per_m=1.0):
    """Fraction of 2-D spatial-spectrum energy below the cutoff.

    Grids the scattered amplitude samples (nearest interpolation), rfft2s
    the map, and integrates |S|^2 below/above the spatial-frequency cutoff
    (reference notebook, get_2D_fft; DC is excluded from the ratio)."""
    from scipy.interpolate import griddata

    pos = np.asarray(positions)[:, :2]
    x = np.arange(pos[:, 0].min(), pos[:, 0].max() + grid_m, grid_m)
    y = np.arange(pos[:, 1].min(), pos[:, 1].max() + grid_m, grid_m)
    gx, gy = np.meshgrid(x, y, indexing="ij")
    grid = griddata(pos, values, (gx, gy), method="nearest")
    spec = np.fft.rfft2(grid - grid.mean())
    fx = np.fft.fftfreq(grid.shape[0], d=grid_m)
    fy = np.fft.rfftfreq(grid.shape[1], d=grid_m)
    f2 = fx[:, None] ** 2 + fy[None, :] ** 2
    p = np.abs(spec) ** 2
    below = float(p[f2 <= cutoff_cyc_per_m ** 2].sum())
    return below / (p.sum() + 1e-12)


def run(out_dir="/tmp/cs_amps", seed=0):
    import matplotlib

    matplotlib.use("Agg")

    from diffgfdn_tpu.data.room_dataset import (
        THREE_ROOM_DIMS,
        THREE_ROOM_START,
    )
    from diffgfdn_tpu.data.synthetic import synthesize_amplitudes
    from diffgfdn_tpu.utils.plot import plot_position_map

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # dense synthetic receiver grid over the three rooms (one room id each)
    rng = np.random.RandomState(seed)
    rec, room_id = [], []
    for k in range(3):
        n = 60
        x = rng.uniform(THREE_ROOM_START[k][0] + 0.3,
                        THREE_ROOM_START[k][0] + THREE_ROOM_DIMS[k][0] - 0.3,
                        n)
        y = rng.uniform(THREE_ROOM_START[k][1] + 0.3,
                        THREE_ROOM_START[k][1] + THREE_ROOM_DIMS[k][1] - 0.3,
                        n)
        rec.append(np.stack([x, y, np.full(n, 1.5)], axis=-1))
        room_id.append(np.full(n, k))
    pos = np.concatenate(rec)
    room_id = np.concatenate(room_id)
    amps = synthesize_amplitudes(pos, seed)  # (R, 3) energy amplitudes

    # per-"band" amplitude map over the floor plan (the notebook loops
    # octave bands; the synthetic set is broadband -> one map per slope)
    for k in range(3):
        plot_position_map(
            pos, amps[:, k], list(THREE_ROOM_DIMS), list(THREE_ROOM_START),
            title=f"CS amplitude, slope {k + 1}", cbar_label="energy amp",
            save_path=str(out / f"amplitude_map_slope{k + 1}.png"),
        )

    # GMM over per-receiver amplitude vectors -> room clusters
    data = 10.0 * np.log10(amps + 1e-9)  # dB domain separates rooms best
    means, covs, weights = fit_gmm(data, 3, seed)
    means, covs, weights = sort_gmm_by_means(means, covs, weights)
    assign = gmm_assign(data, means, covs, weights)
    # map components -> rooms by majority vote, then score the assignment
    acc = 0
    for comp in range(3):
        members = room_id[assign == comp]
        if len(members):
            acc += int((members == np.bincount(members).argmax()).sum())
    accuracy = acc / len(room_id)
    print(f"GMM room-assignment accuracy: {accuracy:.3f}")

    # sample fresh amplitude vectors from each component (the notebook's
    # generative use: plausible amplitudes for unseen positions)
    samples = {}
    for comp in range(3):
        L = np.linalg.cholesky(covs[comp])
        samples[comp] = means[comp] + rng.randn(10, 3) @ L.T
    spread = float(np.mean([s.std(axis=0).mean() for s in samples.values()]))
    print(f"sampled per-component dB spread: {spread:.2f}")

    # spatial spectrum: smooth field -> energy at low spatial frequencies
    ratios = [
        spatial_lowpass_ratio(pos, amps[:, k]) for k in range(3)
    ]
    print("spatial low-pass energy ratio per slope:",
          np.round(ratios, 4))
    return {
        "accuracy": accuracy,
        "lowpass_ratios": ratios,
        "gmm_means_db": means,
    }


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/cs_amps")
    args = parser.parse_args()
    print(run(args.out))
