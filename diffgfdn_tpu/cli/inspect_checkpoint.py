"""CLI: inspect a trained GFDN checkpoint — the notebook family, runnable.

Consolidates the reference's checkpoint-inspection notebooks into one
command (they share one loop: load checkpoint -> resynthesize -> compare
to the measured RIRs):

* ``investigate_grid_output_full_band_data.ipynb`` /
  ``investigate_grid_output_subband_data*.ipynb`` — grid-wide EDC/EDR
  error maps over the floor plan;
* ``investigate_single_measurement_output_*.ipynb`` /
  ``investigate_test_set_output.ipynb`` — single-position deep dive
  (truncated EDC overlay, EDR waterfalls, normalized echo density) plus
  the learned coupling matrix's diagonal-dominance measure
  (``diagonal_measure`` in the notebook's first cell);
* ``compare_treble_full_band_results.ipynb`` — the same per-position and
  grid comparisons against a common-slopes resynthesis baseline
  (``--cs-baseline``);
* ``plot_test_edc_loss_metric.ipynb`` — loss-curve plots from the run's
  ``losses.mat`` and a final-loss comparison across several train dirs
  (``--compare-runs``).

Usage:
    python -m diffgfdn_tpu.cli.inspect_checkpoint -c cfg.yml
        [--index N | --position x y z] [--split all|test]
        [--max-receivers M] [--out DIR] [--cs-baseline]
        [--compare-runs DIR ...]
"""

import argparse
import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("diffgfdn_tpu")


def diagonal_measure(matrix: np.ndarray) -> float:
    """Ratio of squared diagonal to total energy; 1 = perfectly diagonal.

    (reference: investigate_test_set_output.ipynb, cell 1 — the coupling
    diagnostic: near 1 means the learned feedback matrix barely couples
    the rooms.)
    """
    m = np.asarray(matrix)
    return float(np.sum(np.diag(m) ** 2) / np.sum(m ** 2))


def _edc_db(rirs: np.ndarray, mix: int, crop_end: int) -> np.ndarray:
    """Truncated Schroeder EDC in dB, (..., T') from (..., T)."""
    x = np.asarray(rirs)[..., mix : -crop_end if crop_end else None]
    e = np.flip(np.cumsum(np.flip(x ** 2, axis=-1), axis=-1), axis=-1)
    return 10.0 * np.log10(e + np.finfo(np.float32).tiny)


def _edr_err_db(a: np.ndarray, b: np.ndarray, fs: float) -> np.ndarray:
    """Per-item mean |EDR dB| error between two RIR sets."""
    import jax.numpy as jnp

    from ..ops.stft import edr_from_stft, stft

    win = 512
    ea = np.asarray(edr_from_stft(stft(jnp.asarray(a, jnp.float32), win, win // 2)))
    eb = np.asarray(edr_from_stft(stft(jnp.asarray(b, jnp.float32), win, win // 2)))
    return np.mean(np.abs(ea - eb), axis=(-2, -1))


def inspect(
    config,
    room_data=None,
    rec_index: Optional[int] = None,
    position=None,
    split: str = "all",
    max_receivers: int = 128,
    out_dir: Optional[str] = None,
    cs_baseline: bool = False,
):
    """Run the inspection; returns a dict of computed metrics."""
    from ..data.room_dataset import ThreeRoomDataset
    from ..inference.gfdn_inference import InferDiffGFDN
    from ..ops.basic import ms_to_samps, normalized_echo_density
    from ..utils.plot import (
        plot_edc_comparison,
        plot_edr,
        plot_matrix,
        plot_position_map,
    )

    tc = config.trainer_config
    if room_data is None:
        room_data = ThreeRoomDataset(
            config.room_dataset_path, nfft=tc.num_freq_bins
        )
    out = Path(out_dir or Path(tc.train_dir) / "inspection")
    out.mkdir(parents=True, exist_ok=True)
    fs = room_data.sample_rate
    mix = ms_to_samps(20.0, fs)
    crop_end = ms_to_samps(5.0, fs)

    # -------- receiver subset (reference: fixed seeded test split) --------
    indices = np.arange(room_data.num_rec)
    if split == "test" and tc.hold_out_test_set is not None:
        from ..data.batching import fixed_test_split

        test_idx, _ = fixed_test_split(
            room_data.num_rec,
            tc.hold_out_test_set.ratio,
            tc.hold_out_test_set.seed,
        )
        indices = np.asarray(test_idx)
    if len(indices) > max_receivers:
        indices = indices[
            np.linspace(0, len(indices) - 1, max_receivers).astype(int)
        ]

    infer = InferDiffGFDN(config, room_data)
    synth = infer.rirs_at(indices)
    true = np.asarray(room_data.rirs)[indices]
    t_len = min(synth.shape[-1], true.shape[-1])
    synth, true = synth[..., :t_len], true[..., :t_len]

    # -------------------- grid EDC / EDR error maps ----------------------
    edc_err = np.mean(
        np.abs(_edc_db(true, mix, crop_end) - _edc_db(synth, mix, crop_end)),
        axis=-1,
    )
    edr_err = _edr_err_db(true, synth, fs)
    pos = np.asarray(room_data.receiver_position)[indices]
    plot_position_map(
        pos, edc_err, room_data.room_dims, room_data.room_start_coord,
        title="mean EDC error", cbar_label="dB",
        save_path=str(out / "edc_error_map.png"),
    )
    plot_position_map(
        pos, edr_err, room_data.room_dims, room_data.room_start_coord,
        title="mean EDR error", cbar_label="dB",
        save_path=str(out / "edr_error_map.png"),
    )
    logger.info(
        "mean EDC error %.3f dB / mean EDR error %.3f dB over %d receivers",
        float(np.mean(edc_err)), float(np.mean(edr_err)), len(indices),
    )

    # ------------------- single-position deep dive -----------------------
    if rec_index is None:
        if position is not None:
            d = np.linalg.norm(
                np.asarray(room_data.receiver_position)
                - np.asarray(position, float)[None],
                axis=-1,
            )
            rec_index = int(np.argmin(d))
        else:
            rec_index = int(indices[0])
    where = np.where(indices == rec_index)[0]
    if len(where):
        h_s = synth[int(where[0])]
    else:
        h_s = infer.rirs_at(np.asarray([rec_index]))[0][..., :t_len]
    h_t = np.asarray(room_data.rirs)[rec_index][..., :t_len]
    p = np.asarray(room_data.receiver_position)[rec_index]
    tag = f"{p[0]:.2f}_{p[1]:.2f}_{p[2]:.2f}"

    rir_sets = [h_t[mix:-crop_end], h_s[mix:-crop_end]]
    labels = ["True", "DiffGFDN"]
    metrics = {
        "mean_edc_err_db": float(np.mean(edc_err)),
        "mean_edr_err_db": float(np.mean(edr_err)),
        "rec_index": rec_index,
    }

    if cs_baseline:
        # common-slopes shaped-noise resynthesis at the same position
        # (compare_treble_full_band_results.ipynb cell 10)
        import jax as _jax

        from ..ops.basic import shaped_wgn

        amps = np.asarray(room_data.amplitudes)
        a_pos = amps[rec_index] if amps.ndim == 2 else amps[rec_index, ..., 0]
        h_cs = np.asarray(
            shaped_wgn(
                a_pos.reshape(1, -1),
                np.asarray(room_data.common_decay_times).reshape(-1),
                t_len,
                fs,
                _jax.random.PRNGKey(0),
            )
        ).reshape(-1)[:t_len]
        rir_sets.append(h_cs[mix:-crop_end])
        labels.append("Common slopes")
        metrics["cs_edc_err_db"] = float(
            np.mean(np.abs(
                _edc_db(h_t[None], mix, crop_end)
                - _edc_db(h_cs[None], mix, crop_end)
            ))
        )

    plot_edc_comparison(
        rir_sets, labels, fs, save_path=str(out / f"edc_overlay_{tag}.png")
    )
    plot_edr(
        h_t, fs, title="True EDR",
        save_path=str(out / f"edr_true_{tag}.png"),
    )
    plot_edr(
        h_s, fs, title="DiffGFDN EDR",
        save_path=str(out / f"edr_synth_{tag}.png"),
    )

    # normalized echo density comparison (compare_treble... cell 18)
    ned = {
        lab: np.asarray(
            normalized_echo_density(r, fs, window_length_ms=50.0)
        )
        for lab, r in zip(labels, rir_sets)
    }
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for lab, n in ned.items():
        ax.plot(np.arange(len(n)) / fs, n, label=lab)
    ax.set_xlabel("time [s]")
    ax.set_ylabel("normalized echo density")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(out / f"echo_density_{tag}.png", dpi=120)
    plt.close(fig)

    # ---------------- learned coupling-matrix diagnostic -----------------
    import jax

    a_mat = np.asarray(
        jax.jit(
            lambda prm: infer.model.apply(
                prm, method=lambda m: m.feedback_loop.coupled_feedback_matrix()
            )
        )(infer.params)
    )
    if a_mat.ndim == 3:  # FILTER coupling: inspect the z^0 tap
        a_mat = a_mat[0]
    metrics["coupling_diagonal_measure"] = diagonal_measure(a_mat)
    plot_matrix(
        a_mat, title=(
            f"coupled feedback matrix "
            f"(diag measure {metrics['coupling_diagonal_measure']:.3f})"
        ),
        save_path=str(out / "coupling_matrix.png"),
    )
    logger.info(
        "coupling diagonal measure: %.4f",
        metrics["coupling_diagonal_measure"],
    )

    # ----------------------- loss curves, if exported --------------------
    losses_mat = Path(tc.train_dir) / "losses.mat"
    if losses_mat.exists():
        import scipy.io as sio

        from ..utils.plot import plot_loss_curves

        m = sio.loadmat(losses_mat)
        plot_loss_curves(
            np.asarray(m["train_loss"]).ravel(),
            np.asarray(m["valid_loss"]).ravel(),
            save_path=str(out / "loss_curves.png"),
        )
    return metrics


def compare_runs(train_dirs, out_path: str) -> dict:
    """Final train/valid losses across several runs in one figure.

    (reference: plot_test_edc_loss_metric.ipynb — final EDC metric vs the
    train/test split ratio, one losses.mat per trained run.)
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import scipy.io as sio

    finals = {}
    for d in train_dirs:
        m = sio.loadmat(Path(d) / "losses.mat")
        v = np.asarray(m["valid_loss"]).ravel()
        t = np.asarray(m["train_loss"]).ravel()
        finals[str(d)] = float(v[-1] if len(v) and v[-1] else t[-1])
    fig, ax = plt.subplots(figsize=(8, 4))
    names = [Path(k).name for k in finals]
    ax.bar(names, list(finals.values()))
    ax.set_ylabel("final loss")
    ax.tick_params(axis="x", rotation=30)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return finals


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # replay unchanged XLA programs across runs
    parser = argparse.ArgumentParser(
        description="Inspect a trained DiffGFDN checkpoint"
    )
    parser.add_argument("-c", "--config", required=True, help="YAML config")
    parser.add_argument("--index", type=int, default=None,
                        help="receiver index for the deep dive")
    parser.add_argument("--position", type=float, nargs=3, default=None,
                        help="receiver position (nearest grid point used)")
    parser.add_argument("--split", choices=("all", "test"), default="all")
    parser.add_argument("--max-receivers", type=int, default=128)
    parser.add_argument("--out", default=None, help="figure output dir")
    parser.add_argument("--cs-baseline", action="store_true",
                        help="add a common-slopes shaped-noise baseline")
    parser.add_argument(
        "--compare-runs", nargs="+", default=None, metavar="TRAIN_DIR",
        help="ONLY compare final losses across these train dirs",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.compare_runs:
        out = args.out or "run_comparison.png"
        finals = compare_runs(args.compare_runs, out)
        for k, v in finals.items():
            print(f"{k}: final loss {v:.4f}")
        print(f"saved {out}")
        return

    from ..config import DiffGFDNConfig, load_and_validate_config

    config = load_and_validate_config(args.config, DiffGFDNConfig)
    metrics = inspect(
        config,
        rec_index=args.index,
        position=args.position,
        split=args.split,
        max_receivers=args.max_receivers,
        out_dir=args.out,
        cs_baseline=args.cs_baseline,
    )
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
