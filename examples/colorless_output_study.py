#!/usr/bin/env python
"""Does colorless pre-training flatten each group's magnitude response?

The reference inspects this in ``notebooks/investigate_colorless_output.ipynb``:
for each room group it loads the per-epoch ColorlessFDN checkpoints, plots
the initial vs final magnitude response |H|, and logs the SPECTRAL FLATNESS
before and after — training should push |H| toward 1 everywhere (a
colorless lossless prototype whose b, c, A are later used to warm-start the
GFDN's io gains, reference colorless_fdn/model.py:12-107).

This script trains one ColorlessFDN per group at toy scale through the
production ``ColorlessFDNTrainer``, plots init vs final |H| per group, and
prints the flatness gain. ``tests/test_examples.py`` pins the conclusion:
final spectral flatness exceeds the initial for every group, and the
spectral MSE against |H| = 1 drops.

Run: python examples/colorless_output_study.py [--out /tmp/colorless]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run(out_dir="/tmp/colorless", fs=8000.0, epochs=6, seed=0):
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from diffgfdn_tpu.config.schema import ColorlessFDNConfig
    from diffgfdn_tpu.models.colorless import ColorlessFDN
    from diffgfdn_tpu.ops.basic import db, spectral_flatness
    from diffgfdn_tpu.training.colorless_trainer import ColorlessFDNTrainer

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # per-group co-prime delay sets (three "rooms", 4 lines each)
    group_delays = (
        (163, 179, 191, 211),
        (223, 227, 233, 239),
        (251, 257, 263, 269),
    )
    ccfg = ColorlessFDNConfig(
        use_colorless_prototype=True, max_epochs=epochs, batch_size=256,
        lr=0.02,
    )
    num_eval = 2048
    z = np.exp(
        1j * np.linspace(0.0, np.pi, num_eval, endpoint=False)
    ).astype(np.complex64)

    fig, axes = plt.subplots(len(group_delays), 1, figsize=(8, 9),
                             sharex=True)
    results = []
    for g, delays in enumerate(group_delays):
        model = ColorlessFDN(sample_rate=fs, delays=delays)
        params = model.init(jax.random.PRNGKey(seed + g), z[:16])

        @jax.jit
        def resp(p):
            return jnp.abs(model.apply(p, z)[0])

        h0 = np.asarray(resp(params))
        trainer = ColorlessFDNTrainer(
            model, ccfg, str(out / f"group{g}")
        )
        params = trainer.fit(params, num_freq_samples=1024, seed=seed + g)
        h1 = np.asarray(resp(params))

        flat0 = float(spectral_flatness(np.asarray(db(h0))))
        flat1 = float(spectral_flatness(np.asarray(db(h1))))
        mse0 = float(np.mean((h0 - 1.0) ** 2))
        mse1 = float(np.mean((h1 - 1.0) ** 2))
        freqs = np.linspace(0, fs / 2, num_eval)
        axes[g].semilogx(freqs[1:], np.asarray(db(h0))[1:], "--",
                         label=f"init (flatness {flat0:.3f})")
        axes[g].semilogx(freqs[1:], np.asarray(db(h1))[1:],
                         label=f"trained (flatness {flat1:.3f})")
        axes[g].set_ylabel(f"group {g + 1} |H| [dB]")
        axes[g].legend()
        axes[g].grid(alpha=0.3)
        print(
            f"group {g + 1}: spectral flatness {flat0:.3f} -> {flat1:.3f}, "
            f"spectral MSE {mse0:.4f} -> {mse1:.4f}"
        )
        results.append(dict(flat0=flat0, flat1=flat1, mse0=mse0, mse1=mse1))
    axes[-1].set_xlabel("frequency [Hz]")
    fig.tight_layout()
    fig.savefig(out / "colorless_responses.png", dpi=120)
    plt.close(fig)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/colorless")
    parser.add_argument("--epochs", type=int, default=6)
    args = parser.parse_args()
    run(args.out, epochs=args.epochs)
