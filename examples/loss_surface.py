#!/usr/bin/env python
"""Loss surfaces over the (g_in, g_out) IO-gain plane of a 1-group FDN.

The reference studies this in ``notebooks/investigate_loss_surface.ipynb``:
for a single-group GFDN, sweep scalar input/output gains, evaluate each
training loss on the grid, and plot the surfaces to build intuition about
the optimization landscape. The headline intuition it surfaces: with
uniform scalar IO gains the transfer function depends on the gains only
through the PRODUCT ``g_in * g_out`` — every loss has a degenerate valley
along the hyperbola ``g_in * g_out = const`` (and its mirror image), so
gradient descent can trade input gain against output gain freely and only
the product is identifiable.

TPU-first formulation: where the notebook evaluates the grid with nested
Python loops (one torch forward per grid point), here the loop response is
computed ONCE and the whole grid is a single ``vmap``-ed jitted dispatch
over the flattened (g_in, g_out) pairs — 41 x 41 = 1681 loss evaluations
in one XLA program.

Run: python examples/loss_surface.py [--out /tmp/loss_surface.png]
     [--grid 41] [--nfft 8192]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def compute_surfaces(nfft=8192, grid=41, fs=16000.0, t60=0.25, span=1.5):
    """Return (g, edc_surface, edr_surface, target_product).

    ``g``: the (grid,) gain axis; surfaces are (grid, grid) with g_in on
    axis 0 and g_out on axis 1.
    """
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.losses.gfdn import edc_loss, edr_loss
    from diffgfdn_tpu.models.feedback_loop import FeedbackLoop
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample

    delays = (233, 311, 421, 461, 587, 613)
    gains = np.asarray(
        decay_times_to_gain_per_sample(t60, np.asarray(delays), fs)
    )
    loop = FeedbackLoop(
        sample_rate=fs,
        num_groups=1,
        num_delay_lines_per_group=len(delays),
        delays=delays,
        gains=gains,
    )
    f = nfft // 2 + 1
    # complex stays INSIDE jit: this TPU backend has no eager complex ops
    # and no complex transfers (utils/cio.py) — z crosses as re/im planes
    z_host = np.exp(1j * np.linspace(0.0, np.pi, f)).astype(np.complex64)
    z_ri = jnp.asarray(np.stack([z_host.real, z_host.imag], -1))
    params = jax.jit(
        lambda k, zri: loop.init(k, zri[..., 0] + 1j * zri[..., 1])
    )(jax.random.PRNGKey(0), z_ri)

    g_in_true, g_out_true = 0.7, 0.5
    win = 512
    mix = int(0.005 * fs)

    @jax.jit
    def surface(p, zri, pairs):
        z = zri[..., 0] + 1j * zri[..., 1]
        pm = loop.apply(p, z)  # (F, N, N)
        # uniform unit IO vectors: H0[f] = 1^T P(z) 1; any scalar pair
        # then gives H = g_in * g_out * H0
        h0 = jnp.sum(pm, axis=(1, 2))
        h_target = (g_in_true * g_out_true) * h0

        def losses(pair):
            h = (pair[0] * pair[1]) * h0
            return jnp.stack([
                edc_loss(h_target, h, mix, nfft),
                edr_loss(h_target, h, win_size=win, hop_size=win // 2),
            ])

        return jax.vmap(losses)(pairs)

    g = np.linspace(-span, span, grid, dtype=np.float32)
    pairs = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    vals = np.asarray(surface(params, z_ri, jnp.asarray(pairs)))
    vals = vals.reshape(grid, grid, 2)
    return g, vals[..., 0], vals[..., 1], g_in_true * g_out_true


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/loss_surface.png")
    ap.add_argument("--grid", type=int, default=41)
    ap.add_argument("--nfft", type=int, default=8192)
    args = ap.parse_args(argv)

    g, edc, edr, prod = compute_surfaces(nfft=args.nfft, grid=args.grid)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(13, 4))
    gin, gout = np.meshgrid(g, g, indexing="ij")
    for i, (surf, name) in enumerate([(edc, "EDC loss"), (edr, "EDR loss")]):
        ax = fig.add_subplot(1, 3, i + 1, projection="3d")
        ax.plot_surface(gin, gout, surf, cmap="viridis", linewidth=0)
        ax.set_xlabel("$g_{in}$")
        ax.set_ylabel("$g_{out}$")
        ax.set_title(name)
    ax = fig.add_subplot(1, 3, 3)
    c = ax.contourf(gin, gout, np.log10(edc + 1e-9), levels=25)
    hyp = np.linspace(prod / 1.5, 1.5, 200)
    for s in (1.0, -1.0):
        ax.plot(s * hyp, s * prod / hyp, "r--", lw=1,
                label="$g_{in} g_{out} = g^*$" if s > 0 else None)
    ax.set_xlim(g[0], g[-1])
    ax.set_ylim(g[0], g[-1])
    ax.legend(loc="lower left", fontsize=8)
    ax.set_title("log10 EDC loss + degenerate valley")
    fig.colorbar(c, ax=ax)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")

    i, j = np.unravel_index(np.argmin(edc), edc.shape)
    print(f"EDC-loss minimum at g_in={g[i]:.3f}, g_out={g[j]:.3f} "
          f"(product {g[i] * g[j]:.3f}, true product {prod:.3f})")


if __name__ == "__main__":
    main()
