#!/usr/bin/env python
"""Deployment cost comparison — the reference's ``compare_flops.ipynb``.

Prints the per-sample FLOP/memory cost of every renderer family
(`diffgfdn_tpu.utils.flops` mirrors the notebook's cost models — the only
quantitative anchors the reference publishes, see BASELINE.md) and saves a
log-scale comparison figure:

* one full-band GFDN with GEQ absorption vs 8 parallel subband GFDNs;
* a directional (SH-domain) grouped FDN vs partitioned convolution of a
  9-channel 2-s SRIR (the "can this run in an audio callback?" question);
* the position-MLP inference cost and parameter footprint.

Run: python examples/compare_flops.py [--out /tmp/compare_flops.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diffgfdn_tpu.utils.flops import (  # noqa: E402
    conv_flops,
    dir_gfdn_flops,
    gfdn_flops,
    gfdn_mems,
    mlp_flops,
    mlp_mems,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/compare_flops.png")
    ap.add_argument("--num-delay-lines", type=int, default=12)
    ap.add_argument("--num-bands", type=int, default=8)
    args = ap.parse_args(argv)

    n, b = args.num_delay_lines, args.num_bands
    rows = [
        ("full-band GFDN, GEQ absorption", gfdn_flops(n, b)),
        (f"{b} parallel subband GFDNs", gfdn_flops(n, b, is_parallel=True)),
        ("directional GFDN (order 2, 3 rooms)", dir_gfdn_flops(2, 3, b, 12)),
        ("partitioned conv, 9ch 2s SRIR", conv_flops(9, 2000.0, 512)),
        ("partitioned conv, 9ch 1s SRIR", conv_flops(9, 1000.0, 512)),
    ]
    print(f"{'renderer':<38} FLOPs/sample")
    for name, v in rows:
        print(f"{name:<38} {v:>12,.0f}")
    mlp = mlp_flops(3, 64, 32)
    print(
        f"\nposition MLP (3x64, 32 features): {mlp:,} FLOPs/query, "
        f"{mlp_mems(3, 64, 32):,} params"
    )
    print(
        f"GFDN state memory (N={n}, 3 rooms, 25 ms avg delay @48k): "
        f"{gfdn_mems(48000.0, n, 25.0, 3):,} floats"
    )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 3.2))
    names = [r[0] for r in rows]
    vals = [r[1] for r in rows]
    colors = ["C0", "C0", "C0", "C3", "C3"]
    ax.barh(range(len(rows)), vals, color=colors)
    ax.set_yticks(range(len(rows)))
    ax.set_yticklabels(names, fontsize=8)
    ax.set_xscale("log")
    ax.set_xlabel("FLOPs per output sample (log)")
    ax.set_title("Late-reverb renderer cost: GFDN vs partitioned convolution")
    ax.invert_yaxis()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
