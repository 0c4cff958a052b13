#!/usr/bin/env python
"""Room geometry, positional encodings, and CNN patch partitioning.

The reference's ``notebooks/visualise_room_geometry.ipynb`` sanity-checks
the spatial machinery before any training:

1. **Geometry**: draw the coupled three-room floor plan and a 3-D
   wireframe of the volumes, with receivers/sources overlaid;
2. **One-hot encoding**: every train/valid receiver must snap to a UNIQUE
   nearest mesh point (two receivers sharing a mesh cell would alias in
   the one-hot representation — the notebook plots train and validation
   points separately to verify);
3. **Fourier encodings**: the sinusoidal position encoding must actually
   vary across the grid (features that barely move cannot carry spatial
   information to the MLP);
4. **CNN square patches**: the square-patch batching must partition the
   receiver grid into non-overlapping patches that jointly cover it.

All four reproduced on the synthetic three-room dataset with this
framework's implementations (``models/dnn.py``'s encodings,
``data/spatial_dataset.py``'s patch sampler). ``tests/test_examples.py``
pins 2-4 as assertions.

Run: python examples/room_geometry_study.py [--out /tmp/room_geom]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def geometry_figures(room, out: Path):
    """Floor plan + 3-D wireframe with receivers and source overlaid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from diffgfdn_tpu.utils.plot import draw_room_boundaries

    fig, ax = plt.subplots(figsize=(7, 6))
    draw_room_boundaries(ax, room.room_dims, room.room_start_coord,
                         getattr(room, "aperture_coords", None))
    p = np.asarray(room.receiver_position)
    ax.scatter(p[:, 0], p[:, 1], s=12, label="receivers")
    s = np.asarray(room.source_position).reshape(-1, 3)
    ax.scatter(s[:, 0], s[:, 1], marker="*", s=160, label="source")
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(out / "floor_plan.png", dpi=120)
    plt.close(fig)

    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    for dims, start in zip(room.room_dims, room.room_start_coord):
        x0, y0 = start[0], start[1]
        dx, dy, dz = dims
        for z in (0.0, dz):
            ax.plot([x0, x0 + dx, x0 + dx, x0, x0],
                    [y0, y0, y0 + dy, y0 + dy, y0],
                    [z] * 5, "k-", lw=0.8)
        for cx, cy in ((x0, y0), (x0 + dx, y0), (x0 + dx, y0 + dy),
                       (x0, y0 + dy)):
            ax.plot([cx, cx], [cy, cy], [0.0, dz], "k-", lw=0.8)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=8)
    ax.scatter(s[:, 0], s[:, 1], s[:, 2], marker="*", s=160, c="r")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    fig.savefig(out / "rooms_3d.png", dpi=120)
    plt.close(fig)


def check_one_hot(room, train_idx, valid_idx, pitch_m=0.3):
    """Train/valid receivers snap to unique mesh points (no aliasing)."""
    import jax.numpy as jnp

    from diffgfdn_tpu.models.dnn import one_hot_mesh_encoding

    # floor-plan meshgrid at half the receiver pitch (the RoomDataset
    # meshgrid's role; the spatial dataset carries no mesh of its own)
    p_all = np.asarray(room.receiver_position)
    xs = np.arange(p_all[:, 0].min(), p_all[:, 0].max() + pitch_m, pitch_m)
    ys = np.arange(p_all[:, 1].min(), p_all[:, 1].max() + pitch_m, pitch_m)
    mesh_np = np.stack(
        np.meshgrid(xs, ys, indexing="ij"), axis=-1
    ).reshape(-1, 2).astype(np.float32)
    mesh = jnp.asarray(mesh_np)
    results = {}
    for name, idx in (("train", train_idx), ("valid", valid_idx)):
        pos = jnp.asarray(
            np.asarray(room.receiver_position, np.float32)[idx]
        )
        _, closest, rec_idx = one_hot_mesh_encoding(mesh, pos)
        rec_idx = np.asarray(rec_idx)
        # unique nearest cells + snap distance below the mesh pitch
        dist = np.linalg.norm(
            np.asarray(closest) - np.asarray(pos)[:, :2], axis=-1
        )
        results[name] = {
            "unique": len(np.unique(rec_idx)) == len(rec_idx),
            "max_snap_m": float(dist.max()),
        }
    return results


def fourier_encoding_variation(room, num_features=10):
    """Per-feature std of the sinusoidal encoding across the grid."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.models.dnn import SinusoidalEncoding

    pos = np.asarray(room.norm_receiver_position, np.float32)
    enc = SinusoidalEncoding(num_fourier_features=num_features)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(pos[:1]))
    feats = np.asarray(enc.apply(params, jnp.asarray(pos)))
    return feats.std(axis=0)


def check_patches(room, patch_size=2):
    """Square patches partition the grid: disjoint + jointly covering."""
    from diffgfdn_tpu.data.spatial_dataset import square_patch_indices

    coords = np.asarray(room.receiver_position)
    spacing = np.diff(np.unique(np.round(coords[:, 0], 3)))
    grid_m = float(np.min(spacing[spacing > 1e-6]))
    patches = square_patch_indices(
        coords, patch_size, grid_m, step_size=patch_size
    )
    flat = np.concatenate(patches) if patches else np.empty(0, int)
    return {
        "num_patches": len(patches),
        "disjoint": len(np.unique(flat)) == len(flat),
        "covered": len(np.unique(flat)) / len(coords),
    }


def run(out_dir="/tmp/room_geom", seed=0):
    from diffgfdn_tpu.data.batching import train_valid_split
    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pkl = generate_spatial_three_room_pickle(
        out / "srirs.pkl", grid_spacing_m=0.6, rir_len_s=0.1,
        decay_times=(0.05, 0.09, 0.07), seed=seed,
    )
    room = SpatialThreeRoomDataset(pkl)
    train_idx, valid_idx = train_valid_split(
        np.arange(room.num_rec), 0.8, seed=seed
    )

    geometry_figures(room, out)
    one_hot = check_one_hot(room, train_idx, valid_idx)
    print("one-hot encoding:", one_hot)
    feat_std = fourier_encoding_variation(room)
    print(
        f"fourier features varying (std > 0.05): "
        f"{int((feat_std > 0.05).sum())}/{len(feat_std)}"
    )
    patches = check_patches(room)
    print("CNN square patches:", patches)
    return {"one_hot": one_hot, "feat_std": feat_std, "patches": patches}


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/room_geom")
    args = parser.parse_args()
    run(args.out)
