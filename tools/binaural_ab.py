#!/usr/bin/env python
"""A/B the two batched binaural device programs (einsum vs dictionary)
in one process under identical conditions.

Usage: python tools/binaural_ab.py [--hops 240] [--rir-s 1.0]
       [--n-traj 8] [--multi]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=32000.0)
    ap.add_argument("--rir-s", type=float, default=1.0)
    ap.add_argument("--hops", type=int, default=240)
    ap.add_argument("--update-ms", type=float, default=100.0)
    ap.add_argument("--n-traj", type=int, default=8)
    ap.add_argument("--multi", action="store_true")
    ap.add_argument("--device-only", action="store_true")
    args = ap.parse_args()

    from diffgfdn_tpu.data.spatial_dataset import (
        generate_spatial_three_room_pickle,
        SpatialThreeRoomDataset,
    )
    from diffgfdn_tpu.inference import BinauralDynamicRendering

    fs, hops = args.fs, args.hops
    with tempfile.TemporaryDirectory() as tmp:
        path = generate_spatial_three_room_pickle(
            Path(tmp) / "s.pkl", fs=fs, grid_spacing_m=1.2,
            rir_len_s=args.rir_s, decay_times=(0.4, 0.8, 0.6),
        )
        room = SpatialThreeRoomDataset(path)
        rng = np.random.RandomState(0)
        n_sh, hrir_len = 9, 256
        t = np.arange(hrir_len)
        hrir_sh = (
            rng.randn(n_sh, 2, hrir_len) * np.exp(-t / 64.0)[None, None, :]
        ).astype(np.float64)
        pos = np.tile(room.receiver_position[:4], (hops // 4 + 1, 1))[:hops]
        oris = np.stack(
            [np.linspace(0, 2 * np.pi, hops), np.zeros(hops)], axis=-1
        )
        stim = rng.randn(int(fs)).astype(np.float32)
        rend = BinauralDynamicRendering(
            room, pos, oris, stim, hrir_sh, update_ms=args.update_ms,
            use_whole_rir=True,
        )
        print(
            f"dict bytes: {rend._dict_nbytes() / 2**20:.0f} MB "
            f"(auto-select: {rend._use_dict_path()})"
        )

        def run_single(use_dict: bool) -> float:
            rend.dict_path = use_dict
            rend.binaural_filter_overlap_add(backend="jax")  # warm
            walls = []
            for i in range(1, 4):
                rend.extended_stimulus = (
                    rend.extended_stimulus * (1.0 + 1e-6 * i)
                ).astype(np.float32)
                t0 = time.time()
                out = rend.binaural_filter_overlap_add(backend="jax")
                walls.append(time.time() - t0)
            audio_s = rend.total_sim_len / fs
            wall = float(np.min(walls))
            assert np.isfinite(out).all()
            return audio_s / wall

        def run_multi(use_dict: bool) -> float:
            rend.dict_path = use_dict
            t_len = hops * rend.hop_size
            stimuli = rng.randn(args.n_traj, t_len).astype(np.float32)
            many_oris = np.stack([
                np.stack(
                    [np.linspace(0, 2 * np.pi * (i + 1) / args.n_traj, hops),
                     np.zeros(hops)], axis=-1,
                )
                for i in range(args.n_traj)
            ])
            rend.binaural_filter_overlap_add_multi(stimuli, many_oris)  # warm
            walls = []
            for i in range(1, 4):
                stimuli = stimuli * (1.0 + 1e-6 * i)
                t0 = time.time()
                out = rend.binaural_filter_overlap_add_multi(
                    stimuli, many_oris
                )
                walls.append(time.time() - t0)
            wall = float(np.min(walls))
            assert np.isfinite(out).all()
            return args.n_traj * out.shape[1] / fs / wall

        def run_device(use_dict: bool) -> float:
            """Steady-state on-device throughput: inputs resident, output
            NOT fetched (pipelined dispatch, one sync per rep batch) —
            the tunnel-independent per-chip number."""
            import jax
            import jax.numpy as jnp

            from diffgfdn_tpu.inference.rendering import (
                _batched_binaural_fn,
                _dict_binaural_fn,
            )

            from diffgfdn_tpu.ops.sph import sh_rotation_yaw_pitch_roll

            k_hops, hop = rend.num_pos, rend.hop_size
            rot = np.stack([
                sh_rotation_yaw_pitch_roll(rend.ambi_order, -y, -p, 0.0)
                for y, p in rend.orientation_list
            ]).astype(np.float32)
            w_rot = np.concatenate([rot[:1], 0.5 * (rot[1:] + rot[:-1])])
            segs = jnp.asarray(
                rend.extended_stimulus.reshape(k_hops, hop)
            )
            if use_dict:
                d_re, d_im = rend._ensure_dict_consts()
                coef = jnp.asarray(
                    rend._dict_coefs(w_rot, rend._rtf_inv)
                )
                fn = _dict_binaural_fn(k_hops, hop, rend.num_freq_bins)
                call = lambda s: fn(s, coef, d_re, d_im)
            else:
                rend._ensure_dev_consts()
                rtf_re, rtf_im, hf_re, hf_im = rend._dev_consts
                w = jnp.asarray(w_rot)
                inv = jnp.asarray(rend._rtf_inv)
                fn = _batched_binaural_fn(k_hops, hop, rend.num_freq_bins)
                call = lambda s: fn(s, w, rtf_re, rtf_im, inv, hf_re, hf_im)
            out = call(segs)
            jax.block_until_ready(out)  # warm/compile
            audio_s = out.shape[0] / fs
            reps, walls = 8, []
            s = segs
            for _ in range(3):
                t0 = time.time()
                for i in range(reps):
                    # chain every call's INPUT off the previous call's
                    # OUTPUT: unfetched independent dispatches can be
                    # elided/cached by the tunnel, and identical inputs are
                    # replay-cached — the data dependency forces each
                    # render to actually execute, serially
                    # full-output reduction: every element of the previous
                    # render feeds the next input, so nothing can be DCE'd
                    # even if the tunnel fuses across dispatches
                    s = s + jnp.float32(1e-9) * jnp.mean(out)
                    out = call(s)
                # host-fetch of an on-device scalar reduction: the only
                # sync the tunnel respects (block_until_ready can return
                # early), and only 4 bytes cross the wire
                _ = float(jnp.mean(out))
                walls.append((time.time() - t0) / reps)
            return audio_s / float(np.min(walls))

        if args.device_only:
            for trial in range(2):
                for use_dict in (False, True):
                    x = run_device(use_dict)
                    print(
                        f"[device] trial {trial} "
                        f"{'dict  ' if use_dict else 'einsum'}: "
                        f"{x:.0f}x real time (on-device steady state)"
                    )
            return

        run = run_multi if args.multi else run_single
        tag = "multi" if args.multi else "single"
        # interleave to cancel drift on the shared tunnel
        for trial in range(2):
            for use_dict in (False, True):
                x = run(use_dict)
                print(
                    f"[{tag}] trial {trial} "
                    f"{'dict  ' if use_dict else 'einsum'}: "
                    f"{x:.1f}x real time"
                )


if __name__ == "__main__":
    main()
