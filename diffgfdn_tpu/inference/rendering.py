"""6DoF rendering: moving-receiver convolution and binaural SH rendering.

Reference behaviour: src/sound_examples.py:25-539 —
* :func:`add_direct_and_early_path` — splice measured direct/early parts
  onto synthesized late tails with crossfades and energy matching;
* :class:`DynamicRenderingMovingReceiver` — time-varying overlap-add
  convolution with linear crossfades as the listener moves;
* :class:`BinauralDynamicRendering` — SH-domain head rotation +
  conj(HRTF-SH) beamforming per hop with sqrt (uncorrelated) crossfades;
* :func:`normalise_loudness` — BS.1770-style K-weighted loudness
  normalization (replaces pyloudnorm).

The host path is numpy (streaming playback tooling). The binaural
renderer additionally offers ``backend="jax"``: the hop loop's only
sequential state (one-hop smoothing of the rotation matrix and RTF, and
the previous segment's crossfade tail) has a closed form, so ALL hops
batch into one device program — batched SH rotations, one beamforming
einsum, one batched irfft, batched FFT convolution of every hop segment,
and an on-device overlap-add. Same semantics as the host loop
(parity-tested), offline-rendering throughput instead of per-hop latency.
"""

import functools
import os
from typing import List, Optional, Tuple

import numpy as np
from scipy.signal import fftconvolve, lfilter

from ..data.room_dataset import RoomDataset
from ..ops.basic import ms_to_samps
from ..ops.sph import sh_rotation_yaw_pitch_roll


def add_direct_and_early_path(
    ref_rirs: np.ndarray,
    ref_positions: np.ndarray,
    late_rirs: np.ndarray,
    positions: np.ndarray,
    sample_rate: float,
    mixing_time_ms: float = 50.0,
    win_len_ms: float = 5.0,
) -> np.ndarray:
    """Splice measured early parts onto synthesized late tails.

    ``ref_rirs``: (R_ref, [C,] T) measured set; ``late_rirs``: ([R,] [C,] T)
    synthesized tails at ``positions``. The early part comes from the
    nearest measured receiver; the late gain is matched at the mixing time
    using short-time energy envelopes; both sides are crossfaded
    (reference: sound_examples.py:25-77).
    """
    from .cs_synthesis import calculate_energy_envelope

    d = np.linalg.norm(ref_positions[:, None, :] - positions[None], axis=-1)
    closest = np.argmin(d, axis=0)

    mix = ms_to_samps(mixing_time_ms, sample_rate)
    wl = ms_to_samps(2 * win_len_ms, sample_rate)
    window = np.hanning(wl)
    fade_out = window[wl // 2 :]
    fade_in = window[: wl // 2]

    early = np.zeros_like(late_rirs)
    early[..., : mix + wl // 2] = ref_rirs[closest][..., : mix + wl // 2]
    late = np.zeros_like(late_rirs)
    late[..., mix:] = late_rirs[..., mix:]

    early_env = calculate_energy_envelope(early[..., :mix], sample_rate, 20)
    late_env = calculate_energy_envelope(late[..., mix:], sample_rate, 20)
    gain = np.sqrt(
        early_env[..., -1:] / (late_env[..., :1] + 1e-12)
    )
    late = late * gain

    early[..., mix : mix + wl // 2] *= fade_out
    late[..., mix : mix + wl // 2] *= fade_in
    return early + late


def fade_windows(
    win_len_samps: int, fade_out: bool = False, uncorr_fade: bool = False
) -> np.ndarray:
    """Linear fades; sqrt version for uncorrelated (binaural) material."""
    n = np.linspace(-1.0, 1.0, win_len_samps)
    fade = 0.5 * (1.0 + (1.0 - 2.0 * float(fade_out)) * n)
    return np.sqrt(fade) if uncorr_fade else fade


def k_weighting_coeffs(fs: float) -> List[Tuple[np.ndarray, np.ndarray]]:
    """BS.1770 K-weighting: high-shelf + high-pass biquads at rate fs."""
    # stage 1: shelving (+4 dB high shelf)
    f0, g_db, q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    k = np.tan(np.pi * f0 / fs)
    vh = 10.0 ** (g_db / 20.0)
    vb = vh ** 0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b_shelf = np.array(
        [(vh + vb * k / q + k * k), 2.0 * (k * k - vh), (vh - vb * k / q + k * k)]
    ) / a0
    a_shelf = np.array([1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0])
    # stage 2: high pass
    f0, q = 38.13547087602444, 0.5003270373238773
    k = np.tan(np.pi * f0 / fs)
    denom = 1.0 + k / q + k * k
    b_hp = np.array([1.0, -2.0, 1.0])
    a_hp = np.array(
        [1.0, 2.0 * (k * k - 1.0) / denom, (1.0 - k / q + k * k) / denom]
    )
    return [(b_shelf, a_shelf), (b_hp, a_hp)]


def integrated_loudness(signal: np.ndarray, fs: float) -> float:
    """Gated BS.1770 integrated loudness in LUFS (mono or (T, C))."""
    x = signal if signal.ndim == 2 else signal[:, None]
    for b, a in k_weighting_coeffs(fs):
        x = lfilter(b, a, x, axis=0)
    block = int(0.4 * fs)
    hop = int(0.1 * fs)
    n_blocks = max(1, (x.shape[0] - block) // hop + 1)
    ms = np.array(
        [np.mean(x[i * hop : i * hop + block] ** 2, axis=0).sum() for i in range(n_blocks)]
    )
    loud = -0.691 + 10.0 * np.log10(ms + 1e-12)
    gate1 = loud > -70.0
    if not gate1.any():
        return -70.0
    rel = -0.691 + 10.0 * np.log10(np.mean(ms[gate1]) + 1e-12) - 10.0
    gate2 = gate1 & (loud > rel)
    if not gate2.any():
        gate2 = gate1
    return float(-0.691 + 10.0 * np.log10(np.mean(ms[gate2]) + 1e-12))


def normalise_loudness(
    signal: np.ndarray, fs: float, db_lufs: float = -18.0
) -> np.ndarray:
    """Scale the signal to the target integrated loudness."""
    cur = integrated_loudness(signal, fs)
    return signal * 10.0 ** ((db_lufs - cur) / 20.0)


class DynamicRenderingMovingReceiver:
    """Time-varying convolution for a listener moving over the RIR grid.

    Reference: sound_examples.py:80-353 (minus the matplotlib animation).
    """

    def __init__(
        self,
        room_dataset: RoomDataset,
        rec_pos_list: np.ndarray,
        stimulus: np.ndarray,
        update_ms: float = 100.0,
    ):
        self.room = room_dataset
        self.sample_rate = room_dataset.sample_rate
        self.rec_pos_list = np.asarray(rec_pos_list)
        self.num_pos = self.rec_pos_list.shape[0]
        self.update_ms = update_ms
        self.hop_size = ms_to_samps(update_ms, self.sample_rate)
        self.stimulus = np.asarray(stimulus, np.float32)
        self.extended_stimulus = self._extend_stimulus()

    @property
    def total_sim_len(self) -> int:
        return self.num_pos * self.hop_size

    @property
    def rec_idxs(self) -> np.ndarray:
        return self.room.find_rec_idx(self.rec_pos_list)

    def _extend_stimulus(self) -> np.ndarray:
        total = self.total_sim_len
        reps = int(np.ceil(total / len(self.stimulus)))
        return np.tile(self.stimulus, reps)[:total]

    def animate_trajectory(
        self,
        save_path: str,
        yaw_angles: Optional[np.ndarray] = None,
    ):
        """Moving-listener demo animation on the floor plan
        (reference sound_examples.py:257-353): the rendered walk as an
        .mp4 (ffmpeg) or .gif fallback, at the renderer's hop rate."""
        from ..utils.plot import animate_moving_listener

        return animate_moving_listener(
            self.rec_pos_list,
            room_dims=self.room.room_dims,
            room_start_coords=self.room.room_start_coord,
            yaw_angles=yaw_angles,
            source_position=np.asarray(self.room.source_position).reshape(-1),
            save_path=save_path,
            fps=max(1, int(round(1000.0 / self.update_ms))),
        )

    def _rirs(self, use_whole_rir: bool) -> np.ndarray:
        if use_whole_rir:
            return self.room.rirs[self.rec_idxs]
        from ..data.room_dataset import early_late_split

        _, late = early_late_split(
            self.room.rirs, self.room.mixing_time_ms, self.sample_rate
        )
        full_late = np.zeros_like(self.room.rirs)
        mix = ms_to_samps(self.room.mixing_time_ms, self.sample_rate)
        full_late[..., mix:] = late
        return full_late[self.rec_idxs]

    def filter_overlap_add(
        self,
        use_whole_rir: bool = False,
        alpha: float = 0.5,
        fade_len_ms: float = 50.0,
    ) -> np.ndarray:
        """Convolve hop-wise with position-interpolated RIRs + crossfades."""
        rirs = self._rirs(use_whole_rir)
        out = np.zeros_like(self.extended_stimulus)
        fade_len = ms_to_samps(fade_len_ms, self.sample_rate)
        f_out = fade_windows(fade_len, fade_out=True)
        f_in = fade_windows(fade_len, fade_out=False)
        prev_tail = np.zeros(fade_len)
        prev_filter = None

        for k in range(self.num_pos):
            sl = slice(k * self.hop_size, min((k + 1) * self.hop_size, len(out)))
            cur_filter = rirs[k]
            if prev_filter is not None:
                cur_filter = alpha * cur_filter + (1 - alpha) * prev_filter
            prev_filter = cur_filter

            seg = fftconvolve(self.extended_stimulus[sl], cur_filter, mode="full")
            start = k * self.hop_size
            end = min(start + len(seg), len(out))
            seg = seg[: end - start]
            if k > 0:
                ov = min(fade_len, len(seg))
                out[start : start + ov] += (
                    prev_tail[:ov] * f_out[:ov] + seg[:ov] * f_in[:ov]
                )
                out[start + ov : end] += seg[ov:]
            else:
                out[start:end] += seg
            if len(seg) >= fade_len:
                prev_tail[:] = seg[-fade_len:]
            else:
                prev_tail[: len(seg)] = seg
        return out


class BinauralDynamicRendering(DynamicRenderingMovingReceiver):
    """Moving listener + rotating head: SH rotation, HRTF-SH beamforming.

    ``room_dataset`` must hold ambisonic RIRs (num_pos, (N+1)^2, T);
    ``orientation_list``: (num_pos, 2) yaw/pitch in radians. Reference:
    sound_examples.py:356-539.
    """

    def __init__(
        self,
        room_dataset,
        rec_pos_list: np.ndarray,
        orientation_list: np.ndarray,
        stimulus: np.ndarray,
        hrir_sh: np.ndarray,
        update_ms: float = 100.0,
        use_whole_rir: bool = False,
        mixing_time_ms: float = 50.0,
    ):
        super().__init__(room_dataset, rec_pos_list, stimulus, update_ms)
        self.orientation_list = np.asarray(orientation_list, np.float64).copy()
        self.orientation_list[:, -1] = -self.orientation_list[:, -1]  # pitch
        assert self.orientation_list.shape[0] == self.num_pos
        self.use_whole_rir = use_whole_rir
        self.ambi_order = int(np.sqrt(room_dataset.rirs.shape[1]) - 1)
        self.mixing_time_ms = mixing_time_ms
        self.hrir_sh = hrir_sh  # (n_sh, 2, T)
        self._init_freq_domain()

    def _init_freq_domain(self):
        self.num_freq_bins = int(2 ** np.ceil(np.log2(self.room.rir_length)))
        rirs = self.room.rirs
        if not self.use_whole_rir:
            from ..data.room_dataset import early_late_split

            _, late = early_late_split(
                rirs, self.mixing_time_ms, self.sample_rate, win_len_ms=10.0
            )
            rirs = np.concatenate(
                [np.zeros(rirs.shape[:-1] + (rirs.shape[-1] - late.shape[-1],)), late],
                axis=-1,
            )
        # FFT each UNIQUE receiver once; hops revisiting a grid point share
        # the spectrum (trajectories typically dwell on few grid cells)
        uniq, inv = np.unique(self.rec_idxs, return_inverse=True)
        self._rtf_uniq = np.fft.rfft(rirs[uniq], self.num_freq_bins, axis=-1)
        self._rtf_inv = inv.astype(np.int32)
        self.ambi_hrtfs = np.fft.rfft(self.hrir_sh, self.num_freq_bins, axis=-1)
        self._prev_rot = None
        self._prev_rtf = None
        self._dev_consts = None  # jax-backend device-resident constants
        self._dict_consts = None  # beamformed-RTF dictionary (device)
        # dictionary-path override: None = auto (fits the memory budget),
        # True/False = force. See _use_dict_path.
        self.dict_path: Optional[bool] = None

    def get_binaural_rir(
        self, head_orientation: Tuple[float, float], rec_pos_idx: int,
        alpha: float = 0.5,
    ) -> np.ndarray:
        """(num_freq_bins, 2) BRIR for one hop (rotation + HRTF-SH conv)."""
        cur_rtf = self._rtf_uniq[self._rtf_inv[rec_pos_idx]]
        rot = sh_rotation_yaw_pitch_roll(
            self.ambi_order, -head_orientation[0], -head_orientation[1], 0.0
        )
        w_rot = rot if self._prev_rot is None else alpha * rot + (1 - alpha) * self._prev_rot
        w_rtf = cur_rtf if self._prev_rtf is None else alpha * cur_rtf + (1 - alpha) * self._prev_rtf
        rotated = w_rtf.T @ w_rot.T  # (F, n_sh)
        brtf = np.einsum("nrf,fn->fr", np.conj(self.ambi_hrtfs), rotated)
        self._prev_rot = rot
        self._prev_rtf = cur_rtf
        return np.fft.irfft(brtf, self.num_freq_bins, axis=0)

    def binaural_filter_overlap_add(self, backend: str = "host") -> np.ndarray:
        """Hop-wise binaural convolution with sqrt crossfades -> (T, 2).

        ``backend="host"`` streams hop by hop (numpy, stateful smoothing —
        suitable for real-time playback). ``backend="jax"`` renders every
        hop in ONE batched device program (fresh smoothing state, as on a
        first host call); use for offline rendering throughput.
        """
        if backend == "jax":
            return self._binaural_ola_jax()
        if backend != "host":
            raise ValueError(f"unknown backend {backend!r}")
        out = np.zeros((len(self.extended_stimulus), 2))
        fade_len = ms_to_samps(self.update_ms, self.sample_rate)
        f_out = fade_windows(fade_len, fade_out=True, uncorr_fade=True)
        f_in = fade_windows(fade_len, fade_out=False, uncorr_fade=True)
        prev_tail = np.zeros((fade_len, 2))

        for k in range(self.num_pos):
            sl = slice(k * self.hop_size, min((k + 1) * self.hop_size, len(out)))
            stim = self.extended_stimulus[sl]
            brir = self.get_binaural_rir(self.orientation_list[k], k)
            start = k * self.hop_size
            for j in range(2):
                seg = fftconvolve(stim, brir[:, j], mode="full")
                end = min(start + len(seg), out.shape[0])
                seg = seg[: end - start]
                if k > 0:
                    ov = min(fade_len, len(seg))
                    out[start : start + ov, j] += (
                        prev_tail[:ov, j] * f_out[:ov] + seg[:ov] * f_in[:ov]
                    )
                    out[start + ov : end, j] += seg[ov:]
                else:
                    out[start:end, j] += seg
                if len(seg) >= fade_len:
                    prev_tail[:, j] = seg[-fade_len:]
                else:
                    prev_tail[: len(seg), j] = seg
        return out

    def binaural_filter_overlap_add_multi(
        self,
        stimuli: np.ndarray,
        orientations: Optional[np.ndarray] = None,
        rec_indices: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Render B trajectories/stimuli in ONE device dispatch -> (B, T, 2).

        ``stimuli``: (B, num_pos * hop) extended stimuli (one per
        trajectory). ``orientations``: optional (B, num_pos, 2) yaw/pitch
        lists (defaults to this renderer's list for every trajectory).
        ``rec_indices``: optional (B, num_pos) indices into THIS renderer's
        hop positions (defaults to the renderer's own receiver path).
        Per-trajectory output matches ``backend="jax"`` exactly; the fixed
        dispatch/tunnel cost amortises across B (the serving path for
        many-listener / many-source rendering).
        """
        import jax

        stimuli = np.asarray(stimuli, np.float32)
        b = stimuli.shape[0]
        k_hops, hop = self.num_pos, self.hop_size
        assert stimuli.shape[1] == k_hops * hop, stimuli.shape

        if orientations is None:
            orientations = np.broadcast_to(
                np.asarray(self.orientation_list, np.float32),
                (b, k_hops, 2),
            )
        else:
            # same convention as the constructor: stored pitch is negated
            orientations = np.asarray(orientations, np.float64).copy()
            orientations[..., -1] = -orientations[..., -1]
        rots = np.stack([
            np.stack([
                sh_rotation_yaw_pitch_roll(
                    self.ambi_order, -yaw, -pitch, 0.0
                )
                for yaw, pitch in traj
            ])
            for traj in np.asarray(orientations)
        ])  # (B, K, S, S)
        w_rot = np.concatenate(
            [rots[:, :1], 0.5 * (rots[:, 1:] + rots[:, :-1])], axis=1
        ).astype(np.float32)
        if rec_indices is None:
            inv = np.broadcast_to(self._rtf_inv, (b, k_hops))
        else:
            inv = self._rtf_inv[np.asarray(rec_indices)]
        segs = stimuli.reshape(b, k_hops, hop)
        if self._use_dict_path():
            d_re, d_im = self._ensure_dict_consts()
            coef = np.stack(
                [self._dict_coefs(w_rot[i], inv[i]) for i in range(b)]
            )
            fn = _multi_binaural_dict_fn(k_hops, hop, self.num_freq_bins)
            out = fn(segs, coef, d_re, d_im)
        else:
            self._ensure_dev_consts()
            rtf_re, rtf_im, hf_re, hf_im = self._dev_consts
            fn = _multi_binaural_fn(k_hops, hop, self.num_freq_bins)
            out = fn(
                segs, w_rot, rtf_re, rtf_im, np.ascontiguousarray(inv),
                hf_re, hf_im,
            )
        return np.asarray(jax.block_until_ready(out), np.float64)

    def _ensure_dev_consts(self) -> None:
        if self._dev_consts is None:
            import jax

            # device-resident spectra of the UNIQUE receivers + the
            # HRTF-SH set, re/im-split (complex can't cross the jit
            # boundary on the tunnelled TPU backend). Mirrors the host
            # path, whose ambi RTFs are precomputed in _init_freq_domain
            # — the per-call program starts at the rotation matmuls.
            rtf32 = np.asarray(self._rtf_uniq, np.complex64)
            hf32 = np.asarray(self.ambi_hrtfs, np.complex64)
            self._dev_consts = tuple(
                jax.device_put(np.ascontiguousarray(a))
                for a in (rtf32.real, rtf32.imag, hf32.real, hf32.imag)
            )

    def _conv_nfft(self) -> int:
        """FFT size of the hop-convolution stage (power of two covering
        one hop + the padded BRIR length)."""
        seg_len = self.hop_size + self.num_freq_bins - 1
        return 1 << (seg_len - 1).bit_length()

    def _dict_nbytes(self) -> int:
        """Device bytes of the beamformed-atom dictionary (re+im f32)."""
        u, s = self._rtf_uniq.shape[:2]
        n = self.ambi_hrtfs.shape[0]
        f2 = self._conv_nfft() // 2 + 1
        return u * s * n * 2 * f2 * 8

    def _use_dict_path(self) -> bool:
        """Select the dictionary render program (see _ensure_dict_consts).

        Auto policy: use it whenever the dictionary fits the device memory
        budget (``DIFFGFDN_BINAURAL_DICT_MB``, default 512 MB) — measured
        faster than the einsum program whenever it fits, since it removes
        the per-hop rotation/beamforming einsums AND the BRIR irfft→rfft
        roundtrip from the hot program. Override with ``self.dict_path``.
        """
        if self.dict_path is not None:
            return bool(self.dict_path)
        budget_mb = float(os.environ.get("DIFFGFDN_BINAURAL_DICT_MB", 512.0))
        return self._dict_nbytes() <= budget_mb * 2.0 ** 20

    def _ensure_dict_consts(self):
        """Build + upload the beamformed-RTF dictionary once.

        Atom (u, s, n) is the binaural spectrum — at the CONVOLUTION fft
        size — of unique-receiver ``u``'s ambi channel ``s`` beamformed
        through conj(HRTF-SH) channel ``n``:
        ``D[(u,s,n), f2, r] = rfft(irfft(rtf_u[s]·conj(hf[n,r]), nfft),
        nfft2)``. Rotation + one-hop smoothing act LINEARLY on these
        atoms, so every hop's convolution-ready BRTF is one real matmul
        ``coef (K,J) @ D (J, F2·2)`` — MXU work instead of per-hop tiny
        einsums, with the brir irfft/rfft roundtrip folded into the
        precompute (host build peak is ~3.5x the dictionary size).
        """
        if self._dict_consts is None:
            import jax

            nfft2 = self._conv_nfft()
            rtf = np.asarray(self._rtf_uniq, np.complex64)  # (U, S, F)
            hfc = np.conj(np.asarray(self.ambi_hrtfs, np.complex64))
            atoms = rtf[:, :, None, None, :] * hfc[None, None]  # (U,S,N,2,F)
            atoms_t = np.fft.irfft(atoms, self.num_freq_bins, axis=-1)
            d2 = np.fft.rfft(atoms_t.astype(np.float32), nfft2, axis=-1)
            d2 = d2.astype(np.complex64)
            u, s, n = d2.shape[:3]
            d2 = d2.reshape(u * s * n, 2, -1).transpose(0, 2, 1)  # (J,F2,2)
            self._dict_consts = tuple(
                jax.device_put(np.ascontiguousarray(x))
                for x in (d2.real, d2.imag)
            )
        return self._dict_consts

    def _dict_coefs(self, w_rot: np.ndarray, inv: np.ndarray) -> np.ndarray:
        """(K, J) real mixing weights onto the dictionary atoms:
        ``A[k,(u,s,n)] = W[k,u] · w_rot[k,n,s]`` where ``W`` carries the
        one-hop RTF smoothing (one-hot at k=0, half on the previous hop's
        receiver after). Atom ordering matches _ensure_dict_consts."""
        k_hops = w_rot.shape[0]
        u = self._rtf_uniq.shape[0]
        w = np.zeros((k_hops, u), np.float32)
        w[0, inv[0]] = 1.0
        if k_hops > 1:
            rows = np.arange(1, k_hops)
            np.add.at(w, (rows, inv[1:k_hops]), 0.5)
            np.add.at(w, (rows, inv[: k_hops - 1]), 0.5)
        a = np.einsum("ku,kns->kusn", w, np.asarray(w_rot, np.float32))
        return np.ascontiguousarray(a.reshape(k_hops, -1))

    def _binaural_ola_jax(self) -> np.ndarray:
        """All hops of :meth:`binaural_filter_overlap_add` in one device
        program (see the module docstring). Matches the host loop's output
        from a fresh renderer to f32 accuracy."""
        import jax

        k_hops = self.num_pos
        hop = self.hop_size
        fade_len = ms_to_samps(self.update_ms, self.sample_rate)
        assert fade_len == hop, "binaural fades are one hop long by construction"

        # smoothed SH rotation matrices (tiny: host numpy)
        rot = np.stack(
            [
                sh_rotation_yaw_pitch_roll(self.ambi_order, -yaw, -pitch, 0.0)
                for yaw, pitch in self.orientation_list
            ]
        )
        w_rot = np.concatenate([rot[:1], 0.5 * (rot[1:] + rot[:-1])])

        segs = self.extended_stimulus.reshape(k_hops, hop)
        if self._use_dict_path():
            d_re, d_im = self._ensure_dict_consts()
            coef = self._dict_coefs(
                np.asarray(w_rot, np.float32), self._rtf_inv
            )
            fn = _dict_binaural_fn(k_hops, hop, self.num_freq_bins)
            out = fn(segs, coef, d_re, d_im)
        else:
            self._ensure_dev_consts()
            rtf_re, rtf_im, hf_re, hf_im = self._dev_consts
            fn = _batched_binaural_fn(k_hops, hop, self.num_freq_bins)
            out = fn(
                segs, np.asarray(w_rot, np.float32), rtf_re, rtf_im,
                self._rtf_inv, hf_re, hf_im,
            )
        return np.asarray(jax.block_until_ready(out), np.float64)


def _make_binaural_fn(k_hops: int, hop: int, nfft: int):
    """All-hops binaural render body: (K,hop) stimulus segments,
    (K,S,S) smoothed rotations, re/im unique-receiver RTFs (U,S,Fb) with a
    (K,) gather index, and re/im HRTF-SH (S,2,Fb)
    -> (K*hop, 2) crossfaded binaural output.

    One-hop smoothing (alpha=0.5, matching the host path's default) is
    applied in closed form; the overlap-add and the host loop's
    end-truncated crossfade tails (rendering.py host path; reference
    sound_examples.py:430-539) are reproduced exactly.
    """
    import jax.numpy as jnp

    seg_len = hop + nfft - 1
    nfft2 = 1 << (seg_len - 1).bit_length()
    tail = _make_ola_tail(k_hops, hop, seg_len)

    def fn(segs, w_rot, rtf_re, rtf_im, inv, hf_re, hf_im):
        rtf = (rtf_re + 1j * rtf_im)[inv]  # (K, S, Fb), unique -> per-hop
        w_rtf = jnp.concatenate([rtf[:1], 0.5 * (rtf[1:] + rtf[:-1])])
        hf = hf_re + 1j * hf_im  # (S, 2, Fb)
        # rotated[k,f,n] = sum_s w_rot[k,n,s] w_rtf[k,s,f]; then beamform
        # with conj(HRTF-SH): brtf[k,f,r] = sum_n conj(hf[n,r,f]) g[k,n,f]
        g = jnp.einsum("kns,ksf->knf", w_rot.astype(rtf.dtype), w_rtf)
        # NB: axis-1 FFTs with the tiny trailing ear axis measured FASTER
        # on TPU than a channel-first/axis=-1 layout (41x -> 60x realtime)
        brtf = jnp.einsum("nrf,knf->kfr", jnp.conj(hf), g)
        brir = jnp.fft.irfft(brtf, nfft, axis=1)  # (K, F, 2)

        sf = jnp.fft.rfft(segs, nfft2, axis=-1)  # (K, Fb2)
        bf = jnp.fft.rfft(brir, nfft2, axis=1)  # (K, Fb2, 2)
        seg_t = jnp.fft.irfft(sf[:, :, None] * bf, nfft2, axis=1)[:, :seg_len]
        return tail(seg_t)

    return fn


def _make_binaural_dict_fn(k_hops: int, hop: int, nfft: int):
    """Dictionary-path render body (see
    BinauralDynamicRendering._ensure_dict_consts): (K,hop) stimulus
    segments, (K,J) real atom weights, re/im dictionary (J,F2,2) at the
    CONVOLUTION fft size -> (K*hop, 2) crossfaded binaural output.

    Identical output to _make_binaural_fn (the irfft@nfft → zero-pad →
    rfft@nfft2 roundtrip is folded into the precomputed atoms, which is
    exact by linearity); the per-hop einsums become one MXU matmul and the
    hot program keeps only the stimulus rfft + output irfft.
    """
    import jax.numpy as jnp

    seg_len = hop + nfft - 1
    nfft2 = 1 << (seg_len - 1).bit_length()
    tail = _make_ola_tail(k_hops, hop, seg_len)

    def fn(segs, coef, dict_re, dict_im):
        bf = jnp.einsum("kj,jfr->kfr", coef, dict_re) + 1j * jnp.einsum(
            "kj,jfr->kfr", coef, dict_im
        )  # (K, F2, 2) convolution-ready BRTF
        sf = jnp.fft.rfft(segs, nfft2, axis=-1)  # (K, F2)
        seg_t = jnp.fft.irfft(sf[:, :, None] * bf, nfft2, axis=1)[:, :seg_len]
        return tail(seg_t)

    return fn


def _make_ola_tail(k_hops: int, hop: int, seg_len: int):
    """Shared back half of the batched binaural programs: sqrt crossfades
    (fade-in on each hop's head, faded-out previous-hop tails taken after
    the host loop's end-truncation) + stride-``hop`` overlap-add. Exactly
    reproduces the host loop (reference sound_examples.py:430-539)."""
    import jax.numpy as jnp

    n_chunks = -(-seg_len // hop)
    # host-truncation offsets: hop k's tail is taken from its segment
    # AFTER truncation to the output buffer, i.e. rows t_k .. t_k + hop
    tail_start = np.array(
        [
            min(seg_len, (k_hops - k) * hop) - hop
            for k in range(max(k_hops - 1, 1))
        ],
        np.int32,
    )
    f_in = fade_windows(hop, fade_out=False, uncorr_fade=True).astype(np.float32)
    f_out = fade_windows(hop, fade_out=True, uncorr_fade=True).astype(np.float32)

    def tail(seg_t):
        # crossfade tails (from the unscaled, host-truncated segments)
        if k_hops > 1:
            idx = tail_start[:, None] + np.arange(hop)[None, :]  # (K-1, hop)
            tails = jnp.take_along_axis(
                seg_t[: k_hops - 1], idx[:, :, None], axis=1
            )
        # fade-in on every hop's head except the first
        scale = jnp.concatenate(
            [jnp.ones((1, hop)), jnp.broadcast_to(f_in, (k_hops - 1, hop))]
        )
        seg_t2 = jnp.concatenate(
            [seg_t[:, :hop] * scale[:, :, None], seg_t[:, hop:]], axis=1
        )

        # overlap-add at stride hop (static chunk loop)
        pad = n_chunks * hop - seg_len
        chunks = jnp.pad(seg_t2, ((0, 0), (0, pad), (0, 0))).reshape(
            k_hops, n_chunks, hop, 2
        )
        out = jnp.zeros(((k_hops + n_chunks) * hop, 2), seg_t2.dtype)
        for m in range(n_chunks):
            out = out.at[m * hop : (m + k_hops) * hop].add(
                chunks[:, m].reshape(k_hops * hop, 2)
            )
        if k_hops > 1:
            out = out.at[hop : k_hops * hop].add(
                (tails * f_out[None, :, None]).reshape((k_hops - 1) * hop, 2)
            )
        return out[: k_hops * hop]

    return tail


@functools.lru_cache(maxsize=8)
def _batched_binaural_fn(k_hops: int, hop: int, nfft: int):
    """Jitted single-trajectory all-hops render (see _make_binaural_fn)."""
    import jax

    return jax.jit(_make_binaural_fn(k_hops, hop, nfft))


@functools.lru_cache(maxsize=8)
def _multi_binaural_fn(k_hops: int, hop: int, nfft: int):
    """Jitted MULTI-trajectory render: vmap over a leading batch axis on
    the stimulus segments, smoothed rotations, and receiver gather index
    (the unique-receiver RTF and HRTF-SH device constants are shared).
    One dispatch renders B trajectories — the fixed dispatch/tunnel cost
    amortises 1/B (the single-dispatch path is dominated by it; see
    DESIGN.md "Binaural renderer floor analysis")."""
    import jax

    return jax.jit(
        jax.vmap(
            _make_binaural_fn(k_hops, hop, nfft),
            in_axes=(0, 0, None, None, 0, None, None),
        )
    )


@functools.lru_cache(maxsize=8)
def _dict_binaural_fn(k_hops: int, hop: int, nfft: int):
    """Jitted single-trajectory dictionary-path render
    (see _make_binaural_dict_fn)."""
    import jax

    return jax.jit(_make_binaural_dict_fn(k_hops, hop, nfft))


@functools.lru_cache(maxsize=8)
def _multi_binaural_dict_fn(k_hops: int, hop: int, nfft: int):
    """Jitted MULTI-trajectory dictionary-path render: vmap over stimulus
    segments + per-trajectory atom weights, dictionary shared."""
    import jax

    return jax.jit(
        jax.vmap(
            _make_binaural_dict_fn(k_hops, hop, nfft),
            in_axes=(0, 0, None, None),
        )
    )
