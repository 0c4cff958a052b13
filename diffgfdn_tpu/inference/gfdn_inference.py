"""GFDN inference: regenerate RIRs from trained checkpoints.

Reference behaviour: src/diff_gfdn/inference.py:50-881 (InferDiffGFDN,
InferDiffDirectionalFDN, octave-band merge) — walk checkpoints backwards,
run the network over the dataset positions, irfft to RIRs (undoing the
reduced-pole-radius envelope), optionally filter each band's output with
the reconstructing filterbank and sum across bands.

TPU notes: the jitted synthesis function keeps complex arrays inside the
program (inputs re/im-encoded, output is the real RIR).
"""

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import fftconvolve

from ..config.schema import DiffGFDNConfig
from ..data.batching import arrays_from_room_dataset, gather_batch
from ..data.room_dataset import RoomDataset
from ..ops.filterbanks import reconstructing_fractional_octave_bands
from ..training.build import build_gfdn_model
from ..training.checkpoints import load_latest_checkpoint
from ..utils.cio import decode_batch, encode_batch, encode_complex

logger = logging.getLogger("diffgfdn_tpu")


def make_rir_synthesis_fn(
    model,
    reduced_pole_radius: float = 1.0,
    external_amplitudes: bool = False,
):
    """Jitted (params, encoded_batch[, amplitudes]) -> RIRs (B, nfft).

    irffts the model's transfer function and undoes sampling outside the
    unit circle with a growing exponential (reference: trainer.py:528-532).
    ``external_amplitudes=True`` adds a (B, num_groups) argument that
    replaces the MLP head's per-group output scalars (the reference's
    direct-CS-amplitude inference mode, inference.py:590-605).
    """

    def _to_rir(params, batch, *amps):
        out = model.apply(params, batch, *amps)
        h = out[0] if model.use_colorless_loss else out
        n = 2 * (h.shape[-1] - 1)
        rir = jnp.fft.irfft(h, n, axis=-1)
        if reduced_pole_radius != 1.0:
            rir = rir * jnp.power(
                1.0 / reduced_pole_radius, jnp.arange(rir.shape[-1])
            )
        return rir

    if external_amplitudes:
        @jax.jit
        def synth(params, enc_batch, amps):
            return _to_rir(params, decode_batch(enc_batch), amps)
    else:
        @jax.jit
        def synth(params, enc_batch):
            return _to_rir(params, decode_batch(enc_batch))

    return synth


def make_time_domain_synthesis_fn(model, params, num_samples: int):
    """Alias-free time-domain RIR synthesis from a TRAINED model.

    Returns ``fn(batch) -> (B, num_samples)``. The feedback loop runs as the
    exact block-feedforward scan (kernels.tdgfdn) — including SOS/IIR
    absorption filters and FILTER-mode polynomial coupling — so the
    infinite reverberant tail has NO time aliasing regardless of length
    (the frequency-sampled path wraps energy beyond nfft; the reference has
    no time-domain core at all, SURVEY §7.1). Output heads:

    * scalar heads: per-position mix is one (B, N) x (N, T) matmul;
    * SVF heads: the per-group output filters (short IIRs) are applied via
      a generously zero-padded rFFT product on the alias-free line outputs;
    * directional models: the loop runs with the TRANSPOSED feedback matrix
      (q = P^T b) and the SH beamforming weights mix the per-line outputs —
      returns (B, (ambi_order+1)^2, num_samples) SRIRs.

    The direct/early path is NOT added here — renderers splice it
    separately (reference sound_examples.py:25-77).
    """
    from ..kernels.tdgfdn import (
        delay_line_outputs,
        delay_line_outputs_filtered,
        delay_line_outputs_pallas,
        filter_bank_from_gains,
        filter_bank_from_iir,
        filter_bank_from_sos,
        use_pallas_kernel,
    )
    from ..models.gain_heads import expand_groups_to_delay_lines

    nper = model.num_delay_lines_per_group
    delays = tuple(int(d) for d in model.delays)

    def _statics(mdl, x):
        fl = mdl.feedback_loop
        a = fl.coupled_feedback_matrix()
        gamma = None if fl.use_absorption_filters else fl.gamma_scalar()
        return a, mdl.input_gains[:, 0], gamma

    def _scalar_gains(mdl, x):
        g = mdl.output_scalars(x)
        return expand_groups_to_delay_lines(g, nper) * mdl.output_gains[:, 0]

    def _group_resp(mdl, x):
        return mdl.output_filters(x)  # (B, G, F) complex

    from ..models import DiffDirectionalFDNVarReceiverPos

    use_svf = bool(getattr(model, "use_svf_in_output", False))
    directional = isinstance(model, DiffDirectionalFDNVarReceiverPos)

    # ----- factory-time, batch-independent work (computed exactly ONCE) -----
    # the delay-line run y = impulse response of the loop is position-
    # independent; only the output mix depends on the batch
    a, b, gamma = jax.jit(
        lambda p: model.apply(
            p,
            {"z_values": jnp.exp(1j * jnp.zeros(1)).astype(jnp.complex64)},
            method=_statics,
        )
    )(params)
    a_np = np.asarray(a)
    if directional:
        # the directional model reads the TRANSPOSED drive q = P(z)^T b
        # (models/gfdn.py ~:565); P^T = (D Gamma^-1 - A^T)^-1 since the
        # delay/absorption part is diagonal, so the time-domain loop simply
        # runs with the transposed feedback matrix
        a = jnp.swapaxes(a, -1, -2)
    impulse = jnp.zeros(num_samples, jnp.float32).at[0].set(1.0)
    if model.sos_coeffs is not None:
        bank = filter_bank_from_sos(np.asarray(model.sos_coeffs), delays)
        y = delay_line_outputs_filtered(delays, bank, a, b, impulse)
    elif model.iir_coeffs is not None:
        bank = filter_bank_from_iir(np.asarray(model.iir_coeffs), delays)
        y = delay_line_outputs_filtered(delays, bank, a, b, impulse)
    elif a_np.ndim == 3:  # FILTER coupling with scalar absorption
        bank = filter_bank_from_gains(np.asarray(gamma), delays)
        y = delay_line_outputs_filtered(delays, bank, a, b, impulse)
    elif use_pallas_kernel(delays):
        # measured scan-vs-kernel policy (kernels/tdgfdn.py): the compiled
        # Mosaic kernel is selected only on TPU placement with a recorded
        # measurement showing it at least as fast as the scan
        y = delay_line_outputs_pallas(
            delays, gamma, a, b, impulse, interpret=False
        )
    else:
        y = delay_line_outputs(delays, gamma, a, b, impulse)  # (T, N)
    y = jax.device_put(y)

    if directional:
        # SH-domain SRIRs: rir_sh[b, l, t] = sum_g w[b, g, l] y[t, g, l]
        g_groups = model.num_groups

        def _sh_weights(mdl, x):
            sh_gains = mdl.sh_output_scalars(x, normalise=True)
            return sh_gains * mdl.output_gains.reshape(g_groups, nper)[None]

        @jax.jit
        def _mix_sh(p, e, y_dev):
            w = model.apply(p, decode_batch(e), method=_sh_weights)
            y_gl = y_dev.reshape(num_samples, g_groups, nper)
            return jnp.einsum(
                "bgl,tgl->blt", w, y_gl, precision=jax.lax.Precision.HIGHEST
            )

        def synth(batch) -> jnp.ndarray:
            return _mix_sh(params, encode_batch(batch), y)

        return synth

    # jitted per-batch heads, created ONCE so repeat synth() calls hit the
    # jit cache (a fresh jit(lambda) per call would re-trace every time)
    if not use_svf:
        @jax.jit
        def _mix_scalar(p, e, y_dev):
            c = model.apply(p, decode_batch(e), method=_scalar_gains)
            return (y_dev @ c.T).T

        def synth(batch) -> jnp.ndarray:
            return _mix_scalar(params, encode_batch(batch), y)

        return synth

    # SVF heads: apply the (short-IIR) output filters with a padded rFFT
    # product — the loop part above is already alias-free
    nfft2 = 1 << int(np.ceil(np.log2(num_samples + 4096)))
    z2 = np.exp(1j * np.linspace(0.0, np.pi, nfft2 // 2 + 1)).astype(
        np.complex64
    )
    out_gains = np.asarray(
        jax.jit(lambda p: model.apply(p, method=lambda m: m.output_gains[:, 0]))(
            params
        )
    )
    yf = jnp.fft.rfft(y, nfft2, axis=0)  # (F2, N)
    line_group = np.repeat(np.arange(model.num_groups), nper)

    @jax.jit
    def _mix_svf(p, e, yf_dev):
        r = model.apply(p, decode_batch(e), method=_group_resp)  # (B, G, F2)
        h = jnp.einsum(
            "n,bnf,fn->bf",
            jnp.asarray(out_gains, jnp.complex64),
            r[:, line_group, :],
            yf_dev,
        )
        return jnp.fft.irfft(h, nfft2, axis=-1)[:, :num_samples]

    def synth(batch) -> jnp.ndarray:
        x2 = dict(batch)
        x2["z_values"] = z2
        return _mix_svf(params, encode_batch(x2), yf)

    return synth


class InferDiffGFDN:
    """Regenerate RIRs and head parameters from a trained checkpoint."""

    def __init__(
        self,
        config: DiffGFDNConfig,
        room_data: RoomDataset,
        variant: str = "var_receiver",
        params: Optional[Dict] = None,
    ):
        self.config = config
        self.room_data = room_data
        # rebuild EXACTLY as the solver built it: a colorless warm start
        # fixes the io gains (they are constants, not checkpoint params),
        # so the prototype results must be reloaded or the checkpoint
        # cannot be applied (reference: inference.py rebuilds through the
        # same config path)
        colorless_params = None
        ccfg = config.colorless_fdn_config
        if ccfg.use_colorless_prototype:
            from ..training.build import load_colorless_fdn_params
            from ..training.solver import run_training_colorless_fdn

            if ccfg.load_fixed_parameters:
                colorless_params = load_colorless_fdn_params(
                    config, ccfg.saved_param_path
                )
            else:
                # loads the per-group pickles cached during training
                # (train_dir/colorless-fdn/); only retrains if missing
                from pathlib import Path

                colorless_dir = (
                    Path(config.trainer_config.train_dir) / "colorless-fdn"
                )
                missing = [
                    g + 1
                    for g in range(config.num_groups)
                    if not (
                        colorless_dir / f"parameters_opt_group={g + 1}.pkl"
                    ).exists()
                ]
                if missing:
                    # the prototype fixes the io gains the checkpoint was
                    # optimized against; a fresh retrain (different
                    # backend/optimizer build) can yield DIFFERENT gains
                    # and silently wrong RIRs
                    logger.warning(
                        "colorless prototype pickles missing for group(s) "
                        "%s under %s — RETRAINING them now; if this "
                        "checkpoint was trained elsewhere, copy its "
                        "colorless-fdn/ directory instead (retrained io "
                        "gains may not match the checkpoint)",
                        missing,
                        colorless_dir,
                    )
                colorless_params = run_training_colorless_fdn(
                    config, room_data.num_freq_bins // 16
                )
        self.model = build_gfdn_model(
            config,
            common_decay_times=room_data.common_decay_times,
            band_centre_hz=room_data.band_centre_hz,
            colorless_params=colorless_params,
            variant=variant,
            inference_solve=True,
        )
        if params is None:
            params = load_latest_checkpoint(
                config.trainer_config.train_dir, config.trainer_config.max_epochs
            )
            if params is None:
                raise FileNotFoundError(
                    f"no checkpoint under {config.trainer_config.train_dir}"
                )
        self.params = params
        self._synth = make_rir_synthesis_fn(
            self.model, config.trainer_config.reduced_pole_radius
        )
        self._amp_synth = None  # built on first rirs_with_amplitudes call
        # subband models train against band-filtered targets; compensate
        # the output level by the band filter's energy, as the reference
        # does on every inference path (inference.py:123-127,231-232,473)
        self.subband_filter_norm_factor = 1.0
        spc = config.trainer_config.subband_process_config
        if spc is not None:
            filters, centers = reconstructing_fractional_octave_bands(
                num_fractions=spc.num_fraction_octaves,
                frequency_range=spc.frequency_range,
                n_samples=2 ** 12,
                sampling_rate=room_data.sample_rate,
            )
            b = filters[int(np.argmin(np.abs(centers - spc.centre_frequency)))]
            self.subband_filter_norm_factor = subband_energy_compensation(b)

    def _arrays(self):
        tc = self.config.trainer_config
        return arrays_from_room_dataset(
            self.room_data,
            new_sampling_radius=(
                None
                if tc.reduced_pole_radius == 1.0
                else 1.0 / tc.reduced_pole_radius
            ),
        )

    def _batched_synth(
        self, synth, rec_indices, batch_size: int, amplitudes=None
    ) -> np.ndarray:
        """Pad-to-batch/trim loop shared by all synthesis entry points."""
        arrays = self._arrays()
        rec_indices = np.asarray(rec_indices)
        outs = []
        for k in range(0, len(rec_indices), batch_size):
            idx = rec_indices[k : k + batch_size]
            n_real = len(idx)
            pad = batch_size - n_real
            if pad:  # pad to full batch for a single compile, then trim
                idx = np.concatenate([idx, idx[:1].repeat(pad)])
            batch = encode_batch(gather_batch(arrays, idx))
            if amplitudes is None:
                rir = np.asarray(synth(self.params, batch))
            else:
                amp = amplitudes[k : k + batch_size]
                if pad:
                    amp = np.concatenate([amp, amp[:1].repeat(pad, axis=0)])
                rir = np.asarray(synth(self.params, batch, amp))
            outs.append(rir[:n_real])
        return self.subband_filter_norm_factor * np.concatenate(outs, axis=0)

    def rirs_at(self, rec_indices: np.ndarray, batch_size: int = 32) -> np.ndarray:
        """Synthesize RIRs at the given dataset receiver indices."""
        return self._batched_synth(self._synth, rec_indices, batch_size)

    def rirs_with_amplitudes(
        self,
        rec_indices: np.ndarray,
        amplitudes: np.ndarray,
        batch_size: int = 32,
    ) -> np.ndarray:
        """Synthesize with EXTERNALLY provided common-slope amplitudes.

        ``amplitudes`` (len(rec_indices), num_groups) replace the MLP
        head's per-group output scalars — the reference's direct-CS-
        amplitude inference mode (inference.py:590-605), used to drive a
        trained GFDN from a common-slopes model's amplitude predictions.
        Scalar-head models only (SVF heads have no scalar injection point).
        """
        if getattr(self.model, "use_svf_in_output", False):
            raise ValueError(
                "direct CS-amplitude injection needs a scalar-head model "
                "(use_svf_in_output=False)"
            )
        rec_indices = np.asarray(rec_indices)
        amplitudes = np.asarray(amplitudes, np.float32)
        expected = (len(rec_indices), self.model.num_groups)
        if amplitudes.shape != expected:
            raise ValueError(
                f"amplitudes must have shape {expected} "
                f"(one row per receiver index), got {amplitudes.shape}"
            )
        if self._amp_synth is None:
            # cache: building per call would retrace/recompile every time
            self._amp_synth = make_rir_synthesis_fn(
                self.model,
                self.config.trainer_config.reduced_pole_radius,
                external_amplitudes=True,
            )
        return self._batched_synth(
            self._amp_synth, rec_indices, batch_size, amplitudes
        )

    def head_outputs(self, rec_indices: np.ndarray) -> Dict:
        """Per-position head outputs (gains / SVF params) at the indices."""
        arrays = arrays_from_room_dataset(self.room_data)
        batch = gather_batch(arrays, np.asarray(rec_indices))
        enc = encode_batch(batch)

        @jax.jit
        def run(params, b):
            return self.model.apply(
                params, decode_batch(b), method=type(self.model).head_outputs
            )

        out = run(self.params, enc)
        return {k: np.asarray(v) for k, v in out.items()}


def subband_energy_compensation(band_filter: np.ndarray) -> float:
    """Energy compensation for training on band-filtered targets.

    The reference multiplies each band model's output by the L2 norm of
    its band filter's FIR coefficients (inference.py:144-159
    ``get_norm_factor``); applied by InferDiffGFDN whenever the config
    carries a subband_process_config (inference.py:231-232, 473).
    """
    return float(np.sqrt(np.sum(np.asarray(band_filter) ** 2)))


def merge_subband_rirs(
    band_rirs: List[np.ndarray],
    band_filters: np.ndarray,
) -> np.ndarray:
    """Filter each band's synthesized RIRs with its reconstructing filter
    and sum across bands -> broadband RIRs.

    ``band_rirs``: list of (..., T) arrays, one per band (any leading dims —
    positions, ambisonic channels); ``band_filters``: (num_bands, filt_len).
    Group delay of the linear-phase filterbank is compensated (reference:
    run_subband_training_treble.py:308-373).
    """
    num_bands = len(band_rirs)
    t_len = band_rirs[0].shape[-1]
    filt_len = band_filters.shape[-1]
    delay = filt_len // 2
    out = np.zeros(band_rirs[0].shape)
    shape = (1,) * (band_rirs[0].ndim - 1) + (filt_len,)
    for b in range(num_bands):
        filtered = fftconvolve(
            band_rirs[b], band_filters[b].reshape(shape), mode="full", axes=-1
        )
        out += filtered[..., delay : delay + t_len]
    return out


def _band_reconstruction_filters(
    configs: List[DiffGFDNConfig], sample_rate: float, fir_len: int
) -> np.ndarray:
    """Per-config reconstructing octave filters, nearest-centre matched."""
    centre_freqs = [
        c.trainer_config.subband_process_config.centre_frequency for c in configs
    ]
    frange = configs[0].trainer_config.subband_process_config.frequency_range
    filters, centers = reconstructing_fractional_octave_bands(
        num_fractions=1,
        frequency_range=frange,
        n_samples=fir_len,
        sampling_rate=sample_rate,
    )
    band_idx = [int(np.argmin(np.abs(centers - fc))) for fc in centre_freqs]
    return filters[band_idx]


def infer_all_octave_bands(
    configs: List[DiffGFDNConfig],
    room_data: RoomDataset,
    rec_indices: np.ndarray,
    variant: str = "var_receiver",
    fir_len: int = 2 ** 12,
) -> np.ndarray:
    """Run all per-band models and reconstruct broadband RIRs.

    One config per octave band (with its subband_process_config set); the
    per-band outputs are band-filtered and summed (reference:
    run_subband_training_treble.py:207-375).
    """
    filters = _band_reconstruction_filters(
        configs, room_data.sample_rate, fir_len
    )
    band_rirs = []
    for cfg in configs:
        infer = InferDiffGFDN(cfg, room_data, variant=variant)
        band_rirs.append(infer.rirs_at(rec_indices))
    return merge_subband_rirs(band_rirs, filters)


def broadband_edc_errors_device(
    configs: List[DiffGFDNConfig],
    room_data: RoomDataset,
    rec_indices: Optional[np.ndarray] = None,
    batch_size: int = 32,
    fir_len: int = 2 ** 12,
    params_per_band: Optional[List] = None,
) -> np.ndarray:
    """Per-receiver broadband EDC error (dB), computed entirely ON DEVICE.

    The TPU-native counterpart of ``infer_all_octave_bands`` + host EDC
    analysis: for each receiver batch, every per-band model's transfer
    function is evaluated, multiplied by its DELAY-COMPENSATED
    reconstructing-filter response (frequency-domain equivalent of the
    host path's linear convolution + group-delay trim — the circular
    wrap-around lives below the decayed tail), scaled by the band's
    energy-compensation factor, summed across bands, irfft'd to the
    broadband RIR, and compared to the measured RIR's Schroeder EDC — all
    inside ONE jitted program. Only the per-receiver error scalars cross
    the device boundary; the host path fetches every (R, nfft) band RIR
    (~3.5 GB through the TPU tunnel at the 838-receiver production scale).

    Returns (len(rec_indices),) mean |ΔdB| EDC errors (the reference's
    "Mean EDC error in dB" inference log, inference.py:636).
    """
    from ..ops.basic import db as db_fn
    from ..ops.basic import ms_to_samps, schroeder_backward_int

    if rec_indices is None:
        rec_indices = np.arange(room_data.num_rec)
    rec_indices = np.asarray(rec_indices)
    fs = room_data.sample_rate
    tc0 = configs[0].trainer_config
    nfft = room_data.num_freq_bins
    f = nfft // 2 + 1

    # delay-compensated band reconstruction responses, (num_bands, F, 2)
    filters = _band_reconstruction_filters(configs, fs, fir_len)
    delay = filters.shape[-1] // 2
    fresp = np.fft.rfft(filters, nfft, axis=-1) * np.exp(
        2j * np.pi * np.arange(f) * delay / nfft
    )
    fresp_ri = np.stack(
        [fresp.real, fresp.imag], axis=-1
    ).astype(np.float32)

    models, params, norms = [], [], []
    for b, cfg in enumerate(configs):
        infer = InferDiffGFDN(
            cfg,
            room_data,
            params=None if params_per_band is None else params_per_band[b],
        )
        models.append(infer.model)
        params.append(infer.params)
        norms.append(float(infer.subband_filter_norm_factor))

    mix = ms_to_samps(20.0, fs)
    end = min(
        ms_to_samps(float(np.max(room_data.common_decay_times)) * 1e3, fs),
        nfft,
    )
    rpr = tc0.reduced_pole_radius

    # upload the dataset ONCE (encoded re/im); per-batch gathers happen on
    # device by int32 index — the per-batch host re-upload cost ~1.3 GB of
    # tunnel traffic over the 838-receiver production grid
    _SHARED = ("z_values", "mesh_2d", "sph_directions")

    @jax.jit
    def errors_all(all_params, data, idx_mat, band_fr):
        # ONE dispatch for every receiver batch: lax.scan over the index
        # matrix (device-resident gathers, as in GFDNTrainer's scanned
        # epochs) — the per-batch python loop cost a tunnel round trip per
        # batch and left the device idle between dispatches
        def body(carry, idx):
            gathered = {}
            for k, v in data.items():
                base = k[: -len("__ri")] if k.endswith("__ri") else k
                gathered[k] = v if base in _SHARED else v[idx]
            batch = decode_batch(gathered)
            h = jnp.zeros((idx.shape[0], f), jnp.complex64)
            for b, mdl in enumerate(models):  # unrolled: heterogeneous params
                out = mdl.apply(all_params[b], batch)
                hb = out[0] if mdl.use_colorless_loss else out
                fr = band_fr[b, :, 0] + 1j * band_fr[b, :, 1]
                h = h + norms[b] * hb * fr
            rir = jnp.fft.irfft(h, nfft, axis=-1)
            if rpr != 1.0:
                rir = rir * jnp.power(1.0 / rpr, jnp.arange(nfft))
            tgt = batch["target_rir_response"]
            tgt_rir = jnp.fft.irfft(tgt, nfft, axis=-1)
            a_edc = db_fn(
                schroeder_backward_int(rir[..., mix:end]), is_squared=True
            )
            t_edc = db_fn(
                schroeder_backward_int(tgt_rir[..., mix:end]), is_squared=True
            )
            return carry, jnp.mean(jnp.abs(a_edc - t_edc), axis=-1)

        _, errs = jax.lax.scan(body, 0, idx_mat)
        return errs

    tc = configs[0].trainer_config
    arrays = arrays_from_room_dataset(
        room_data,
        new_sampling_radius=(
            None if tc.reduced_pole_radius == 1.0 else 1.0 / tc.reduced_pole_radius
        ),
    )
    band_fr = jnp.asarray(fresp_ri)
    # whole small planes only — never gather_batch here: its fancy-index
    # pass would materialize (and host-rfft) every ~440 MB target plane.
    # The program reads target_rir_response only as an EDC reference, so
    # its spectra come from the device-side rfft of the (int8-shipped,
    # cached, training-shared) time samples; the early injection likewise
    # rffts its ~2 MB time segment on device; the late plane is never read
    full = {
        "z_values": arrays.z_values,
        "source_position": arrays.source_position,
        "listener_position": arrays.listener_position,
        "norm_listener_position": arrays.norm_listener_position,
    }
    if arrays.target_common_slope_amps is not None:
        full["target_common_slope_amps"] = arrays.target_common_slope_amps
    if arrays.mesh_2d is not None:
        full["mesh_2d"] = arrays.mesh_2d
    data = {k: jnp.asarray(v) for k, v in encode_batch(full).items()}
    early_t = getattr(arrays, "target_early_time", None)
    if early_t is not None:
        from ..utils.cio import device_early_response_ri

        data["target_early_response__ri"] = device_early_response_ri(
            early_t, nfft
        )
    else:
        data["target_early_response__ri"] = jnp.asarray(
            encode_complex(
                np.ascontiguousarray(
                    arrays.target_early_response, np.complex64
                )
            )
        )
    if getattr(arrays, "target_rir_time", None) is not None:
        from ..utils.cio import device_target_spectra_ri

        data["target_rir_response__ri"] = device_target_spectra_ri(arrays)
    else:
        data["target_rir_response__ri"] = jnp.asarray(
            encode_complex(
                np.ascontiguousarray(arrays.target_rir_response, np.complex64)
            )
        )
    n = len(rec_indices)
    pad = (-n) % batch_size
    idx_flat = np.concatenate([rec_indices, rec_indices[:1].repeat(pad)]) \
        if pad else rec_indices
    idx_mat = jnp.asarray(
        idx_flat.reshape(-1, batch_size), jnp.int32
    )
    errs = np.asarray(errors_all(tuple(params), data, idx_mat, band_fr))
    return errs.reshape(-1)[:n]


def infer_all_octave_bands_directional(
    configs: List[DiffGFDNConfig],
    room_data,
    rec_indices: np.ndarray,
    convert_to_ambisonics: bool = False,
    fir_len: int = 2 ** 12,
) -> np.ndarray:
    """Directional all-band inference -> broadband ambisonic/SH SRIRs.

    One directional-FDN config per octave band; per-band SH responses are
    band-filtered with the reconstructing filterbank and summed across
    bands. ``convert_to_ambisonics``: if the models output directional
    responses, project back to the SH domain via the synthesis filterbank
    (reference: inference.py:290-881, infer_all_octave_bands_directional_fdn).
    Returns (num_pos, num_channels, T).
    """
    filters = _band_reconstruction_filters(
        configs, room_data.sample_rate, fir_len
    )
    band_rirs = []
    for cfg in configs:
        infer = InferDiffGFDN(cfg, room_data, variant="directional")
        band_rirs.append(infer.rirs_at(rec_indices))  # (P, n_ambi, T)
    srirs = merge_subband_rirs(band_rirs, filters)

    if convert_to_ambisonics and room_data.sph_directions is not None:
        from .cs_synthesis import convert_directional_rirs_to_ambisonics

        srirs = convert_directional_rirs_to_ambisonics(
            room_data.ambi_order,
            room_data.sph_directions,
            configs[0].output_filter_config.beamformer_type,
            srirs.transpose(1, 0, 2),
        )
    return srirs
