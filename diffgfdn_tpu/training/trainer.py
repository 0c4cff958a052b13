"""GFDN trainers: jitted train/valid steps, epoch loop, early stopping.

Reference behaviour: trainer.py:26-921 (Trainer / VarReceiverPosTrainer /
SinglePosTrainer / DirectionalFDNVarReceiverPosTrainer), re-designed around
pure functions:

* one jitted ``train_step(params, opt_state, batch, key)`` per config —
  static loss structure, static batch shapes;
* sub-FDN energy normalization is a jitted ``params -> params`` map
  (the reference mutates ``.data`` in-place, trainer.py:317-332);
* per-epoch checkpoints + loss history; early stop on |Δvalid| <= tol for
  ``patience`` epochs.
"""

import logging
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import TrainerConfig
from ..losses import (
    amse_loss,
    directional_edc_loss_from_sh,
    edc_loss,
    edr_loss,
    frequency_weighting,
    mse_loss,
    reg_loss,
    sparsity_loss,
)
from ..losses.gfdn import edc_loss_from_rir, edr_loss_from_rir
from ..ops.basic import ms_to_samps
from ..ops.stft import erb_filterbank
from ..ops.unitary import orthogonal_from_skew
from ..models.gfdn import DiffGFDN
from ..utils.cio import decode_batch, encode_batch
from .checkpoints import _to_numpy, save_checkpoint, save_opt_state
from .optim import make_optimizer
from .scan import scan_epoch

logger = logging.getLogger("diffgfdn_tpu")


def padded_batches(idx: np.ndarray, batch_size: int):
    """Split an index vector into full batches, padding the tail.

    Every item appears at least once (nothing is dropped) and every batch
    has exactly ``batch_size`` entries (one compiled shape); the tail is
    padded by wrapping around to the head.
    """
    n = len(idx)
    for k in range(max(1, -(-n // batch_size))):
        b = idx[k * batch_size : (k + 1) * batch_size]
        if len(b) == 0:
            return
        if len(b) < batch_size:
            b = np.concatenate([b, idx[: batch_size - len(b)]])
        yield b


def exact_valid_batches(idx: np.ndarray, batch_size: int):
    """Full batches plus an UNPADDED remainder batch (validation splits).

    Unlike ``padded_batches`` nothing wraps around, so an item-count-
    weighted mean over the returned batches equals the unpadded per-item
    mean exactly — no over-weighting of wrapped duplicates. The remainder
    batch compiles once at its own static shape (validation-only cost).
    Returns ``(full_batches, remainder)`` where ``remainder`` may be empty.
    """
    idx = np.asarray(idx)
    n = len(idx)
    full = [
        idx[k * batch_size : (k + 1) * batch_size]
        for k in range(n // batch_size)
    ]
    return full, idx[(n // batch_size) * batch_size :]


class GFDNTrainer:
    """Trainer for position-conditioned (grid) GFDNs."""

    patience: int = 5
    early_stop_tol: float = 1e-3

    def __init__(
        self,
        model: DiffGFDN,
        trainer_config: TrainerConfig,
        steps_per_epoch: int,
        common_decay_times: Optional[np.ndarray] = None,
        subband_filter_resp: Optional[np.ndarray] = None,
        sample_rate: Optional[float] = None,
        directional_envelopes: Optional[np.ndarray] = None,
    ):
        self.model = model
        self.cfg = trainer_config
        self.steps_per_epoch = max(1, steps_per_epoch)
        self.sample_rate = sample_rate or model.sample_rate
        # stored re/im-stacked: complex closure constants would be transferred
        # to the device as complex buffers, which this TPU backend rejects
        self.subband_filter_resp = (
            None
            if subband_filter_resp is None
            else np.stack(
                [np.real(subband_filter_resp), np.imag(subband_filter_resp)],
                axis=-1,
            ).astype(np.float32)
        )
        self.directional_envelopes = (
            None
            if directional_envelopes is None
            else jnp.asarray(directional_envelopes, jnp.float32)
        )
        self.use_directional = directional_envelopes is not None
        # MXU matmul-irfft in the directional loss (ops/mxu_fft.py).
        # Default OFF: A/B on the real chip (round 3, optimizer-chained
        # full steps) measured 56.0 ms vs 44.7 ms with the native fft at
        # the N=27/batch-16/nfft-131072 scale — the four-step transform's
        # 75 MB re/im intermediates and transposes cost more than the
        # serial fft thunk saves. Kept as an opt-in for stacks/scales
        # where the native fft is weaker.
        self.use_mxu_fft = False
        # fit_indexed runs each epoch as ONE jitted lax.scan over its steps
        # (a single dispatch per epoch). Set False to restore per-step
        # dispatch (step-level introspection / debugging).
        self.scan_epochs = True

        if common_decay_times is None:
            self.max_ir_len_ms = 2000.0
        else:
            self.max_ir_len_ms = float(np.max(common_decay_times)) * 1e3
        self.mixing_time_samps = ms_to_samps(20.0, self.sample_rate)
        self.max_ir_len_samps = ms_to_samps(self.max_ir_len_ms, self.sample_rate)

        # EDR STFT window: 4096 like the reference (losses.py:384) unless the
        # IR is short — then shrink so there are >= 4 frames
        time_len = (
            trainer_config.num_freq_bins
            if trainer_config.num_freq_bins is not None
            else 2 ** 17
        )
        self.edr_win = min(2 ** 12, 2 ** int(np.log2(max(time_len // 4, 8))))
        self.edr_hop = self.edr_win // 2

        self.erb_filters = None
        erb_centres = None
        if trainer_config.use_erb_edr_loss:
            fb, erb_centres = erb_filterbank(
                self.sample_rate, self.edr_win, 2 ** 6
            )
            self.erb_filters = jnp.asarray(fb, jnp.float32)
        self.freq_weights = None
        if trainer_config.use_frequency_weighting:
            # with ERB grouping the EDR frequency axis is the 64 ERB band
            # centres, not the rfft grid — the weights must share that axis
            freqs = (
                erb_centres
                if erb_centres is not None
                else np.fft.rfftfreq(self.edr_win, d=1.0 / self.sample_rate)
            )
            self.freq_weights = frequency_weighting(np.asarray(freqs))

        self.train_loss: List[float] = []
        self.valid_loss: List[float] = []
        self.individual_train_loss: List[Dict[str, float]] = []
        self.individual_valid_loss: List[Dict[str, float]] = []
        self._early_stop = 0

        self._train_step = jax.jit(self._make_step(training=True))
        self._valid_step = jax.jit(self._make_step(training=False))
        self._normalize = jax.jit(self._normalize_params)
        self.optimizer: Optional[optax.GradientTransformation] = None

    # ----------------------------- loss assembly -----------------------------

    def _model_outputs(self, params, batch):
        out = self.model.apply(params, batch)
        if self.model.use_colorless_loss:
            h, h_sub = out
        else:
            h, h_sub = out, None
        if self.subband_filter_resp is not None:
            sf = self.subband_filter_resp
            # h * (sf_re + 1j sf_im) with only traced complex arithmetic
            h = h * sf[..., 0] + 1j * (h * sf[..., 1])
        return h, h_sub

    def _losses(self, params, batch, key) -> Dict[str, jnp.ndarray]:
        h, h_sub = self._model_outputs(params, batch)
        mask_key = key if self.cfg.use_edc_mask else None
        all_losses: Dict[str, jnp.ndarray] = {}

        if self.use_directional:
            # irfft the L SH channels and beamform with a REAL time-domain
            # matmul (the analysis matrix commutes with the irfft) — J/L
            # fewer FFTs and no (B, J, F) complex intermediate
            all_losses["edc_loss"] = (
                self.cfg.edc_loss_weight * directional_edc_loss_from_sh(
                    h,
                    np.asarray(self.model.analysis_matrix, np.float32),
                    batch["target_common_slope_amps"],
                    self.directional_envelopes,
                    self.mixing_time_samps,
                    self.max_ir_len_samps,
                    mask_key=mask_key,
                    use_matmul_irfft=self.use_mxu_fft,
                )
            )
        elif "target_edc_db" in batch:
            # fast path: precomputed target features + ONE shared irfft of
            # the achieved response feeding both losses
            n = 2 * (h.shape[-1] - 1)
            rir = jnp.fft.irfft(h, n, axis=-1)
            end = min(self.max_ir_len_samps, n)
            rir_trunc = rir[..., self.mixing_time_samps : end]
            all_losses["edc_loss"] = self.cfg.edc_loss_weight * edc_loss_from_rir(
                batch["target_edc_db"], rir_trunc, mask_key=mask_key
            )
            rir_env = rir
            if self.cfg.reduced_pole_radius != 1.0:
                rir_env = rir * jnp.power(
                    1.0 / self.cfg.reduced_pole_radius, jnp.arange(n)
                )
            all_losses["edr_loss"] = self.cfg.edr_loss_weight * edr_loss_from_rir(
                batch["target_edr_db"],
                batch["target_edr_abs_sum"],
                rir_env,
                win_size=self.edr_win,
                hop_size=self.edr_hop,
                erb_filters=self.erb_filters,
                frequency_weights=self.freq_weights,
            )
        else:
            target = batch["target_rir_response"]
            all_losses["edr_loss"] = self.cfg.edr_loss_weight * edr_loss(
                target,
                h,
                win_size=self.edr_win,
                hop_size=self.edr_hop,
                reduced_pole_radius=self.cfg.reduced_pole_radius,
                erb_filters=self.erb_filters,
                frequency_weights=self.freq_weights,
            )
            all_losses["edc_loss"] = self.cfg.edc_loss_weight * edc_loss(
                target,
                h,
                self.mixing_time_samps,
                self.max_ir_len_samps,
                mask_key=mask_key,
            )

        if (
            not self.use_directional
            and self.cfg.use_reg_loss
            and getattr(self.model, "use_svf_in_output", False)
        ):
            head = self.model.apply(
                params, batch, method=type(self.model).output_filter_params
            )
            all_losses["reg_loss"] = reg_loss(
                head["biquad_num"],
                head["biquad_den"],
                ms_to_samps(self.cfg.output_filt_ir_len_ms, self.sample_rate),
            )

        if self.model.use_colorless_loss:
            h_out = h_sub[0]  # (F, G)
            spectral_fn = (
                amse_loss if self.cfg.use_asym_spectral_loss else mse_loss
            )
            spectral = 0.0
            for k in range(self.model.num_groups):
                spectral += self.cfg.spectral_loss_weight * spectral_fn(
                    h_out[..., k], jnp.ones_like(jnp.abs(h_out[..., k]))
                )
            m = params["params"]["feedback_loop"]["M"]
            ortho = orthogonal_from_skew(m)
            sparsity = self.cfg.sparsity_loss_weight * sparsity_loss(ortho[-1])
            all_losses["spectral_loss"] = spectral
            all_losses["sparsity_loss"] = sparsity
        return all_losses

    # keys shared across receiver positions (not gathered per batch)
    _SHARED_KEYS = ("z_values", "mesh_2d", "sph_directions")

    def _make_step(self, training: bool) -> Callable:
        # traced fns take complex-free ("encoded") batches — the TPU backend
        # here can't transfer complex arrays; decode is the first traced op
        def loss_fn(params, batch, key):
            all_losses = self._losses(params, batch, key)
            return sum(all_losses.values()), all_losses

        if not training:
            def valid_step(params, enc_batch, key):
                total, aux = loss_fn(params, decode_batch(enc_batch), key)
                return total, aux

            return valid_step

        def train_step(params, opt_state, enc_batch, key):
            batch = decode_batch(enc_batch)
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, aux

        return train_step

    # ----------------------- device-resident data path -----------------------
    # The TPU here sits behind a network tunnel: shipping ~50 MB of host
    # batches per step costs more than the compute. Instead the whole
    # (encoded) dataset is device_put ONCE and batches are gathered ON
    # DEVICE from an index vector — the per-step host->device transfer is
    # just batch_size int32s.

    def upload_arrays(self, arrays) -> Dict:
        """Encode a BatchArrays to device-resident jnp arrays (one transfer).

        With precomputed target features the EDC/EDR fast path never reads
        the raw target spectra (``_losses`` dispatches on ``target_edc_db``),
        so their ~880 MB of re/im pairs at production scale are NOT
        uploaded — the features themselves are already device-resident
        (precompute_target_features).
        """
        from ..utils.cio import device_early_response_ri

        # whole planes go up directly (same key set as gather_batch, but
        # WITHOUT its fancy-index pass, which copies every ~440 MB target
        # plane on the single host core before the transfer)
        full = {
            "z_values": arrays.z_values,
            "source_position": arrays.source_position,
            "listener_position": arrays.listener_position,
            "norm_listener_position": arrays.norm_listener_position,
        }
        fast = bool(arrays.precomputed) and "target_edc_db" in arrays.precomputed
        if not fast:
            # raw spectra are read only by the non-precomputed loss path
            full["target_rir_response"] = np.ascontiguousarray(
                arrays.target_rir_response, np.complex64
            )
            full["target_late_response"] = np.ascontiguousarray(
                arrays.target_late_response, np.complex64
            )
        early_t = getattr(arrays, "target_early_time", None)
        if early_t is None:
            full["target_early_response"] = np.ascontiguousarray(
                arrays.target_early_response, np.complex64
            )
        if arrays.target_common_slope_amps is not None:
            full["target_common_slope_amps"] = arrays.target_common_slope_amps
        if arrays.mesh_2d is not None:
            full["mesh_2d"] = arrays.mesh_2d
        if arrays.precomputed:
            full.update(arrays.precomputed)
        enc = encode_batch(full)
        # large float32 planes (incl. the __ri spectra stacks) ride the
        # int32 bitcast transport — ~12x faster on this tunnel (see
        # utils.cio.fast_device_put)
        from ..utils.cio import fast_device_put

        out = {k: fast_device_put(v) for k, v in enc.items()}
        if early_t is not None:
            # rfft the tiny early time segment on device instead of
            # uploading the full (R, F) early spectrum
            nfft = 2 * (arrays.z_values.shape[0] - 1)
            out["target_early_response__ri"] = device_early_response_ri(
                early_t, nfft
            )
        return out

    def _gather_device(self, data: Dict, idx) -> Dict:
        out = {}
        for k, v in data.items():
            base = k[: -len("__ri")] if k.endswith("__ri") else k
            out[k] = v if base in self._SHARED_KEYS else v[idx]
        return out

    def _make_indexed_step(self, training: bool) -> Callable:
        def loss_fn(params, batch, key):
            all_losses = self._losses(params, batch, key)
            return sum(all_losses.values()), all_losses

        if not training:
            def valid_step(params, data, idx, key):
                batch = decode_batch(self._gather_device(data, idx))
                return loss_fn(params, batch, key)

            return valid_step

        def train_step(params, opt_state, data, idx, key):
            batch = decode_batch(self._gather_device(data, idx))
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, aux

        return train_step

    # ------------------------- scanned epoch path ----------------------------
    # One jitted lax.scan over ALL steps of an epoch (training/scan.py owns
    # the skeleton): a single dispatch per epoch instead of one (or two,
    # with per-step normalization) per step. The PRNG key only drives the
    # optional EDC mask.

    def _make_indexed_epoch(self) -> Callable:
        step = self._make_indexed_step(True)
        normalize_per_step = not getattr(self.model, "use_svf_in_output", False)

        def epoch_fn(params, opt_state, data, idx_mat, epoch_key):
            if not normalize_per_step:
                params = self._normalize_params_from_data(params, data)

            def body(carry, idx, key):
                p, o = carry
                if normalize_per_step:
                    p = self._normalize_params_from_data(p, data)
                p, o, total, aux = step(p, o, data, idx, key)
                return (p, o), (total, aux)

            (params, opt_state), (totals, auxs) = scan_epoch(
                body, (params, opt_state), idx_mat, epoch_key
            )
            return params, opt_state, totals, auxs

        return epoch_fn

    def _make_indexed_valid_epoch(self) -> Callable:
        vstep = self._make_indexed_step(False)

        def epoch_fn(params, data, idx_mat, epoch_key):
            def body(carry, idx, key):
                return carry, vstep(params, data, idx, key)

            _, (totals, auxs) = scan_epoch(body, 0, idx_mat, epoch_key)
            return totals, auxs

        return epoch_fn

    def fit_indexed(
        self,
        params,
        arrays,
        train_idx: np.ndarray,
        valid_idx: np.ndarray,
        seed: int = 0,
        resume: bool = False,
    ):
        """Epoch loop over device-resident data (on-device batch gathers).

        ``resume=True`` restarts from the newest checkpoint in
        ``cfg.train_dir`` (an interrupted run continues at the next epoch;
        the reference never resumes mid-training — its inference merely
        walks checkpoints backwards, inference.py:410-428).
        """
        start_epoch = 0
        resumed_opt_state = None
        if resume:
            from .checkpoints import (
                load_latest_checkpoint_with_epoch,
                load_opt_state,
            )

            found = load_latest_checkpoint_with_epoch(
                self.cfg.train_dir, self.cfg.max_epochs - 1
            )
            if found is not None:
                ckpt, last_epoch = found
                params = jax.tree_util.tree_map(jnp.asarray, ckpt)
                start_epoch = last_epoch + 1
                resumed_opt_state = load_opt_state(
                    self.cfg.train_dir, last_epoch
                )
                logger.info(
                    "resuming from epoch %d (%s optimizer state)",
                    start_epoch,
                    "with" if resumed_opt_state is not None else "without",
                )
        # no opt-state sidecar (pre-sidecar checkpoint): Adam moments restart
        # but the StepLR schedule is offset to the resumed position, so the
        # run never trains at a stale (too-high) learning rate
        count_offset = (
            start_epoch * self.steps_per_epoch
            if resume and resumed_opt_state is None
            else 0
        )
        _t0 = time.time()
        self.optimizer = make_optimizer(
            self.cfg, params, self.steps_per_epoch, count_offset=count_offset
        )
        opt_state = self.optimizer.init(params)
        logger.info("optimizer init: %.1fs", time.time() - _t0)
        if resumed_opt_state is not None:
            opt_state = jax.tree_util.tree_map(jnp.asarray, resumed_opt_state)
        key = jax.random.PRNGKey(seed)
        _t0 = time.time()
        data = self.upload_arrays(arrays)
        logger.info("upload_arrays: %.1fs", time.time() - _t0)
        if len(train_idx) == 0:
            raise ValueError(
                "no training items: train_idx is empty (check "
                "train_valid_split / dataset size) — training would "
                "silently run zero steps"
            )
        bs = min(self.cfg.batch_size, max(1, len(train_idx)))
        vbs = min(self.cfg.batch_size, max(1, len(valid_idx)))

        _t0 = time.time()
        if self.scan_epochs:
            train_epoch = jax.jit(
                self._make_indexed_epoch(), donate_argnums=(0, 1)
            )
            valid_epoch = jax.jit(self._make_indexed_valid_epoch())
            vfull, vrem = exact_valid_batches(valid_idx, vbs)
            vidx_mat = (
                jnp.asarray(np.stack(vfull), jnp.int32) if vfull else None
            )
            valid_step = (
                jax.jit(self._make_indexed_step(False)) if len(vrem) else None
            )
            logger.info("epoch-fn setup: %.1fs", time.time() - _t0)
        else:
            train_step = jax.jit(
                self._make_indexed_step(True), donate_argnums=(0, 1)
            )
            valid_step = jax.jit(self._make_indexed_step(False))
            normalize = jax.jit(
                lambda p, d: self._normalize_params_from_data(p, d)
            )
        if start_epoch == 0:
            _t0 = time.time()
            save_checkpoint(self.cfg.train_dir, -1, params)
            logger.info("initial checkpoint: %.1fs", time.time() - _t0)
        normalize_per_step = not getattr(self.model, "use_svf_in_output", False)

        rng = np.random.RandomState(seed)
        # replay the permutation stream so a resumed run sees the same
        # batch order it would have seen uninterrupted (the PRNG key only
        # drives the optional EDC mask and need not replay exactly)
        for _ in range(start_epoch):
            rng.permutation(len(train_idx))
        start = time.time()
        for epoch in range(start_epoch, self.cfg.max_epochs):
            ep_start = time.time()
            perm = train_idx[rng.permutation(len(train_idx))]
            if self.scan_epochs:
                # ONE dispatch for the whole training epoch (lax.scan over
                # steps) and one for validation; the host fetches the
                # per-step loss vectors once per epoch
                batches = list(padded_batches(perm, bs))
                idx_mat = jnp.asarray(np.stack(batches), jnp.int32)
                key, ek = jax.random.split(key)
                params, opt_state, totals, auxs = train_epoch(
                    params, opt_state, data, idx_mat, ek
                )
                # dispatch train + valid reductions, then fetch every
                # epoch scalar in ONE pipelined batch (each blocking
                # float() costs a full tunnel round trip, ~45 ms — with
                # several aux keys that was ~0.7 s/epoch of pure latency)
                dev = {
                    "t": jnp.mean(totals),
                    "ta": {k: jnp.mean(v) for k, v in auxs.items()},
                }
                if vidx_mat is not None:
                    key, vk = jax.random.split(key)
                    vtotals, vauxs = valid_epoch(params, data, vidx_mat, vk)
                    dev["v"] = jnp.sum(vtotals)
                    dev["va"] = {k_: jnp.sum(v) for k_, v in vauxs.items()}
                if len(vrem):
                    key, rk = jax.random.split(key)
                    rtot, raux = valid_step(
                        params, data, jnp.asarray(vrem, jnp.int32), rk
                    )
                    dev["r"] = rtot
                    dev["ra"] = raux
                host = _to_numpy(dev)
                self.train_loss.append(float(host["t"]))
                self.individual_train_loss.append(
                    {k: float(v) for k, v in host["ta"].items()}
                )
                if vidx_mat is not None or len(vrem):
                    # item-count-weighted mean over full batches + the
                    # unpadded remainder = exact unpadded per-item mean
                    vtot, vaux_sum, vweight = 0.0, {}, 0
                    if vidx_mat is not None:
                        vtot += float(host["v"]) * vbs
                        for k_, v in host["va"].items():
                            vaux_sum[k_] = float(v) * vbs
                        vweight += vbs * vidx_mat.shape[0]
                    if len(vrem):
                        vtot += float(host["r"]) * len(vrem)
                        for k_, v in host["ra"].items():
                            vaux_sum[k_] = (
                                vaux_sum.get(k_, 0.0) + float(v) * len(vrem)
                            )
                        vweight += len(vrem)
                    self.valid_loss.append(vtot / vweight)
                    self.individual_valid_loss.append(
                        {k_: v / vweight for k_, v in vaux_sum.items()}
                    )
                else:
                    self.valid_loss.append(0.0)
                    self.individual_valid_loss.append({})
            else:
                # per-step dispatch path: losses still accumulate ON DEVICE
                # (fetching a scalar every step costs a full tunnel round
                # trip, ~45 ms) — steps stay pipelined and the host syncs
                # once per epoch
                ep_loss, ep_all, n_train = None, {}, 0
                if not normalize_per_step:
                    params = normalize(params, data)
                for bidx in padded_batches(perm, bs):
                    idx = jnp.asarray(bidx, jnp.int32)
                    if normalize_per_step:
                        params = normalize(params, data)
                    key, sub = jax.random.split(key)
                    params, opt_state, total, aux = train_step(
                        params, opt_state, data, idx, sub
                    )
                    ep_loss = total if ep_loss is None else ep_loss + total
                    for kk, v in aux.items():
                        ep_all[kk] = v if kk not in ep_all else ep_all[kk] + v
                    n_train += 1

                # validation: item-count-weighted over full + remainder
                # batches (exact unpadded per-item mean, no wrap bias)
                ev_loss, ev_all, w_valid = None, {}, 0
                vfull_b, vrem_b = exact_valid_batches(valid_idx, vbs)
                vbatch_list = vfull_b + ([vrem_b] if len(vrem_b) else [])
                for vidx in vbatch_list:
                    key, sub = jax.random.split(key)
                    total, aux = valid_step(
                        params, data, jnp.asarray(vidx, jnp.int32), sub
                    )
                    w = len(vidx)
                    ev_loss = (
                        total * w if ev_loss is None else ev_loss + total * w
                    )
                    for kk, v in aux.items():
                        ev_all[kk] = (
                            v * w if kk not in ev_all else ev_all[kk] + v * w
                        )
                    w_valid += w

                self.train_loss.append(
                    float(ep_loss) / max(n_train, 1)
                    if ep_loss is not None else 0.0
                )
                self.individual_train_loss.append(
                    {k: float(v) / max(n_train, 1) for k, v in ep_all.items()}
                )
                self.valid_loss.append(
                    float(ev_loss) / max(w_valid, 1)
                    if ev_loss is not None else 0.0
                )
                self.individual_valid_loss.append(
                    {k: float(v) / max(w_valid, 1) for k, v in ev_all.items()}
                )
            save_checkpoint(self.cfg.train_dir, epoch, params)
            save_opt_state(self.cfg.train_dir, epoch, opt_state)
            logger.info(
                "epoch %d train %.4f valid %.4f (%.2fs)",
                epoch, self.train_loss[-1], self.valid_loss[-1],
                time.time() - ep_start,
            )
            # guard on HISTORY length, not epoch number: a resumed run's
            # loop starts at epoch >= 1 with an empty history. An EMPTY
            # validation set pins valid_loss at the 0.0 placeholder, which
            # must not trip early stopping (it would always stop at epoch
            # `patience`)
            has_valid = valid_idx is not None and len(valid_idx) > 0
            if has_valid and len(self.valid_loss) >= 2:
                if abs(self.valid_loss[-2] - self.valid_loss[-1]) <= self.early_stop_tol:
                    self._early_stop += 1
                else:
                    self._early_stop = 0
            if self._early_stop == self.patience:
                logger.info("early stopping at epoch %d", epoch)
                break
        logger.info("training time: %.3fs", time.time() - start)
        return params

    def _normalize_params_from_data(self, params, data: Dict):
        key = "z_values__ri" if "z_values__ri" in data else "z_values"
        enc = {key: data[key]}
        return self._normalize_params(params, enc)

    # ---------------------------- normalization ------------------------------

    def _normalize_params(self, params, enc_batch):
        """Scale b, c so each sub-FDN has unit average energy.

        Divides the per-group slices of input/output gains by
        E[|H_sub_g|^2]^(1/4) (reference: trainer.py:317-332). No-op when io
        gains are fixed (colorless warm start).
        """
        p = params["params"]
        if "input_gains" not in p or "output_gains" not in p:
            return params
        z = decode_batch(enc_batch)["z_values"]
        h_sub, _ = self.model.apply(params, z, method=DiffGFDN.sub_fdn_output)
        energy = jnp.mean(jnp.abs(h_sub) ** 2, axis=0)  # (G,)
        scale = jnp.power(energy, 0.25)
        nper = self.model.num_delay_lines_per_group
        per_line = jnp.repeat(scale, nper)[:, None]  # (N, 1)
        new_p = dict(p)
        new_p["input_gains"] = p["input_gains"] / per_line
        new_p["output_gains"] = p["output_gains"] / per_line
        out = dict(params)
        out["params"] = new_p
        return out

    # ------------------------------- training --------------------------------

    def fit(
        self,
        params,
        train_batches: Callable[[int], Iterable[Dict]],
        valid_batches: Callable[[], Iterable[Dict]],
        seed: int = 0,
    ):
        """Run the epoch loop. ``train_batches(epoch)``/``valid_batches()``
        return fresh batch iterators. Returns the final params."""
        self.optimizer = make_optimizer(self.cfg, params, self.steps_per_epoch)
        opt_state = self.optimizer.init(params)
        key = jax.random.PRNGKey(seed)
        save_checkpoint(self.cfg.train_dir, -1, params)

        normalize_per_step = not getattr(self.model, "use_svf_in_output", False)
        start = time.time()
        for epoch in range(self.cfg.max_epochs):
            ep_start = time.time()
            # device-scalar accumulation (one host sync per epoch): a
            # float() per step costs a ~45 ms tunnel round trip and
            # serializes the otherwise-pipelined steps
            ep_loss, ep_all = None, {}
            n_train = 0
            if not normalize_per_step:
                first = next(iter(train_batches(epoch)), None)
                if first is not None:
                    params = self._normalize(params, encode_batch(first))
            for batch in train_batches(epoch):
                enc = encode_batch(batch)
                if normalize_per_step:
                    params = self._normalize(params, enc)
                key, sub = jax.random.split(key)
                params, opt_state, total, aux = self._train_step(
                    params, opt_state, enc, sub
                )
                ep_loss = total if ep_loss is None else ep_loss + total
                for k, v in aux.items():
                    ep_all[k] = v if k not in ep_all else ep_all[k] + v
                n_train += 1

            ev_loss, ev_all = None, {}
            n_valid = 0
            for batch in valid_batches():
                key, sub = jax.random.split(key)
                total, aux = self._valid_step(params, encode_batch(batch), sub)
                ev_loss = total if ev_loss is None else ev_loss + total
                for k, v in aux.items():
                    ev_all[k] = v if k not in ev_all else ev_all[k] + v
                n_valid += 1

            self.train_loss.append(
                float(ep_loss) / max(n_train, 1) if ep_loss is not None else 0.0
            )
            self.individual_train_loss.append(
                {k: float(v) / max(n_train, 1) for k, v in ep_all.items()}
            )
            self.valid_loss.append(
                float(ev_loss) / max(n_valid, 1) if ev_loss is not None else 0.0
            )
            self.individual_valid_loss.append(
                {k: float(v) / max(n_valid, 1) for k, v in ev_all.items()}
            )
            save_checkpoint(self.cfg.train_dir, epoch, params)
            logger.info(
                "epoch %d train %.4f valid %.4f (%.2fs)",
                epoch,
                self.train_loss[-1],
                self.valid_loss[-1],
                time.time() - ep_start,
            )

            # n_valid == 0 leaves valid_loss at the 0.0 placeholder, which
            # must not trip early stopping
            if n_valid > 0 and len(self.valid_loss) >= 2:
                if abs(self.valid_loss[-2] - self.valid_loss[-1]) <= self.early_stop_tol:
                    self._early_stop += 1
                else:
                    self._early_stop = 0
            if self._early_stop == self.patience:
                logger.info("early stopping at epoch %d", epoch)
                break
        logger.info("training time: %.3fs", time.time() - start)
        return params


    # ------------------------- target precomputation -------------------------

    def precompute_target_features(self, arrays, chunk: int = 32) -> None:
        """Precompute per-position target EDC/EDR features into ``arrays``.

        The target spectra are parameter-independent, so the EDC (dB) after
        truncation, the target EDR (dB), and its |.|-sum are computed ONCE
        per dataset here — halving the per-step FFT work versus the
        reference, which recomputes both sides every step.
        """
        if self.use_directional:
            return
        from ..ops.basic import db as db_fn
        from ..ops.basic import schroeder_backward_int
        from ..ops.stft import edr_from_stft, stft as stft_fn

        mix = self.mixing_time_samps

        @jax.jit
        def features(tgt_enc):
            tgt = (tgt_enc[..., 0] + 1j * tgt_enc[..., 1]).astype(jnp.complex64)
            n = 2 * (tgt.shape[-1] - 1)
            end = min(self.max_ir_len_samps, n)
            rir = jnp.fft.irfft(tgt, n, axis=-1)
            edc_db = db_fn(
                schroeder_backward_int(rir[..., mix:end]), is_squared=True
            )
            s = stft_fn(rir, self.edr_win, self.edr_hop)
            if self.erb_filters is not None:
                s = jnp.einsum("nk,...kt->...nt", self.erb_filters, jnp.abs(s))
            edr_db = edr_from_stft(s)
            abs_sum = jnp.sum(jnp.abs(edr_db), axis=(-2, -1))
            return edc_db, edr_db, abs_sum

        # ONE host->device transfer of the spectra (cached on the arrays
        # object — shared with any band-parallel trainer using the same
        # dataset); chunks are sliced and reduced ON DEVICE and the
        # features stay device-resident. The previous numpy round trip
        # cost ~570 MB device->host + the same back up at the
        # 838-receiver/131072-bin production scale — ~40% of the measured
        # end-to-end training wall-clock over the tunnel.
        from ..utils.cio import device_target_spectra_ri

        n_items = arrays.num_items
        enc_dev = device_target_spectra_ri(arrays)
        edcs, edrs, sums = [], [], []
        for k in range(0, n_items, chunk):
            e, r, s = features(enc_dev[k : k + chunk])
            edcs.append(e)
            edrs.append(r)
            sums.append(s)
        arrays.precomputed = {
            "target_edc_db": jnp.concatenate(edcs, axis=0),
            "target_edr_db": jnp.concatenate(edrs, axis=0),
            "target_edr_abs_sum": jnp.concatenate(sums, axis=0),
        }

    # ------------------------------ IR export --------------------------------

    def save_irs(
        self,
        params,
        batches: Iterable[Dict],
        directory,
        filename_prefix: str = "ir",
        norm: bool = True,
    ) -> None:
        """Export synthesized RIRs for the given batches as wav files.

        Filenames encode the receiver position, matching the reference's
        audio dumps (trainer.py:503-564).
        """
        import os

        from ..data.audio import write_wav
        from ..inference.gfdn_inference import make_rir_synthesis_fn

        synth = make_rir_synthesis_fn(self.model, self.cfg.reduced_pole_radius)
        os.makedirs(directory, exist_ok=True)
        for batch in batches:
            rirs = np.asarray(synth(params, encode_batch(batch)))
            if rirs.ndim == 1:
                rirs = rirs[None]
            if norm:
                rirs = rirs / (np.max(np.abs(rirs)) + 1e-12)
            pos = np.atleast_2d(batch["listener_position"])
            for i in range(rirs.shape[0]):
                name = (
                    f"{filename_prefix}_({pos[i, 0]:.2f}, {pos[i, 1]:.2f}, "
                    f"{pos[i, 2]:.2f}).wav"
                )
                write_wav(os.path.join(directory, name), rirs[i], self.sample_rate)


class SinglePosGFDNTrainer(GFDNTrainer):
    """Single-RIR fit: one full-spectrum batch, tighter early stopping.

    ``freq_mesh``: a device mesh to shard the rFFT bin axis over (the
    single-pos batch is the whole unit circle — the reference forces
    full-circle batches, solver.py:459-552 — so frequency is the only
    parallelizable axis). ``None`` trains unsharded on one device.
    """

    early_stop_tol = 1e-4

    def __init__(self, *args, freq_mesh=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.freq_mesh = freq_mesh
        self.used_freq_parallel = False

    def _make_fit_step(self):
        """The per-epoch optimizer step: frequency-sharded when a mesh with
        more than one device was supplied, the plain jitted step otherwise.
        Returns ``run(params, opt_state, raw_batch, key)``."""
        if (
            self.freq_mesh is not None
            and int(np.prod(self.freq_mesh.devices.shape)) > 1
        ):
            from ..parallel.freq_parallel import make_freq_sharded_step

            def loss_fn(params, batch, key):
                all_losses = self._losses(params, batch, key)
                return sum(all_losses.values()), all_losses

            self.used_freq_parallel = True
            logger.info(
                "single-pos fit: frequency axis sharded over %d devices",
                int(np.prod(self.freq_mesh.devices.shape)),
            )
            return make_freq_sharded_step(
                self.model, loss_fn, self.optimizer, self.freq_mesh
            )

        def run(params, opt_state, batch, key):
            return self._train_step(params, opt_state, encode_batch(batch), key)

        return run

    def _normalize_params(self, params, enc_batch):
        """Match the FDN's average energy to the target's.

        Scales the per-group io scalars by (E_H / E_target)^(-1/4)
        (reference: trainer.py:647-661) after the sub-FDN normalization.
        """
        params = super()._normalize_params(params, enc_batch)
        p = params["params"]
        if "input_scalars" not in p or "output_scalars" not in p:
            return params
        batch = decode_batch(enc_batch)
        h, _ = self._model_outputs(params, batch)
        energy_h = jnp.mean(jnp.abs(h) ** 2)
        energy_t = jnp.mean(jnp.abs(batch["target_rir_response"]) ** 2)
        ratio = jnp.power(energy_h / (energy_t + 1e-12), 0.25)
        new_p = dict(p)
        new_p["input_scalars"] = p["input_scalars"] / ratio
        new_p["output_scalars"] = p["output_scalars"] / ratio
        out = dict(params)
        out["params"] = new_p
        return out

    def fit(self, params, train_batches, valid_batches=None, seed: int = 0):
        """Single-batch epochs: loss monitored on the train loss itself."""
        self.optimizer = make_optimizer(self.cfg, params, 1)
        opt_state = self.optimizer.init(params)
        key = jax.random.PRNGKey(seed)
        step = self._make_fit_step()

        first = next(iter(train_batches(0)))
        params = self._normalize(params, encode_batch(first))
        save_checkpoint(self.cfg.train_dir, -1, params)

        for epoch in range(self.cfg.max_epochs):
            for batch in train_batches(epoch):
                key, sub = jax.random.split(key)
                params, opt_state, total, aux = step(
                    params, opt_state, batch, sub
                )
            self.train_loss.append(float(total))
            self.individual_train_loss.append(
                {k: float(v) for k, v in aux.items()}
            )
            save_checkpoint(self.cfg.train_dir, epoch, params)
            if len(self.train_loss) >= 2:
                if abs(self.train_loss[-2] - self.train_loss[-1]) <= self.early_stop_tol:
                    self._early_stop += 1
                else:
                    self._early_stop = 0
            if self._early_stop == self.patience:
                break
        return params


class DirectionalGFDNTrainer(GFDNTrainer):
    """Directional FDN trainer: SH response -> directional EDC loss.

    Construct with ``directional_envelopes`` (num_slopes, T) from
    :func:`diffgfdn_tpu.losses.make_decay_envelopes`.
    """
