"""Band-parallel ("expert"-parallel) GFDN training.

The reference trains the 8 octave-band GFDNs as independent python jobs
(run_subband_training_treble.py:175-204). Here bands train in ONE XLA
program: parameters carry a leading band axis sharded over the mesh's
``band`` axis, receiver batches shard over ``batch``, and the per-band
subband filter response rides along as a banded constant. Gradients never
cross bands; the only collectives are GSPMD's data-parallel reductions.

Semantic parity with the reference's per-band jobs:
* per-band seeds (each band's PRNG stream matches its solo run's init);
* the FULL loss stack — EDC + EDR (with optional ERB grouping and
  frequency weighting) + the time-aliasing reg loss + the colorless
  spectral/sparsity terms — matching GFDNTrainer._losses term for term
  (reference trainer.py:56-110);
* a per-band validation loop and PER-BAND early stopping — a stopped band
  has its parameter updates masked to zero while the remaining bands keep
  training (one program, no recompilation), mirroring trainer.py:417-424.

Heterogeneous per-band MLP architectures are handled one level up (the
subband CLI groups bands by architecture and runs one band-parallel
program per group) since a vmapped band axis needs one parameter shape.
"""

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import TrainerConfig
from ..losses import (
    amse_loss,
    edc_loss,
    edr_loss,
    frequency_weighting,
    mse_loss,
    reg_loss,
    sparsity_loss,
)
from ..ops.basic import ms_to_samps
from ..ops.stft import erb_filterbank
from ..ops.unitary import orthogonal_from_skew
from ..training.scan import scan_epoch
from ..utils.cio import decode_batch, encode_batch, shrink_init_batch
from .mesh import band_sharding, batch_sharding, make_mesh, replicated


def _mesh_needs_cpu_fft_workaround(mesh) -> bool:
    """True iff the mesh hits XLA:CPU's fft-thunk layout RET_CHECK.

    The failing condition (reproduced + dissected via --xla_dump_to): on a
    multi-device CPU mesh, GSPMD computes ffts fully replicated and layout
    assignment lets consumer preferences assign the fft node a batch-major
    operand layout, which the CPU fft thunk rejects
    (LayoutUtil::IsMonotonicWithDim0Major). TPU meshes have no such thunk
    check and keep the bandwidth-optimal shardings.
    """
    return (
        mesh is not None
        and int(np.prod(mesh.devices.shape)) > 1
        and any(d.platform == "cpu" for d in mesh.devices.flat)
    )


def make_band_loss_fn(
    model,
    cfg: TrainerConfig,
    sample_rate: float,
    max_ir_len_ms: float,
    edr_win: int,
    edr_hop: int,
    mesh=None,
    erb_filters=None,
    freq_weights=None,
) -> Callable:
    """Single-band loss: EDC + EDR on the band-filtered response (with
    optional ERB grouping / frequency weighting of the EDR term), the
    time-aliasing reg loss on SVF output heads, plus the colorless
    spectral/sparsity pair when the model trains with it
    (parity with GFDNTrainer._losses / reference trainer.py:56-110).

    ``mesh``: the (band, batch) mesh the vmapped loss will run on — used to
    pin the achieved response batch-sharded around the loss irfft (see
    below); ``None`` or a single-device mesh adds no constraints.
    """
    mixing = ms_to_samps(20.0, sample_rate)
    max_len = ms_to_samps(max_ir_len_ms, sample_rate)
    use_reg = cfg.use_reg_loss and getattr(model, "use_svf_in_output", False)
    reg_ir_len = ms_to_samps(cfg.output_filt_ir_len_ms, sample_rate)
    repl_spec = None
    if _mesh_needs_cpu_fft_workaround(mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl_spec = NamedSharding(mesh, P())

    def loss_fn(params, batch, band_resp, key):
        # band_resp arrives re/im stacked (F, 2): complex buffers can't
        # cross the jit boundary on this TPU backend
        out = model.apply(params, batch)
        if model.use_colorless_loss:
            h, h_sub = out
        else:
            h, h_sub = out, None
        resp = (band_resp[..., 0] + 1j * band_resp[..., 1]).astype(jnp.complex64)
        h = h * resp
        mask_key = key if cfg.use_edc_mask else None
        if "target_edc_db" in batch:
            # fast path: per-band target features precomputed once per
            # dataset (precompute_band_target_features) + ONE shared irfft
            # of the achieved band response feeding both losses
            from ..losses.gfdn import edc_loss_from_rir, edr_loss_from_rir

            n = 2 * (h.shape[-1] - 1)
            # GSPMD computes every fft fully replicated (this partitioner
            # has no sharded-fft rule), and the COMPLEX all-gather it
            # inserts before the fft carries a batch-major output layout
            # that XLA:CPU's fft thunk rejects (dim0-major RET_CHECK).
            # Real all-gathers get default layouts — so replicate the re/im
            # planes explicitly and complexify AFTER the gather: the fft
            # then reads an elementwise result with a default layout.
            if repl_spec is not None:
                hr = jax.lax.with_sharding_constraint(jnp.real(h), repl_spec)
                hi = jax.lax.with_sharding_constraint(jnp.imag(h), repl_spec)
                h = (hr + 1j * hi).astype(jnp.complex64)
            rir = jnp.fft.irfft(h, n, axis=-1)
            # barrier: keep the feature comparisons from pushing a
            # transposed layout back into the fft result
            rir = jax.lax.optimization_barrier(rir)
            end = min(max_len, n)  # clamp at the TIME length, not bin count
            l_edc = cfg.edc_loss_weight * edc_loss_from_rir(
                batch["target_edc_db"], rir[..., mixing:end], mask_key=mask_key
            )
            rir_env = rir
            if cfg.reduced_pole_radius != 1.0:
                rir_env = rir * jnp.power(
                    1.0 / cfg.reduced_pole_radius, jnp.arange(n)
                )
            l_edr = cfg.edr_loss_weight * edr_loss_from_rir(
                batch["target_edr_db"],
                batch["target_edr_abs_sum"],
                rir_env,
                win_size=edr_win,
                hop_size=edr_hop,
                erb_filters=erb_filters,
                frequency_weights=freq_weights,
                layout_barrier=repl_spec is not None,
            )
        else:
            target = batch["target_rir_response"] * resp
            if repl_spec is not None:
                # same XLA:CPU fft-layout sidestep as the fast path: make
                # the ffts inside the losses read replicated elementwise
                # results (real all-gathers keep default layouts)
                hr = jax.lax.with_sharding_constraint(jnp.real(h), repl_spec)
                hi = jax.lax.with_sharding_constraint(jnp.imag(h), repl_spec)
                h = (hr + 1j * hi).astype(jnp.complex64)
                tr = jax.lax.with_sharding_constraint(
                    jnp.real(target), repl_spec
                )
                ti = jax.lax.with_sharding_constraint(
                    jnp.imag(target), repl_spec
                )
                target = (tr + 1j * ti).astype(jnp.complex64)
            l_edr = cfg.edr_loss_weight * edr_loss(
                target,
                h,
                win_size=edr_win,
                hop_size=edr_hop,
                reduced_pole_radius=cfg.reduced_pole_radius,
                erb_filters=erb_filters,
                frequency_weights=freq_weights,
                layout_barrier=repl_spec is not None,
            )
            l_edc = cfg.edc_loss_weight * edc_loss(
                target,
                h,
                mixing,
                max_len,
                mask_key=mask_key,
            )
        total = l_edr + l_edc
        aux = {"edr_loss": l_edr, "edc_loss": l_edc}
        if use_reg:
            head = model.apply(
                params, batch, method=type(model).output_filter_params
            )
            if repl_spec is not None:
                # replicate the REAL biquad coefficients so the filter
                # response feeding reg_loss's irfft is computed replicated
                # (no complex all-gather with a batch-major layout lands on
                # the CPU fft thunk's input)
                head = {
                    k: jax.lax.with_sharding_constraint(v, repl_spec)
                    for k, v in head.items()
                }
            l_reg = reg_loss(
                head["biquad_num"], head["biquad_den"], reg_ir_len,
                layout_barrier=repl_spec is not None,
            )
            aux["reg_loss"] = l_reg
            total = total + l_reg
        if h_sub is not None:
            h_out = h_sub[0]  # (F, G)
            spectral_fn = amse_loss if cfg.use_asym_spectral_loss else mse_loss
            spectral = 0.0
            for k in range(model.num_groups):
                spectral += cfg.spectral_loss_weight * spectral_fn(
                    h_out[..., k], jnp.ones_like(jnp.abs(h_out[..., k]))
                )
            m = params["params"]["feedback_loop"]["M"]
            sparsity = cfg.sparsity_loss_weight * sparsity_loss(
                orthogonal_from_skew(m)[-1]
            )
            aux["spectral_loss"] = spectral
            aux["sparsity_loss"] = sparsity
            total = total + spectral + sparsity
        return total, aux

    return loss_fn


class BandParallelTrainer:
    """Trains ``num_bands`` identical-architecture GFDNs in one program.

    The per-band models share one architecture (static config) but have
    independent parameters, seeds, and subband filters. Each optimizer
    step is a single jitted computation over the (band, batch) mesh.
    """

    patience: int = 5
    early_stop_tol: float = 1e-3

    def __init__(
        self,
        model,
        cfg: TrainerConfig,
        band_responses: np.ndarray,  # (num_bands, F) complex
        steps_per_epoch: int,
        max_ir_len_ms: float = 2000.0,
        mesh=None,
    ):
        from ..training.optim import make_optimizer

        self.model = model
        self.cfg = cfg
        self.num_bands = band_responses.shape[0]
        self.band_responses = np.stack(
            [np.real(band_responses), np.imag(band_responses)], axis=-1
        ).astype(np.float32)
        self.mesh = mesh if mesh is not None else make_mesh(self.num_bands)

        time_len = cfg.num_freq_bins if cfg.num_freq_bins else 2 ** 17
        edr_win = min(2 ** 12, 2 ** int(np.log2(max(time_len // 4, 8))))
        self._edr_win, self._edr_hop = edr_win, edr_win // 2
        self._mixing = ms_to_samps(20.0, model.sample_rate)
        self._max_len = ms_to_samps(max_ir_len_ms, model.sample_rate)
        # ERB grouping / frequency weighting of the EDR term: identical
        # construction to GFDNTrainer (the filters depend only on sample
        # rate and window, so all bands share one filterbank)
        self.erb_filters = None
        erb_centres = None
        if cfg.use_erb_edr_loss:
            fb, erb_centres = erb_filterbank(model.sample_rate, edr_win, 2 ** 6)
            self.erb_filters = jnp.asarray(fb, jnp.float32)
        self.freq_weights = None
        if cfg.use_frequency_weighting:
            freqs = (
                erb_centres
                if erb_centres is not None
                else np.fft.rfftfreq(edr_win, d=1.0 / model.sample_rate)
            )
            self.freq_weights = frequency_weighting(np.asarray(freqs))
        loss_fn = make_band_loss_fn(
            model, cfg, model.sample_rate, max_ir_len_ms, edr_win,
            edr_win // 2, mesh=self.mesh,
            erb_filters=self.erb_filters, freq_weights=self.freq_weights,
        )
        self._make_optimizer = lambda params: make_optimizer(
            cfg, params, steps_per_epoch
        )
        self.optimizer: Optional[optax.GradientTransformation] = None
        self._loss_fn = loss_fn
        self._band_feats: Optional[Dict] = None
        # fit_indexed runs each epoch as ONE jitted lax.scan over its steps
        # (single dispatch per epoch); False restores per-step dispatch
        self.scan_epochs = True
        # per-band loss histories (filled by fit_indexed)
        self.train_loss: List[np.ndarray] = []
        self.valid_loss: List[np.ndarray] = []

    def init(
        self,
        example_batch: Dict,
        seed: int = 0,
        seeds: Optional[Sequence[int]] = None,
    ):
        """Per-band params (leading band axis) + opt state, band-sharded.

        ``seeds``: one PRNG seed per band (parity with the reference's
        per-band jobs, each seeded from its own config). Falls back to
        splitting ``seed``.
        """
        if seeds is not None:
            assert len(seeds) == self.num_bands
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        else:
            keys = jax.random.split(jax.random.PRNGKey(seed), self.num_bands)
        # init traces on a frequency-truncated batch: parameters are
        # F-free (identical draws), the one-shot compile is ~20x cheaper
        enc = encode_batch(shrink_init_batch(example_batch))

        @jax.jit
        def init_all(ks, b):
            return jax.vmap(lambda k: self.model.init(k, decode_batch(b)))(ks)

        params = init_all(keys, enc)
        single = jax.tree_util.tree_map(lambda x: x[0], params)
        self.optimizer = self._make_optimizer(single)
        opt_state = jax.vmap(self.optimizer.init)(params)

        bsh = band_sharding(self.mesh)
        params = jax.device_put(
            params, jax.tree_util.tree_map(lambda _: bsh, params)
        )
        opt_state = jax.device_put(
            opt_state, jax.tree_util.tree_map(lambda _: bsh, opt_state)
        )
        self._build_step()
        return params, opt_state

    def _build_step(self):
        loss_fn = self._loss_fn
        optimizer = self.optimizer

        def band_step(params, opt_state, enc_batch, feats, band_resp, key, active):
            batch = {**decode_batch(enc_batch), **feats}
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, band_resp, key
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            # per-band early stopping: a stopped band's updates are masked
            # to zero, freezing its parameters exactly while the program
            # keeps one compiled shape
            updates = jax.tree_util.tree_map(lambda u: u * active, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, aux

        def band_valid(params, enc_batch, feats, band_resp, key):
            batch = {**decode_batch(enc_batch), **feats}
            return loss_fn(params, batch, band_resp, key)

        # feats (per-band precomputed target features) carry a leading band
        # axis; an empty dict has no leaves, so the slow path vmaps cleanly
        stepped = jax.vmap(
            band_step,
            in_axes=(0, 0, None, 0, 0, None, 0),
            out_axes=(0, 0, 0, 0),
        )
        vstepped = jax.vmap(band_valid, in_axes=(0, None, 0, 0, None))

        self._stepped = stepped
        self._vstepped = vstepped
        self._jitted = {}
        # band responses ride along every step: upload ONCE (band-sharded)
        # instead of re-transferring the numpy constant per call
        self._band_resps_dev = jax.device_put(
            self.band_responses, band_sharding(self.mesh)
        )

    def step(self, params, opt_state, batch: Dict, key, active=None):
        """One band-parallel optimizer step (compiles once per batch shape)."""
        enc = encode_batch(batch)
        if active is None:
            active = jnp.ones(self.num_bands, jnp.float32)
        shapes = tuple(sorted((k, v.shape) for k, v in enc.items()))
        if shapes not in self._jitted:
            mesh = self.mesh
            bsh = band_sharding(mesh)
            repl = replicated(mesh)
            dsh = batch_sharding(mesh)
            in_shardings = (
                jax.tree_util.tree_map(lambda _: bsh, params),
                jax.tree_util.tree_map(lambda _: bsh, opt_state),
                {
                    k: (
                        repl
                        if k.startswith(self._SHARED_KEYS)
                        else dsh
                    )
                    for k in enc
                },
                {},  # feats: empty on the host-batch path
                bsh,
                repl,
                bsh,
            )
            self._jitted[shapes] = jax.jit(
                self._stepped, in_shardings=in_shardings
            )
        return self._jitted[shapes](
            params, opt_state, enc, {}, self._band_resps_dev, key, active
        )

    # ----------------------- device-resident data path -----------------------
    # Same discipline as GFDNTrainer.fit_indexed: the whole encoded dataset
    # is device_put ONCE (replicated, so per-band gathers stay local) and
    # batches are gathered ON DEVICE from an int32 index vector; per-band
    # losses accumulate on device and the host syncs once per epoch.

    _SHARED_KEYS = ("z_values", "mesh_2d", "sph_directions")

    def upload_arrays(self, arrays) -> Dict:
        """Encode a BatchArrays to device-resident arrays (one transfer).

        When per-band target features are precomputed, the raw target
        spectra are never read by the (fast-path) loss — skip uploading
        them (~0.9 GB of HBM + transfer at flagship scale).
        """
        from ..utils.cio import device_early_response_ri

        # whole planes, no gather_batch fancy-index copies (see
        # GFDNTrainer.upload_arrays)
        full = {
            "z_values": arrays.z_values,
            "source_position": arrays.source_position,
            "listener_position": arrays.listener_position,
            "norm_listener_position": arrays.norm_listener_position,
        }
        if self._band_feats is None:
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
        repl = replicated(self.mesh)
        # large float32 planes ride the int32 bitcast transport (~12x
        # faster on this tunnel — utils.cio.fast_device_put)
        from ..utils.cio import fast_device_put

        out = {k: fast_device_put(np.asarray(v), repl) for k, v in enc.items()}
        if early_t is not None:
            # device-side rfft of the tiny early time segment replaces the
            # full (R, F) early-spectrum upload (see GFDNTrainer)
            nfft = 2 * (arrays.z_values.shape[0] - 1)
            out["target_early_response__ri"] = device_early_response_ri(
                early_t, nfft, sharding=repl
            )
        return out

    def _gather(self, data: Dict, idx) -> Dict:
        dsh = batch_sharding(self.mesh)
        enc = {}
        for k, v in data.items():
            base = k[: -len("__ri")] if k.endswith("__ri") else k
            if base in self._SHARED_KEYS:
                enc[k] = v
            else:
                enc[k] = jax.lax.with_sharding_constraint(v[idx], dsh)
        return enc

    def precompute_band_target_features(
        self, arrays, chunk: int = 16, force: bool = False
    ) -> None:
        """Per-band target EDC/EDR features, computed ONCE per dataset.

        The band-filtered target spectra are parameter-independent; the
        slow path recomputed their irfft + Schroeder + STFT every step.
        Features are stored device-resident with a leading band axis and
        gathered per batch inside the jitted step. Mirrors
        GFDNTrainer.precompute_target_features.

        Runs on every mesh, including multi-device CPU (``force`` is kept
        for API compatibility, now a no-op): the XLA:CPU fft-layout
        RET_CHECK this path used to trip is sidestepped in the loss — the
        response replicates via REAL re/im all-gathers before the fft and
        the gathered features arrive replicated, so no consumer pushes a
        batch-major layout into the fft node (see make_band_loss_fn /
        _gather_feats).
        """
        del force  # previously gated multi-device CPU meshes; fixed
        from ..ops.basic import db as db_fn
        from ..ops.basic import schroeder_backward_int
        from ..ops.stft import edr_from_stft, stft as stft_fn

        mix = self._mixing

        @jax.jit
        def features(tgt_enc, band_resp):
            tgt = (tgt_enc[..., 0] + 1j * tgt_enc[..., 1]).astype(jnp.complex64)
            resp = (band_resp[..., 0] + 1j * band_resp[..., 1]).astype(
                jnp.complex64
            )
            tgt = tgt * resp
            n = 2 * (tgt.shape[-1] - 1)
            end = min(self._max_len, n)
            rir = jnp.fft.irfft(tgt, n, axis=-1)
            edc_db = db_fn(
                schroeder_backward_int(rir[..., mix:end]), is_squared=True
            )
            s = stft_fn(rir, self._edr_win, self._edr_hop)
            if self.erb_filters is not None:
                s = jnp.einsum("nk,...kt->...nt", self.erb_filters, jnp.abs(s))
            edr_db = edr_from_stft(s)
            abs_sum = jnp.sum(jnp.abs(edr_db), axis=(-2, -1))
            return edc_db, edr_db, abs_sum

        # ONE host->device transfer of the target spectra, shared by ALL
        # bands AND all architecture groups (uploading per-band chunks
        # re-shipped the full ~440 MB spectra once per band at production
        # scale — 8x the necessary tunnel traffic; the cross-group cache
        # saves another 2x); per-band chunks are sliced on device
        from ..utils.cio import device_target_spectra_ri

        n_items = arrays.num_items
        enc_dev = device_target_spectra_ri(arrays)
        bands = []
        for b in range(self.num_bands):
            edcs, edrs, sums = [], [], []
            for k in range(0, n_items, chunk):
                e, r, su = features(
                    enc_dev[k : k + chunk], self.band_responses[b]
                )
                edcs.append(e)
                edrs.append(r)
                sums.append(su)
            bands.append(
                (
                    jnp.concatenate(edcs, axis=0),
                    jnp.concatenate(edrs, axis=0),
                    jnp.concatenate(sums, axis=0),
                )
            )
        # band-sharded storage: each device of a multi-chip band mesh only
        # reads its own band's slice (replicating the EDR features would
        # cost ~4 GB of HBM per chip at flagship scale)
        bsh = band_sharding(self.mesh)
        self._band_feats = {
            key: jax.device_put(jnp.stack([bb[i] for bb in bands]), bsh)
            for i, key in enumerate(
                ("target_edc_db", "target_edr_db", "target_edr_abs_sum")
            )
        }

    def _gather_feats(self, band_feats: Dict, idx) -> Dict:
        # CPU meshes: gathered features arrive REPLICATED — XLA:CPU's
        # partitioner computes every fft fully replicated, so batch-sharded
        # features would make the comparisons reshard the replicated irfft
        # output with dynamic-slices whose layout preference propagates
        # INTO the fft node, and the CPU fft thunk RET_CHECKs the
        # batch-major operand. Replicated features keep every consumer of
        # the fft result elementwise and default-layout (the per-batch
        # gather is small; the band-sharded STORAGE is untouched).
        # TPU meshes keep the (band, batch) sharding.
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = (
            P()
            if _mesh_needs_cpu_fft_workaround(self.mesh)
            else P("band", "batch")
        )
        fsh = NamedSharding(self.mesh, spec)
        return {
            k: jax.lax.with_sharding_constraint(v[:, idx], fsh)
            for k, v in band_feats.items()
        }

    def _make_indexed_step(self) -> Callable:
        stepped = self._stepped
        gather = self._gather
        gather_feats = self._gather_feats

        def indexed_step(params, opt_state, data, band_feats, band_resps,
                         idx, key, active):
            enc = gather(data, idx)
            feats = gather_feats(band_feats, idx)
            return stepped(
                params, opt_state, enc, feats, band_resps, key, active
            )

        return indexed_step

    def _make_indexed_valid(self) -> Callable:
        vstepped = self._vstepped
        gather = self._gather
        gather_feats = self._gather_feats

        def indexed_valid(params, data, band_feats, band_resps, idx, key):
            feats = gather_feats(band_feats, idx)
            return vstepped(params, gather(data, idx), feats, band_resps, key)

        return indexed_valid

    def _make_indexed_epoch(self) -> Callable:
        """One lax.scan over ALL steps of an epoch (training/scan.py owns
        the skeleton — single dispatch per epoch). The active-band mask is
        constant within an epoch and rides in as an argument."""
        step = self._make_indexed_step()

        def epoch_fn(params, opt_state, data, band_feats, band_resps,
                     idx_mat, epoch_key, active):
            def body(carry, idx, key):
                p, o = carry
                p, o, total, _ = step(
                    p, o, data, band_feats, band_resps, idx, key, active
                )
                return (p, o), total

            (params, opt_state), totals = scan_epoch(
                body, (params, opt_state), idx_mat, epoch_key
            )
            return params, opt_state, totals

        return epoch_fn

    def _make_indexed_valid_epoch(self) -> Callable:
        vstep = self._make_indexed_valid()

        def epoch_fn(params, data, band_feats, band_resps, idx_mat,
                     epoch_key):
            def body(carry, idx, key):
                vt, _ = vstep(params, data, band_feats, band_resps, idx, key)
                return carry, vt

            _, totals = scan_epoch(body, 0, idx_mat, epoch_key)
            return totals

        return epoch_fn

    def fit_indexed(
        self,
        params,
        opt_state,
        arrays,
        train_idx: Optional[np.ndarray] = None,
        valid_idx: Optional[np.ndarray] = None,
        max_epochs: Optional[int] = None,
        seed: int = 0,
        on_epoch: Optional[Callable] = None,
    ):
        """Epoch loop over device-resident data (on-device batch gathers).

        With ``valid_idx``, runs a per-band validation pass per epoch and
        early-stops each band independently (|delta valid| <= tol for
        ``patience`` epochs, reference trainer.py:417-424); stopped bands
        freeze while the rest continue. ``on_epoch(epoch, params,
        train_losses, valid_losses, trained_mask)`` runs after every epoch
        (e.g. to checkpoint per band); ``trained_mask[b] == 1`` means band
        b trained THIS epoch (frozen bands show 0 and need no checkpoint).
        """
        from ..training.trainer import padded_batches

        data = self.upload_arrays(arrays)
        band_feats = self._band_feats if self._band_feats is not None else {}
        if train_idx is None:
            train_idx = np.arange(arrays.num_items)
        bs = min(self.cfg.batch_size, max(1, len(train_idx)))
        vbs = (
            min(self.cfg.batch_size, max(1, len(valid_idx)))
            if valid_idx is not None and len(valid_idx)
            else None
        )
        if self.scan_epochs:
            epoch_fn = jax.jit(
                self._make_indexed_epoch(), donate_argnums=(0, 1)
            )
            vepoch_fn = jax.jit(self._make_indexed_valid_epoch())
        else:
            step = jax.jit(self._make_indexed_step(), donate_argnums=(0, 1))
            vstep = jax.jit(self._make_indexed_valid())
        key = jax.random.PRNGKey(seed)
        rng = np.random.RandomState(seed)
        max_epochs = max_epochs or self.cfg.max_epochs
        vidx_mat = None
        if vbs is not None and self.scan_epochs:
            # validation indices are never shuffled: build once
            vidx_mat = jnp.asarray(
                np.stack(list(padded_batches(np.asarray(valid_idx), vbs))),
                jnp.int32,
            )

        nb_bands = self.num_bands
        active = np.ones(nb_bands, np.float32)
        streak = np.zeros(nb_bands, np.int64)
        self.train_loss, self.valid_loss = [], []
        for epoch in range(max_epochs):
            # bands active at the START of the epoch: these trained this
            # epoch, so on_epoch must still checkpoint them even if the
            # post-epoch validation freezes them (their last update lands
            # in this epoch's state)
            trained_this_epoch = active.copy()
            active_dev = jnp.asarray(active)
            perm = train_idx[rng.permutation(len(train_idx))]
            if self.scan_epochs:
                idx_mat = jnp.asarray(
                    np.stack(list(padded_batches(perm, bs))), jnp.int32
                )
                key, ek = jax.random.split(key)
                params, opt_state, totals = epoch_fn(
                    params, opt_state, data, band_feats,
                    self._band_resps_dev, idx_mat, ek, active_dev,
                )
                self.train_loss.append(np.asarray(jnp.mean(totals, axis=0)))
            else:
                totals, nb = None, 0
                for bidx in padded_batches(perm, bs):
                    key, sub = jax.random.split(key)
                    params, opt_state, total, _ = step(
                        params, opt_state, data, band_feats,
                        self._band_resps_dev,
                        jnp.asarray(bidx, jnp.int32), sub, active_dev,
                    )
                    totals = total if totals is None else totals + total
                    nb += 1
                self.train_loss.append(np.asarray(totals) / max(nb, 1))

            v_epoch = None
            if vbs is not None and self.scan_epochs:
                key, vk = jax.random.split(key)
                vtotals = vepoch_fn(
                    params, data, band_feats, self._band_resps_dev,
                    vidx_mat, vk,
                )
                v_epoch = np.asarray(jnp.mean(vtotals, axis=0))
            elif vbs is not None:
                ev, nv = None, 0
                for vidx in padded_batches(np.asarray(valid_idx), vbs):
                    key, sub = jax.random.split(key)
                    vt, _ = vstep(
                        params, data, band_feats, self._band_resps_dev,
                        jnp.asarray(vidx, jnp.int32), sub,
                    )
                    ev = vt if ev is None else ev + vt
                    nv += 1
                v_epoch = np.asarray(ev) / max(nv, 1)

            if v_epoch is not None:
                self.valid_loss.append(v_epoch)
                if len(self.valid_loss) >= 2:
                    delta = np.abs(self.valid_loss[-2] - self.valid_loss[-1])
                    streak = np.where(delta <= self.early_stop_tol, streak + 1, 0)
                    active = np.where(
                        streak >= self.patience, 0.0, active
                    ).astype(np.float32)

            if on_epoch is not None:
                on_epoch(
                    epoch, params, self.train_loss[-1], v_epoch,
                    trained_this_epoch,
                )
            if vbs is not None and not active.any():
                break
        return params, opt_state, np.stack(self.train_loss)

    def fit(
        self,
        params,
        opt_state,
        train_batches: Callable,
        max_epochs: Optional[int] = None,
        seed: int = 0,
    ):
        """Epoch loop over band-parallel steps; returns per-band losses."""
        key = jax.random.PRNGKey(seed)
        max_epochs = max_epochs or self.cfg.max_epochs
        history = []
        for epoch in range(max_epochs):
            totals = None
            nb = 0
            for batch in train_batches(epoch):
                key, sub = jax.random.split(key)
                params, opt_state, total, _ = self.step(
                    params, opt_state, batch, sub
                )
                totals = total if totals is None else totals + total
                nb += 1
            history.append(np.asarray(totals) / max(nb, 1))
        return params, opt_state, np.stack(history)
