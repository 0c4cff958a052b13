"""Band-parallel ("expert"-parallel) GFDN training.

The reference trains the 8 octave-band GFDNs as independent python jobs
(run_subband_training_treble.py:175-204). Here all bands train in ONE XLA
program: parameters carry a leading band axis sharded over the mesh's
``band`` axis, receiver batches shard over ``batch``, and the per-band
subband filter response rides along as a banded constant. Gradients never
cross bands; the only collectives are GSPMD's data-parallel reductions.
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..config.schema import TrainerConfig
from ..losses import edc_loss, edr_loss
from ..ops.basic import ms_to_samps
from ..utils.cio import decode_batch, encode_batch
from .mesh import band_sharding, batch_sharding, make_mesh, replicated


def make_band_loss_fn(
    model,
    cfg: TrainerConfig,
    sample_rate: float,
    max_ir_len_ms: float,
    edr_win: int,
    edr_hop: int,
) -> Callable:
    """Single-band loss: EDC + EDR on the band-filtered response."""
    mixing = ms_to_samps(20.0, sample_rate)
    max_len = ms_to_samps(max_ir_len_ms, sample_rate)

    def loss_fn(params, batch, band_resp, key):
        # band_resp arrives re/im stacked (F, 2): complex buffers can't
        # cross the jit boundary on this TPU backend
        h = model.apply(params, batch)
        if model.use_colorless_loss:
            h = h[0]
        resp = (band_resp[..., 0] + 1j * band_resp[..., 1]).astype(jnp.complex64)
        h = h * resp
        target = batch["target_rir_response"] * resp
        l_edr = cfg.edr_loss_weight * edr_loss(
            target,
            h,
            win_size=edr_win,
            hop_size=edr_hop,
            reduced_pole_radius=cfg.reduced_pole_radius,
        )
        l_edc = cfg.edc_loss_weight * edc_loss(
            target,
            h,
            mixing,
            max_len,
            mask_key=key if cfg.use_edc_mask else None,
        )
        return l_edr + l_edc, {"edr_loss": l_edr, "edc_loss": l_edc}

    return loss_fn


class BandParallelTrainer:
    """Trains ``num_bands`` identical-architecture GFDNs in one program.

    The per-band models share one architecture (static config) but have
    independent parameters and subband filters. Each optimizer step is a
    single jitted computation over the (band, batch) mesh.
    """

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
        loss_fn = make_band_loss_fn(
            model, cfg, model.sample_rate, max_ir_len_ms, edr_win, edr_win // 2
        )
        self._make_optimizer = lambda params: make_optimizer(
            cfg, params, steps_per_epoch
        )
        self.optimizer: Optional[optax.GradientTransformation] = None
        self._loss_fn = loss_fn

    def init(self, example_batch: Dict, seed: int = 0):
        """Per-band params (leading band axis) + opt state, band-sharded."""
        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_bands)
        enc = encode_batch(example_batch)

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

        def band_step(params, opt_state, enc_batch, band_resp, key):
            batch = decode_batch(enc_batch)
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, band_resp, key
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, aux

        stepped = jax.vmap(
            band_step, in_axes=(0, 0, None, 0, None), out_axes=(0, 0, 0, 0)
        )

        mesh = self.mesh
        bsh = band_sharding(mesh)
        repl = replicated(mesh)
        dsh = batch_sharding(mesh)

        def batch_shardings(batch):
            out = {}
            for k in batch:
                out[k] = repl if k in ("z_values", "mesh_2d") else dsh
            return out

        self._stepped = stepped
        self._jitted = {}
        # band responses ride along every step: upload ONCE (band-sharded)
        # instead of re-transferring the numpy constant per call
        self._band_resps_dev = jax.device_put(self.band_responses, bsh)

    def step(self, params, opt_state, batch: Dict, key):
        """One band-parallel optimizer step (compiles once per batch shape)."""
        enc = encode_batch(batch)
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
                        if k.startswith(("z_values", "mesh_2d"))
                        else dsh
                    )
                    for k in enc
                },
                bsh,
                repl,
            )
            self._jitted[shapes] = jax.jit(
                self._stepped, in_shardings=in_shardings
            )
        return self._jitted[shapes](
            params, opt_state, enc, self._band_resps_dev, key
        )

    # ----------------------- device-resident data path -----------------------
    # Same discipline as GFDNTrainer.fit_indexed: the whole encoded dataset
    # is device_put ONCE (replicated, so per-band gathers stay local) and
    # batches are gathered ON DEVICE from an int32 index vector; per-band
    # losses accumulate on device and the host syncs once per epoch.

    _SHARED_KEYS = ("z_values", "mesh_2d", "sph_directions")

    def upload_arrays(self, arrays) -> Dict:
        """Encode a BatchArrays to device-resident arrays (one transfer)."""
        from ..data.batching import gather_batch

        full = gather_batch(arrays, np.arange(arrays.num_items))
        enc = encode_batch(full)
        repl = replicated(self.mesh)
        return {k: jax.device_put(np.asarray(v), repl) for k, v in enc.items()}

    def _make_indexed_step(self) -> Callable:
        stepped = self._stepped
        dsh = batch_sharding(self.mesh)
        shared = self._SHARED_KEYS

        def indexed_step(params, opt_state, data, band_resps, idx, key):
            enc = {}
            for k, v in data.items():
                base = k[: -len("__ri")] if k.endswith("__ri") else k
                if base in shared:
                    enc[k] = v
                else:
                    enc[k] = jax.lax.with_sharding_constraint(v[idx], dsh)
            return stepped(params, opt_state, enc, band_resps, key)

        return indexed_step

    def fit_indexed(
        self,
        params,
        opt_state,
        arrays,
        train_idx: Optional[np.ndarray] = None,
        max_epochs: Optional[int] = None,
        seed: int = 0,
    ):
        """Epoch loop over device-resident data (on-device batch gathers)."""
        data = self.upload_arrays(arrays)
        if train_idx is None:
            train_idx = np.arange(arrays.num_items)
        bs = min(self.cfg.batch_size, max(1, len(train_idx)))
        step = jax.jit(self._make_indexed_step(), donate_argnums=(0, 1))
        key = jax.random.PRNGKey(seed)
        rng = np.random.RandomState(seed)
        max_epochs = max_epochs or self.cfg.max_epochs
        history = []
        from ..training.trainer import padded_batches

        for _ in range(max_epochs):
            perm = train_idx[rng.permutation(len(train_idx))]
            totals, nb = None, 0
            for bidx in padded_batches(perm, bs):
                key, sub = jax.random.split(key)
                params, opt_state, total, _ = step(
                    params, opt_state, data, self._band_resps_dev,
                    jnp.asarray(bidx, jnp.int32), sub,
                )
                totals = total if totals is None else totals + total
                nb += 1
            history.append(np.asarray(totals) / max(nb, 1))
        return params, opt_state, np.stack(history)

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
