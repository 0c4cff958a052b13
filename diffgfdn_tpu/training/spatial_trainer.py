"""Common-slopes spatial-sampling trainers and the resolution-sweep solver.

Reference behaviour: spatial_sampling/trainer.py:22-251 and
spatial_sampling/solver.py:454-659 — per-octave-band DNNs mapping receiver
position to CS amplitudes (omni) or SH beamforming weights (directional),
trained at several grid resolutions with Adam + StepLR(20, 0.1),
checkpoints nested per grid resolution.
"""

import logging
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import DNNType, SpatialSamplingConfig
from ..data.spatial_dataset import (
    arrays_from_spatial_dataset,
    create_2d_grid_data,
    SpatialRoomDataset,
    split_by_grid_resolution,
)
from ..data.batching import iterate_batches
from ..losses.spatial import (
    find_position_idx,
    make_decay_envelopes,
    make_smoothness_kernel,
    spatial_edc_loss,
    spatial_mse_loss,
    spatial_smoothness_loss,
)
from ..models.spatial import (
    build_analysis_matrix,
    directional_amplitudes,
    DirectionalBeamformerWeightsCNN,
    DirectionalBeamformerWeightsMLP,
    OmniAmplitudesMLP,
)
from .checkpoints import save_checkpoint

logger = logging.getLogger("diffgfdn_tpu")


def build_spatial_model(
    config: SpatialSamplingConfig,
    num_slopes: int,
    ambi_order: Optional[int],
):
    """Instantiate the configured CS-amplitude DNN.

    Missing ``mlp_config``/``cnn_config`` sections mean default
    hyperparameters (several reference presets omit them; the reference's
    schema annotates the fields with default-constructed instances).
    """
    from ..config.schema import CNNConfig, MLPConfig

    dnn = config.dnn_config
    mlp = dnn.mlp_config or MLPConfig()
    cnn = dnn.cnn_config or CNNConfig()
    if config.use_directional_rirs:
        if config.network_type == DNNType.MLP:
            return DirectionalBeamformerWeightsMLP(
                num_groups=num_slopes,
                ambi_order=ambi_order,
                num_fourier_features=dnn.num_fourier_features,
                num_hidden_layers=mlp.num_hidden_layers,
                num_neurons=mlp.num_neurons_per_layer,
            )
        return DirectionalBeamformerWeightsCNN(
            num_groups=num_slopes,
            ambi_order=ambi_order,
            num_fourier_features=dnn.num_fourier_features,
            num_hidden_channels=cnn.num_hidden_channels,
            num_layers=cnn.num_layers,
            kernel_size=tuple(cnn.kernel_size),
        )
    return OmniAmplitudesMLP(
        num_groups=num_slopes,
        num_fourier_features=dnn.num_fourier_features,
        num_hidden_layers=mlp.num_hidden_layers,
        num_neurons=mlp.num_neurons_per_layer,
        gain_limits=(1e-5, 1.0),
    )


class SpatialSamplingTrainer:
    """Trainer for CS-amplitude DNNs (MLP and CNN paths)."""

    def __init__(
        self,
        model,
        config: SpatialSamplingConfig,
        room_data: SpatialRoomDataset,
        use_edc_loss: bool = True,
        use_smoothness_loss: bool = False,
        grid_resolution_m: Optional[float] = None,
    ):
        self.model = model
        self.cfg = config
        self.room_data = room_data
        self.use_directional = config.use_directional_rirs
        self.is_cnn = config.network_type == DNNType.CNN
        self.grid_resolution_m = grid_resolution_m
        self.train_loss: List[float] = []
        self.valid_loss: List[float] = []

        self.analysis_matrix = None
        if self.use_directional:
            self.analysis_matrix = build_analysis_matrix(
                room_data.ambi_order,
                room_data.sph_directions,
                config.dnn_config.beamformer_type,
            )

        cdt = np.squeeze(np.asarray(room_data.common_decay_times))
        slopes = cdt.reshape(-1)[: room_data.num_rooms]
        edc_len = int(float(np.max(slopes)) * room_data.sample_rate)
        self.envelopes = (
            make_decay_envelopes(slopes, edc_len, room_data.sample_rate)
            if use_edc_loss
            else None
        )
        self.kernel_weights = (
            jnp.asarray(make_smoothness_kernel(room_data.receiver_position))
            if use_smoothness_loss
            else None
        )
        self._all_positions = jnp.asarray(
            room_data.receiver_position.astype(np.float32)
        )
        self._build_steps()

    # ------------------------------ loss -----------------------------------

    def _predict(self, params, batch) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """(amplitudes, raw weights or None) for a batch."""
        if self.use_directional:
            weights = self.model.apply(params, batch)
            amps = directional_amplitudes(
                jnp.asarray(self.analysis_matrix), weights
            )
            return amps, weights
        return self.model.apply(params, batch), None

    def _losses(self, params, batch) -> Dict[str, jnp.ndarray]:
        amps, weights = self._predict(params, batch)
        target = batch["target_common_slope_amps"]
        if "floor_mask" in batch:
            # CNN path: only grid cells inside the floor plan contribute
            # (reference: spatial_sampling/trainer.py CNN branch + binary mask)
            mask = batch["floor_mask"].reshape(
                (-1,) + (1,) * (amps.ndim - 1)
            )
            amps = amps * mask + (1.0 - mask) * target
        out: Dict[str, jnp.ndarray] = {}
        if self.envelopes is not None:
            out["edc_loss"] = spatial_edc_loss(amps, target, self.envelopes)
        else:
            out["mse_loss"] = spatial_mse_loss(amps, target)
        if self.kernel_weights is not None and weights is not None:
            pos_idx = find_position_idx(
                self._all_positions, batch["listener_position"]
            )
            out["smoothness_loss"] = 1e-4 * spatial_smoothness_loss(
                self.kernel_weights, pos_idx, weights
            )
        return out

    def _build_steps(self):
        def loss_fn(params, batch):
            losses = self._losses(params, batch)
            return sum(losses.values()), losses

        def train_step(params, opt_state, batch):
            (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, aux

        def train_epoch(params, opt_state, stacked):
            def body(carry, batch):
                p, o = carry
                p, o, total, _ = train_step(p, o, batch)
                return (p, o), total

            (params, opt_state), totals = jax.lax.scan(
                body, (params, opt_state), stacked
            )
            return params, opt_state, totals

        def valid_epoch(params, stacked):
            def body(carry, batch):
                total, _ = loss_fn(params, batch)
                return carry, total

            _, totals = jax.lax.scan(body, 0, stacked)
            return totals

        self._train_step_fn = train_step
        self._train_epoch_fn = train_epoch
        self._valid_epoch = jax.jit(valid_epoch)
        self._valid_step = jax.jit(loss_fn)
        self._loss_fn = loss_fn
        self._jitted_train = None
        # fit()/fit_indexed() run each epoch as ONE jitted lax.scan over
        # its steps when the epoch's batches share a common shape (single
        # dispatch per epoch; per-step dispatch costs ~3 ms wall on a
        # tunnel-attached TPU — several times this trainer's compute).
        # False restores the per-step dispatch loop.
        self.scan_epochs = True

    # --------------------- device-resident indexed path ---------------------

    _INDEXED_KEYS = (
        "norm_listener_position",
        "listener_position",
        "target_common_slope_amps",
    )

    def upload_arrays(self, arrays) -> Dict[str, jnp.ndarray]:
        """device_put ONCE the (small, real) arrays the loss reads.

        The MLP losses touch only positions and CS-amplitude targets —
        uploading the full batch dicts (which carry the rfft spectra)
        every epoch would re-ship the dataset over the TPU tunnel."""
        return {
            k: jnp.asarray(np.asarray(getattr(arrays, k), np.float32))
            for k in self._INDEXED_KEYS
            if getattr(arrays, k) is not None
        }

    def fit_indexed(
        self,
        params,
        arrays,
        train_idx: np.ndarray,
        valid_idx: Optional[np.ndarray] = None,
        seed: int = 0,
        mesh=None,
    ):
        """Epoch loop over device-resident data (on-device index gathers).

        MLP counterpart of GFDNTrainer.fit_indexed: the dataset uploads
        once, each epoch ships only an int32 batch-index matrix, and the
        whole epoch runs as one lax.scan dispatch (training/scan.py).

        ``mesh``: optional multi-device mesh with a ``batch`` axis — the
        gathered per-step batch is sharded over it (data parallelism over
        receivers; GSPMD inserts the psum for the loss reduction). ``None``
        trains on the default single device.

        Validation is evaluated over full batches plus an unpadded
        remainder batch and combined as an item-count-weighted mean, so
        the reported valid loss is the exact unpadded per-item mean (no
        wrap-around over-weighting). Training batches stay wrap-padded
        (duplicates there only reorder gradient noise)."""
        from .scan import scan_epoch
        from .trainer import exact_valid_batches, padded_batches

        if len(train_idx) == 0:
            raise ValueError(
                "no training items: train_idx is empty (check "
                "split_dataset_by_resolution / dataset size) — training "
                "would silently run zero steps"
            )
        data = self.upload_arrays(arrays)
        bsh = None
        if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(mesh, P("batch"))
            repl = NamedSharding(mesh, P())
            # replicate the (small) dataset so per-batch gathers are local
            data = {k: jax.device_put(v, repl) for k, v in data.items()}
            params = jax.device_put(
                params, jax.tree_util.tree_map(lambda _: repl, params)
            )
        bs = min(self.cfg.batch_size, max(1, len(train_idx)))
        steps_per_epoch = max(1, len(list(padded_batches(train_idx, bs))))
        schedule = optax.exponential_decay(
            self.cfg.lr,
            transition_steps=20 * steps_per_epoch,
            decay_rate=0.1,
            staircase=True,
        )
        self.optimizer = optax.adam(schedule)
        opt_state = self.optimizer.init(params)

        def gather(idx):
            batch = {k: v[idx] for k, v in data.items()}
            if bsh is not None:
                batch = {
                    k: jax.lax.with_sharding_constraint(v, bsh)
                    for k, v in batch.items()
                }
            return batch

        def train_step(p, o, idx):
            (total, aux), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(p, gather(idx))
            updates, o = self.optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o, total

        if self.scan_epochs:
            def train_epoch(p, o, idx_mat):
                def body(carry, idx, _key):
                    p_, o_, total = train_step(*carry, idx)
                    return (p_, o_), total

                (p, o), totals = scan_epoch(body, (p, o), idx_mat)
                return p, o, totals

            def valid_epoch(p, idx_mat):
                def body(carry, idx, _key):
                    total, _ = self._loss_fn(p, gather(idx))
                    return carry, total

                _, totals = scan_epoch(body, 0, idx_mat)
                return totals

            train_fn = jax.jit(train_epoch, donate_argnums=(0, 1))
            valid_fn = jax.jit(valid_epoch)
        else:
            step_fn = jax.jit(train_step, donate_argnums=(0, 1))
            vstep_fn = jax.jit(lambda p, idx: self._loss_fn(p, gather(idx))[0])

        vidx_mat, vrem, vbs = None, np.empty(0, np.int64), 0
        if valid_idx is not None and len(valid_idx):
            vbs = min(self.cfg.batch_size, len(valid_idx))
            vfull, vrem = exact_valid_batches(np.asarray(valid_idx), vbs)
            if vfull:
                vidx_mat = jnp.asarray(np.stack(vfull), jnp.int32)
        vrem_fn = (
            jax.jit(lambda p, idx: self._loss_fn(p, gather(idx))[0])
            if len(vrem)
            else None
        )
        rng = np.random.RandomState(seed)
        for epoch in range(self.cfg.max_epochs):
            t0 = time.time()
            perm = np.asarray(train_idx)[rng.permutation(len(train_idx))]
            batches = list(padded_batches(perm, bs))
            if self.scan_epochs:
                idx_mat = jnp.asarray(np.stack(batches), jnp.int32)
                params, opt_state, totals = train_fn(params, opt_state, idx_mat)
                self.train_loss.append(float(jnp.mean(totals)))
            else:
                total = None
                for bidx in batches:
                    params, opt_state, loss = step_fn(
                        params, opt_state, jnp.asarray(bidx, jnp.int32)
                    )
                    total = loss if total is None else total + loss
                self.train_loss.append(float(total) / max(len(batches), 1))
            if vidx_mat is not None or len(vrem):
                # item-count-weighted mean over full batches + unpadded
                # remainder = exact unpadded per-item mean (no wrap bias)
                vtot, vweight = 0.0, 0
                if vidx_mat is not None:
                    if self.scan_epochs:
                        vtot += float(
                            jnp.sum(valid_fn(params, vidx_mat))
                        ) * vbs
                    else:
                        vtot += vbs * sum(
                            float(vstep_fn(params, row)) for row in vidx_mat
                        )
                    vweight += vbs * vidx_mat.shape[0]
                if len(vrem):
                    vtot += float(
                        vrem_fn(params, jnp.asarray(vrem, jnp.int32))
                    ) * len(vrem)
                    vweight += len(vrem)
                self.valid_loss.append(vtot / vweight)
            save_checkpoint(self._checkpoint_dir(), epoch, params)
            logger.info(
                "spatial epoch %d train %.4f%s (%.2fs)",
                epoch,
                self.train_loss[-1],
                (
                    f" valid {self.valid_loss[-1]:.4f}"
                    if vidx_mat is not None
                    else ""
                ),
                time.time() - t0,
            )
        return params

    # ---------------------------- training ---------------------------------

    def _checkpoint_dir(self) -> str:
        base = Path(self.cfg.train_dir)
        if self.grid_resolution_m is not None:
            return str(base / f"grid_resolution={self.grid_resolution_m:.1f}")
        return str(base)

    def fit(
        self,
        params,
        train_batches: Callable[[int], Iterable[Dict]],
        valid_batches: Optional[Callable[[], Iterable[Dict]]] = None,
        static_batches: bool = False,
    ):
        """Generator-batch epoch loop (CNN grids / custom batch sources).

        ``static_batches=True`` declares that ``train_batches(epoch)``
        yields the SAME batches every epoch (e.g. the CNN's one full-grid
        batch), so the stacked epoch uploads once instead of per epoch.
        Index-based MLP training should prefer :meth:`fit_indexed`, which
        keeps the dataset device-resident."""
        steps_per_epoch = max(1, sum(1 for _ in train_batches(0)))
        schedule = optax.exponential_decay(
            self.cfg.lr,
            transition_steps=20 * steps_per_epoch,
            decay_rate=0.1,
            staircase=True,
        )
        self.optimizer = optax.adam(schedule)
        opt_state = self.optimizer.init(params)
        self._jitted_train = jax.jit(self._train_step_fn)
        jitted_epoch = jax.jit(self._train_epoch_fn, donate_argnums=(0, 1))

        def _stack(batches):
            """Stack same-shaped batch dicts along a new leading (step)
            axis for lax.scan; None when the epoch is ragged."""
            if not batches:
                return None
            keys = batches[0].keys()
            if any(b.keys() != keys for b in batches[1:]):
                return None
            out = {}
            for k in keys:
                arrs = [np.asarray(b[k]) for b in batches]
                if any(a.shape != arrs[0].shape for a in arrs[1:]):
                    return None
                out[k] = jnp.asarray(np.stack(arrs))
            return out

        vstacked = None
        if valid_batches is not None and self.scan_epochs:
            vstacked = _stack(list(valid_batches()))

        static_stacked = (
            _stack(list(train_batches(0)))
            if static_batches and self.scan_epochs
            else None
        )
        for epoch in range(self.cfg.max_epochs):
            t0 = time.time()
            if static_stacked is not None:
                stacked = static_stacked
            else:
                stacked = (
                    _stack(list(train_batches(epoch)))
                    if self.scan_epochs
                    else None
                )
            if stacked is not None:
                # ONE dispatch for the whole epoch
                params, opt_state, totals = jitted_epoch(
                    params, opt_state, stacked
                )
                self.train_loss.append(float(jnp.mean(totals)))
            else:
                # losses accumulate ON DEVICE; a float() per step would cost
                # a full host round trip (~45 ms through the TPU tunnel) and
                # serialize the otherwise-pipelined steps
                total, nb = None, 0
                for batch in train_batches(epoch):
                    params, opt_state, loss, _ = self._jitted_train(
                        params, opt_state, batch
                    )
                    total = loss if total is None else total + loss
                    nb += 1
                self.train_loss.append(
                    float(total) / max(nb, 1) if total is not None else 0.0
                )
            if valid_batches is not None:
                if vstacked is not None:
                    vtotals = self._valid_epoch(params, vstacked)
                    self.valid_loss.append(float(jnp.mean(vtotals)))
                else:
                    vtotal, vb = None, 0
                    for batch in valid_batches():
                        loss, _ = self._valid_step(params, batch)
                        vtotal = loss if vtotal is None else vtotal + loss
                        vb += 1
                    self.valid_loss.append(
                        float(vtotal) / max(vb, 1) if vtotal is not None else 0.0
                    )
            save_checkpoint(self._checkpoint_dir(), epoch, params)
            logger.info(
                "spatial epoch %d train %.4f%s (%.2fs)",
                epoch,
                self.train_loss[-1],
                f" valid {self.valid_loss[-1]:.4f}" if valid_batches else "",
                time.time() - t0,
            )
        return params

    def predict_amplitudes(self, params, batch) -> np.ndarray:
        """Inference: CS amplitudes for the batch positions."""
        amps, _ = jax.jit(self._predict)(params, batch)
        return np.asarray(amps)


def make_cnn_batch(
    room_data: SpatialRoomDataset, indices: Optional[np.ndarray] = None
) -> Dict[str, np.ndarray]:
    """One full-grid CNN training batch: normalized mesh + masked labels.

    The CNN consumes the 2-D floor-plan grid directly; targets are
    nearest-interpolated onto the grid and zeroed outside the floor plan
    (reference: spatial_sampling/dataloader.py:330-444).
    """
    if indices is None:
        indices = np.arange(room_data.num_rec)
    mesh, norm_mesh, labels = create_2d_grid_data(room_data, indices)
    mask = room_data.get_binary_mask(mesh).ravel().astype(np.float32)
    return {
        "mesh_2d": norm_mesh.astype(np.float32),
        "mesh_2d_raw": mesh.astype(np.float32),
        "target_common_slope_amps": labels,
        "floor_mask": mask,
    }


def run_training_spatial_sampling_cnn(
    config: SpatialSamplingConfig,
    room_data: SpatialRoomDataset,
    grid_resolutions: Optional[List[float]] = None,
    use_edc_loss: bool = True,
):
    """CNN variant of the resolution sweep: full-grid image batches."""
    if grid_resolutions is None:
        n = config.num_grid_spacing or 1
        grid_resolutions = [room_data.grid_spacing_m * k for k in range(n, 0, -1)]
    model = build_spatial_model(config, room_data.num_rooms, room_data.ambi_order)
    results = {}
    for res in grid_resolutions:
        train_idx, _ = split_by_grid_resolution(room_data, res)
        batch = make_cnn_batch(room_data, train_idx)

        def train_batches(epoch, _b=batch):
            yield _b

        trainer = SpatialSamplingTrainer(
            model, config, room_data, use_edc_loss=use_edc_loss,
            grid_resolution_m=res,
        )
        params = model.init(jax.random.PRNGKey(config.seed), batch)
        # the one full-grid batch is identical every epoch: upload it once
        params = trainer.fit(params, train_batches, static_batches=True)
        results[res] = (trainer, params)
    return results


def collapse_amplitudes_to_omni(
    room_data: SpatialRoomDataset,
) -> SpatialRoomDataset:
    """Average a directional dataset's CS amplitudes over directions.

    Omni training on a directional dataset collapses the direction axis
    (axis 1 of ``(num_rec, num_directions, num_slopes[, num_bands])``);
    the reference's omni runs load omni-reduced amplitude files instead
    (spatial_sampling/dataloader.py keys omni vs directional on input).
    Datasets without a direction axis (``sph_directions is None``) pass
    through unchanged — a trailing band axis alone must NOT be collapsed.
    """
    if room_data.amplitudes is None or room_data.sph_directions is None:
        return room_data
    import copy

    logger.info("collapsing directional amplitudes to omni (mean over "
                "directions) for use_directional_rirs=false")
    room_data = copy.copy(room_data)
    room_data.amplitudes = room_data.amplitudes.mean(axis=1)
    room_data.sph_directions = None
    return room_data


def run_training_spatial_sampling(
    config: SpatialSamplingConfig,
    room_data: Optional[SpatialRoomDataset] = None,
    grid_resolutions: Optional[List[float]] = None,
    use_edc_loss: bool = True,
) -> Dict[float, Tuple[SpatialSamplingTrainer, Dict]]:
    """Sweep grid resolutions; train one model per resolution.

    Reference: spatial_sampling/solver.py:454-659 (minus the plotting,
    which lives in utils.plot). Returns {resolution: (trainer, params)}.
    """
    if room_data is None:
        from ..data.spatial_dataset import SpatialThreeRoomDataset

        room_data = SpatialThreeRoomDataset(config.room_dataset_path)

    if not config.use_directional_rirs:
        room_data = collapse_amplitudes_to_omni(room_data)

    if config.network_type == DNNType.CNN:
        return run_training_spatial_sampling_cnn(
            config, room_data, grid_resolutions, use_edc_loss
        )

    if grid_resolutions is None:
        n = config.num_grid_spacing or 3
        grid_resolutions = [
            room_data.grid_spacing_m * k for k in range(n, 0, -1)
        ]

    model = build_spatial_model(
        config, room_data.num_rooms, room_data.ambi_order
    )
    arrays = arrays_from_spatial_dataset(room_data)
    results = {}
    for res in grid_resolutions:
        train_idx, valid_idx = split_by_grid_resolution(room_data, res)

        trainer = SpatialSamplingTrainer(
            model,
            config,
            room_data,
            use_edc_loss=use_edc_loss,
            grid_resolution_m=res,
        )
        example = next(
            iterate_batches(
                arrays, train_idx, min(config.batch_size, len(train_idx)),
                shuffle=False,
            )
        )
        params = model.init(jax.random.PRNGKey(config.seed), example)
        # device-resident indexed path: the dataset uploads once; each
        # epoch ships one int32 index matrix and runs as one scan dispatch
        params = trainer.fit_indexed(
            params, arrays, train_idx, valid_idx, seed=config.seed
        )
        results[res] = (trainer, params)
        _save_beamformer_maps(config, room_data, trainer, params, example, res)
    return results


def _save_beamformer_maps(
    config, room_data, trainer, params, example, resolution: float
) -> None:
    """Directional-amplitude contour maps per resolution (reference
    spatial_sampling/solver.py:160-263) for SH-weight models."""
    if not trainer.use_directional or config.train_dir is None:
        return
    try:
        amps = np.asarray(
            jax.jit(lambda p, b: trainer._predict(p, b)[0])(params, example)
        )
        from ..utils.plot import plot_beamformer_map

        plot_beamformer_map(
            amps[0],
            room_data.sph_directions,
            room_data.ambi_order,
            room_data.num_rooms,
            save_path=str(
                Path(config.train_dir)
                / f"beamformer_map_grid_resolution_m={resolution:.3f}.png"
            ),
        )
    except Exception as exc:  # plotting must never kill a training run
        logger.warning("beamformer map plotting failed: %s", exc)
