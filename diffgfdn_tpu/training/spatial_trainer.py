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
        self._jitted_train = None
        # fit() runs each epoch as ONE jitted lax.scan over its steps when
        # the epoch's batches share a common shape (single dispatch per
        # epoch; per-step dispatch costs ~3 ms wall on a tunnel-attached
        # TPU — several times this trainer's compute). False restores the
        # per-step dispatch loop.
        self.scan_epochs = True

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
    ):
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

        for epoch in range(self.cfg.max_epochs):
            t0 = time.time()
            stacked = (
                _stack(list(train_batches(epoch))) if self.scan_epochs else None
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
        params = trainer.fit(params, train_batches)
        results[res] = (trainer, params)
    return results


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

    if (
        not config.use_directional_rirs
        and room_data.amplitudes is not None
        and room_data.amplitudes.ndim == 3
    ):
        # omni training on a directional dataset: collapse the direction
        # axis (the reference's omni runs load omni-reduced amplitude files;
        # spatial_sampling/dataloader.py keys omni vs directional on input)
        import copy

        logger.info("collapsing directional amplitudes to omni (mean over "
                    "directions) for use_directional_rirs=false")
        room_data = copy.copy(room_data)
        room_data.amplitudes = room_data.amplitudes.mean(axis=1)
        room_data.sph_directions = None

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

        def train_batches(epoch, _t=train_idx):
            return iterate_batches(
                arrays, _t, min(config.batch_size, len(_t)),
                shuffle=True, seed=config.seed + epoch,
            )

        def valid_batches(_v=valid_idx):
            return iterate_batches(
                arrays, _v, min(config.batch_size, max(1, len(_v))),
                shuffle=False,
            )

        trainer = SpatialSamplingTrainer(
            model,
            config,
            room_data,
            use_edc_loss=use_edc_loss,
            grid_resolution_m=res,
        )
        example = next(iter(train_batches(0)))
        params = model.init(jax.random.PRNGKey(config.seed), example)
        params = trainer.fit(params, train_batches, valid_batches)
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
