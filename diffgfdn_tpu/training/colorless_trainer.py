"""Colorless-FDN trainer: |H| -> 1 with a sparsity bonus on the matrix.

Reference behaviour: colorless_fdn/trainer.py:17-168. Batches are subsets of
unit-circle bins; valid loss adds the per-delay-line spectral term.
"""

import logging
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import ColorlessFDNConfig
from ..losses import amse_loss, mse_loss, sparsity_loss
from ..models.colorless import ColorlessFDN
from ..ops.unitary import orthogonal_from_skew
from .checkpoints import save_checkpoint

logger = logging.getLogger("diffgfdn_tpu")


class ColorlessFDNTrainer:
    """Adam + StepLR(10, 0.1); loss = spectral(|H|, 1) + alpha * sparsity(A)."""

    def __init__(
        self,
        model: ColorlessFDN,
        config: ColorlessFDNConfig,
        train_dir: str,
        use_asym_loss: bool = False,
    ):
        self.model = model
        self.cfg = config
        self.train_dir = train_dir
        self.spectral_fn = amse_loss if use_asym_loss else mse_loss
        self.train_loss: List[float] = []
        self.valid_loss: List[float] = []

        def loss_fn(params, z_angles, with_per_del: bool):
            # angles cross the jit boundary (real); z is built in-program
            z = jnp.exp(1j * z_angles).astype(jnp.complex64)
            h, h_per_del = self.model.apply(params, z)
            spectral = self.spectral_fn(h, jnp.ones_like(jnp.abs(h)))
            if with_per_del:
                spectral = spectral + self.spectral_fn(
                    h_per_del, jnp.ones_like(jnp.abs(h_per_del))
                )
            a = orthogonal_from_skew(
                params["params"]["feedback_loop"]["random_feedback_matrix"]
            )
            return spectral + self.cfg.alpha * sparsity_loss(a)

        self._loss_valid = jax.jit(lambda p, z: loss_fn(p, z, True))
        self._grad = jax.jit(jax.value_and_grad(lambda p, z: loss_fn(p, z, False)))

        def normalize_fn(params, z_angles):
            z = jnp.exp(1j * z_angles).astype(jnp.complex64)
            h, _ = self.model.apply(params, z)
            energy = jnp.mean(jnp.abs(h) ** 2)
            scale = jnp.power(energy, 0.25)
            p = dict(params["params"])
            p["input_gains"] = p["input_gains"] / scale
            p["output_gains"] = p["output_gains"] / scale
            out = dict(params)
            out["params"] = p
            return out

        self._normalize = jax.jit(normalize_fn)

    def normalize(self, params, z_angles):
        """Unit average FDN energy via io-gain scaling (trainer.py:160-168)."""
        return self._normalize(params, jnp.asarray(z_angles))

    def init_params(self, seed: int = 0, num_probe_bins: int = 16):
        """TPU-safe model init (complex z built inside jit)."""
        angles = jnp.linspace(0.0, np.pi, num_probe_bins)

        @jax.jit
        def _init(key, a):
            return self.model.init(key, jnp.exp(1j * a).astype(jnp.complex64))

        return _init(jax.random.PRNGKey(seed), angles)

    def fit(self, params, num_freq_samples: int, seed: int = 0):
        """Train on random bin batches of the upper unit circle."""
        angles = (np.arange(num_freq_samples) / num_freq_samples * np.pi).astype(
            np.float32
        )
        rng = np.random.RandomState(seed)
        n_train = int(num_freq_samples * self.cfg.train_valid_split)
        perm = rng.permutation(num_freq_samples)
        train_idx, valid_idx = perm[:n_train], perm[n_train:]

        steps_per_epoch = max(1, len(train_idx) // self.cfg.batch_size)
        schedule = optax.exponential_decay(
            self.cfg.lr,
            transition_steps=10 * steps_per_epoch,
            decay_rate=0.1,
            staircase=True,
        )
        optimizer = optax.adam(schedule)
        params = self.normalize(params, angles)
        opt_state = optimizer.init(params)

        bs = min(self.cfg.batch_size, len(train_idx))
        vbs = min(self.cfg.batch_size, max(1, len(valid_idx)))
        start = time.time()
        for epoch in range(self.cfg.max_epochs):
            ep = rng.permutation(train_idx)
            # device-scalar accumulation: one host sync per epoch (a float()
            # per step costs a full round trip through the TPU tunnel)
            total, nb = None, 0
            for k in range(len(ep) // bs):
                z = jnp.asarray(angles[ep[k * bs : (k + 1) * bs]])
                loss, grads = self._grad(params, z)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                total = loss if total is None else total + loss
                nb += 1
            self.train_loss.append(
                float(total) / max(nb, 1) if total is not None else 0.0
            )

            vtotal, vb = None, 0
            # an empty validation split must skip cleanly (a forced
            # iteration used to mean() over a zero-length batch -> NaN)
            for k in range(max(1, len(valid_idx) // vbs) if len(valid_idx) else 0):
                z = jnp.asarray(angles[valid_idx[k * vbs : (k + 1) * vbs]])
                loss = self._loss_valid(params, z)
                vtotal = loss if vtotal is None else vtotal + loss
                vb += 1
            self.valid_loss.append(
                float(vtotal) / max(vb, 1) if vtotal is not None else 0.0
            )
            save_checkpoint(self.train_dir, epoch, params)
            logger.info(
                "colorless epoch %d train %.4f valid %.4f",
                epoch,
                self.train_loss[-1],
                self.valid_loss[-1],
            )
        logger.info("colorless training time: %.3fs", time.time() - start)
        return params
