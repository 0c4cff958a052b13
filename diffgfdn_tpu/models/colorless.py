"""Colorless (lossless-prototype) FDN.

Single-group FDN with an unconstrained-orthogonal feedback matrix and a
nominal broadband T60; trained so |H| ~ 1 at every bin
(reference: colorless_fdn/model.py:12-107). The optimised gains and feedback
matrix warm-start the per-group sub-FDNs of a DiffGFDN.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import CouplingMatrixType
from .feedback_loop import FeedbackLoop
from .gfdn import _io_gain_init


class ColorlessFDN(nn.Module):
    """Lossless prototype FDN for one group."""

    sample_rate: float
    delays: Tuple[int, ...]
    nominal_t60: float = 10.0

    @property
    def num_delay_lines(self) -> int:
        return len(self.delays)

    def setup(self):
        n = self.num_delay_lines
        self.input_gains = self.param("input_gains", _io_gain_init(n))
        self.output_gains = self.param("output_gains", _io_gain_init(n))
        # host-side (setup runs under tracing; keep this a static constant)
        gains = 10.0 ** (
            -3.0 * np.asarray(self.delays, np.float64)
            / (self.sample_rate * self.nominal_t60)
        )
        self.feedback_loop = FeedbackLoop(
            sample_rate=self.sample_rate,
            num_groups=1,
            num_delay_lines_per_group=n,
            delays=self.delays,
            coupling_matrix_type=CouplingMatrixType.RANDOM,
            gains=gains,
        )

    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (H (F,), H_per_del (N, F)) for z points on the unit circle."""
        p = self.feedback_loop(z)  # (F, N, N)
        c = self.output_gains[:, 0].astype(jnp.complex64)  # (N,)
        b = self.input_gains[:, 0].astype(jnp.complex64)
        pb = jnp.einsum("fnm,m->nf", p, b, precision=jax.lax.Precision.HIGHEST)  # (N, F)
        h_per_del = c[:, None] * pb
        h = jnp.sum(h_per_del, axis=0)
        return h, h_per_del

    def feedback_matrix(self) -> jnp.ndarray:
        """The orthogonalised feedback matrix."""
        return self.feedback_loop.coupled_feedback_matrix()
