"""GFDN feedback loop: P(z) = (D(z) Gamma(z)^-1 - A(z))^-1 at all rFFT bins.

Functional parity with the reference FeedbackLoop (feedback_loop.py:146-455),
re-designed for XLA:

* the per-bin complex inverse runs through the real-block batched inverse in
  :mod:`diffgfdn_tpu.kernels.linalg` (K x N x N at once, no python loops);
* the block mixing matrix ortho(M_i) @ ortho(M_j) is one batched einsum;
* the FIR paraunitary coupling cascade is a static loop of matmuls;
* all structural choices (coupling type, absorption mode) are static module
  fields, so each config compiles to a single specialized XLA program.

Absorption modes:
* fixed per-line scalar gains (``gains``),
* learnable common decay times per group (``learn_common_decay_times``),
* fixed per-line SOS cascades fitted by the GEQ designer (``sos_coeffs``),
* fixed per-line IIR filters fitted by warped Prony (``iir_coeffs``).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import CouplingMatrixType
from ..kernels.linalg import cinv

# full-f32 contractions: TPU's default matmul precision is bf16
_F32 = jax.lax.Precision.HIGHEST
from ..ops.absorption import decay_times_to_gain_per_sample
from ..ops.biquad import iir_frequency_response, sos_frequency_response
from ..ops.unitary import fir_paraunitary, nd_unitary, orthogonal_from_skew


class FeedbackLoop(nn.Module):
    """Coupled feedback loop of the grouped FDN.

    Attributes (all static; numpy arrays are baked in as constants):
        delays: per-delay-line lengths in samples, length N.
        gains: optional fixed per-line absorption gains (N,).
        sos_coeffs: optional (N, n_sections, 3, 2) absorption SOS cascades.
        iir_coeffs: optional (N, order+1, 2) absorption IIR coefficients.
        common_decay_times_init: optional (G,) initial decay times when
            learning them.
        colorless_feedback_matrix_skew: optional (G, Nper, Nper) skew
            pre-images such that expm(skew(x)) equals the colorless-FDN
            optimised per-group feedback matrices (computed host-side).
    """

    sample_rate: float
    num_groups: int
    num_delay_lines_per_group: int
    delays: Tuple[int, ...]
    coupling_matrix_type: CouplingMatrixType = CouplingMatrixType.SCALAR
    use_zero_coupling: bool = True
    coupling_matrix_order: Optional[int] = None
    learn_common_decay_times: bool = False
    gains: Optional[np.ndarray] = None
    sos_coeffs: Optional[np.ndarray] = None
    iir_coeffs: Optional[np.ndarray] = None
    common_decay_times_init: Optional[Tuple[float, ...]] = None
    colorless_feedback_matrix_skew: Optional[np.ndarray] = None
    trainable_feedback: bool = True
    # fused Pallas Gauss-Jordan inverse (kernels.pallas_cinv). True is a
    # PLACEMENT ASSERTION: the caller promises this model's computation is
    # placed on TPU devices (the compiled kernels are TPU-only). Resolve it
    # at build time from the actual devices/mesh — never from
    # jax.default_backend(), which lies for computation placed off the
    # process-default platform (see utils.placement / training.build).
    # None/False = portable XLA formulation (kernels.linalg).
    use_pallas_inverse: Optional[bool] = None

    def _pallas_inverse(self) -> bool:
        return bool(self.use_pallas_inverse)

    @property
    def num_delays(self) -> int:
        return len(self.delays)

    # ------------------------------ parameters ------------------------------

    def setup(self):
        n = self.num_delays
        nper = self.num_delay_lines_per_group
        g = self.num_groups

        if self.coupling_matrix_type == CouplingMatrixType.RANDOM:
            self.random_feedback_matrix = self.param(
                "random_feedback_matrix",
                lambda key: (2.0 * jax.random.uniform(key, (n, n)) - 1.0)
                / np.sqrt(nper),
            )
        else:
            if self.colorless_feedback_matrix_skew is not None:
                init = jnp.asarray(
                    self.colorless_feedback_matrix_skew, dtype=jnp.float32
                )
                if self.trainable_feedback:
                    self.M = self.param("M", lambda key: init)
                else:
                    self.M = init
            else:
                self.M = self.param(
                    "M",
                    lambda key: (2.0 * jax.random.uniform(key, (g, nper, nper)) - 1.0)
                    / np.sqrt(nper),
                )
            if self.coupling_matrix_type == CouplingMatrixType.SCALAR:
                n_alpha = g * (g - 1) // 2
                if self.use_zero_coupling:
                    self.alpha = jnp.zeros((n_alpha,))
                else:
                    self.alpha = self.param(
                        "alpha",
                        lambda key: np.pi / 4 * jax.random.uniform(key, (n_alpha,)),
                    )
            elif self.coupling_matrix_type == CouplingMatrixType.FILTER:
                order = self.coupling_matrix_order
                self.unit_vectors = self.param(
                    "unit_vectors", nn.initializers.normal(1.0), (g, order - 1)
                )
                self.unitary_matrix = self.param(
                    "unitary_matrix",
                    lambda key: (2.0 * jax.random.uniform(key, (g, g)) - 1.0)
                    / np.sqrt(g),
                )

        if self.learn_common_decay_times:
            if self.common_decay_times_init is not None:
                init_t = jnp.asarray(self.common_decay_times_init, jnp.float32)
                self.common_decay_times = self.param(
                    "common_decay_times", lambda key: init_t.reshape(g)
                )
            else:
                self.common_decay_times = self.param(
                    "common_decay_times",
                    lambda key: 0.1 + 1.9 * jax.random.uniform(key, (g,)),
                )

    # ------------------------------ absorption ------------------------------

    @property
    def use_absorption_filters(self) -> bool:
        return self.sos_coeffs is not None or self.iir_coeffs is not None

    def gamma_scalar(self) -> jnp.ndarray:
        """Per-line scalar absorption gains, shape (N,)."""
        if self.learn_common_decay_times:
            delays = jnp.asarray(self.delays, jnp.float32).reshape(
                self.num_groups, self.num_delay_lines_per_group
            )
            gains = decay_times_to_gain_per_sample(
                self.common_decay_times[:, None], delays, self.sample_rate
            )
            return gains.reshape(-1)
        assert self.gains is not None, "no scalar gains configured"
        return jnp.asarray(self.gains, jnp.float32)

    def gamma_response(self, z: jnp.ndarray) -> jnp.ndarray:
        """Per-line absorption filter responses, shape (N, F)."""
        if self.sos_coeffs is not None:
            coeffs = jnp.asarray(self.sos_coeffs, jnp.float32)
            if self._pallas_inverse():
                # same TPU-placement contract as the inverse kernel
                from ..kernels.pallas_sos import sos_cascade_response_pallas

                return sos_cascade_response_pallas(
                    coeffs[..., 0], coeffs[..., 1], z, interpret=False
                )
            return sos_frequency_response(coeffs[..., 0], coeffs[..., 1], z)
        coeffs = jnp.asarray(self.iir_coeffs, jnp.float32)
        return iir_frequency_response(coeffs[..., 0], coeffs[..., 1], z)

    # ---------------------------- feedback matrix ---------------------------

    def block_mixing_matrix(self) -> jnp.ndarray:
        """Block matrix with blocks ortho(M_i) @ ortho(M_j), shape (N, N)."""
        o = orthogonal_from_skew(self.M)  # (G, Nper, Nper)
        nper = self.num_delay_lines_per_group
        block = jnp.einsum("gab,hbc->gahc", o, o, precision=_F32)
        return block.reshape(self.num_delays, self.num_delays)

    def coupling_matrix(self) -> jnp.ndarray:
        """Room-level coupling: (G, G) unitary or (order, G, G) paraunitary."""
        if self.coupling_matrix_type == CouplingMatrixType.SCALAR:
            alpha = jnp.clip(self.alpha, -np.pi, np.pi)
            return nd_unitary(alpha, self.num_groups)
        # FILTER
        v = self.unit_vectors
        v = v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-9)
        u0 = orthogonal_from_skew(self.unitary_matrix)
        return fir_paraunitary(u0, v)

    def coupled_feedback_matrix(self) -> jnp.ndarray:
        """A = block_M ∘ (Phi ⊗ 1): (N, N) or (order, N, N) for FILTER mode."""
        if self.coupling_matrix_type == CouplingMatrixType.RANDOM:
            return orthogonal_from_skew(self.random_feedback_matrix)
        block = self.block_mixing_matrix()
        phi = self.coupling_matrix()
        nper = self.num_delay_lines_per_group
        if self.coupling_matrix_type == CouplingMatrixType.SCALAR:
            expand = jnp.repeat(jnp.repeat(phi, nper, axis=0), nper, axis=1)
            return block * expand
        expand = jnp.repeat(jnp.repeat(phi, nper, axis=1), nper, axis=2)
        return block[None, :, :] * expand

    # -------------------------------- forward -------------------------------

    @property
    def is_block_diagonal(self) -> bool:
        """Zero inter-group coupling makes the loop matrix block-diagonal.

        The coupled feedback matrix A = block_M ∘ (I ⊗ 1) then has only the
        per-group diagonal blocks ortho(M_g) @ ortho(M_g) — inverting G
        independent Nper x Nper systems is ~(G^2 x fewer steps) cheaper
        than one N x N elimination.
        """
        return (
            self.coupling_matrix_type == CouplingMatrixType.SCALAR
            and self.use_zero_coupling
        )

    def loop_matrix_blocks(self, z: jnp.ndarray) -> jnp.ndarray:
        """Per-group loop matrices (G, F, Nper, Nper) for the zero-coupling case."""
        assert self.is_block_diagonal
        g = self.num_groups
        nper = self.num_delay_lines_per_group
        delays = jnp.asarray(self.delays, jnp.float32).reshape(g, nper)
        d_diag = z[None, :, None] ** delays[:, None, :]  # (G, F, Nper)
        if self.use_absorption_filters:
            gamma_inv = (1.0 / self.gamma_response(z)).reshape(g, nper, -1)
            ddecay = d_diag * jnp.transpose(gamma_inv, (0, 2, 1))
        else:
            gamma_inv = (1.0 / self.gamma_scalar()).reshape(g, nper)
            ddecay = d_diag * gamma_inv[:, None, :]
        o = orthogonal_from_skew(self.M)  # (G, Nper, Nper)
        a_blocks = jnp.einsum("gab,gbc->gac", o, o, precision=_F32).astype(
            jnp.complex64
        )
        eye = jnp.eye(nper, dtype=jnp.complex64)
        return (
            ddecay[..., None].astype(jnp.complex64) * eye[None, None]
            - a_blocks[:, None]
        )

    def loop_matrix(self, z: jnp.ndarray) -> jnp.ndarray:
        """M(z) = D(z) Gamma(z)^-1 - A(z), shape (F, N, N) complex64."""
        delays = jnp.asarray(self.delays, jnp.float32)
        # z^m per bin per line: (F, N)
        d_diag = z[:, None] ** delays[None, :]

        if self.use_absorption_filters:
            gamma_inv = 1.0 / self.gamma_response(z).T  # (F, N)
        else:
            gamma_inv = (1.0 / self.gamma_scalar())[None, :]  # (1, N)
        ddecay = d_diag * gamma_inv  # (F, N)

        a = self.coupled_feedback_matrix()
        if self.coupling_matrix_type == CouplingMatrixType.FILTER:
            order = a.shape[0]
            zinv_pow = (1.0 / z[:, None]) ** jnp.arange(order)[None, :]
            a_z = jnp.einsum(
                "fo,onm->fnm", zinv_pow.astype(jnp.complex64),
                a.astype(jnp.complex64), precision=_F32,
            )
        else:
            a_z = a.astype(jnp.complex64)[None, :, :]

        eye = jnp.eye(self.num_delays, dtype=jnp.complex64)
        return ddecay[:, :, None].astype(jnp.complex64) * eye[None, :, :] - a_z

    def block_responses(self, z: jnp.ndarray) -> jnp.ndarray:
        """Per-group responses P_g(z) = loop_matrix_g(z)^-1, (G, F, Nper, Nper).

        Zero-coupling only: the full P(z) is block-diagonal with these
        blocks, so callers that contract P with per-group weights
        (transfer_function_group_heads) can consume the blocks directly
        and never materialize the (F, N, N) plane (~75 MB at flagship
        scale, mostly structural zeros)."""
        g = self.num_groups
        nper = self.num_delay_lines_per_group
        f = z.shape[0]
        return self._inv(
            self.loop_matrix_blocks(z).reshape(g * f, nper, nper)
        ).reshape(g, f, nper, nper)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """P(z) = loop_matrix(z)^-1, shape (F, N, N) complex64."""
        if self.is_block_diagonal:
            # invert the G independent Nper x Nper blocks, then assemble
            g = self.num_groups
            nper = self.num_delay_lines_per_group
            f = z.shape[0]
            p_blocks = self.block_responses(z)
            p = jnp.zeros((f, self.num_delays, self.num_delays), jnp.complex64)
            for k in range(g):
                s = k * nper
                p = p.at[:, s : s + nper, s : s + nper].set(p_blocks[k])
            return p
        return self._inv(self.loop_matrix(z))

    def _inv(self, m: jnp.ndarray) -> jnp.ndarray:
        """Batched (K, N, N) complex inverse via the selected implementation."""
        if self._pallas_inverse():
            # compiled (interpret=False) is safe here by contract:
            # use_pallas_inverse=True asserts TPU placement
            from ..kernels.linalg import cinv_with
            from ..kernels.pallas_cinv import cinv_pallas

            return cinv_with(
                lambda x: cinv_pallas(x, interpret=False),
                pallas_bwd=True,
                interpret=False,
            )(m)
        return cinv(m)

    def _solve1(self, m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Single-RHS solve via the selected implementation."""
        if self._pallas_inverse():
            from ..kernels.linalg import csolve1_pallas

            return csolve1_pallas(m, b, interpret=False)
        from ..kernels.linalg import csolve1

        return csolve1(m, b)

    def drive(
        self,
        z: jnp.ndarray,
        b_vec: jnp.ndarray,
        transpose: bool = False,
        use_solve: bool = False,
    ) -> jnp.ndarray:
        """q(z) = P(z) b (or P(z)^T b), shape (F, N) complex64.

        Implementation selection:
        * Pallas path (TPU placement): ALWAYS the fused solve
          (kernels.linalg.csolve1_pallas) — its forward runs the same
          Gauss-Jordan inverse kernel + one matvec, and its VJP is two
          O(N^2) matvecs on the saved inverse, vs the full-inverse path's
          two O(N^3) batched matmuls (the dominant backward cost at
          N = 27 directional scale).
        * XLA path: ``use_solve=True`` runs a single-RHS Gauss-Jordan
          solve — ~1.6x faster than the full inverse for FORWARD-ONLY use;
          for training the inverse wins there because the XLA solve's VJP
          must run a second (transposed) elimination (measured ~1.7x
          slower end-to-end with gradients).
        """
        b_c = b_vec.astype(jnp.complex64)
        pallas = self._pallas_inverse()
        if self.is_block_diagonal:
            g = self.num_groups
            nper = self.num_delay_lines_per_group
            f = z.shape[0]
            b_g = b_c.reshape(g, nper)
            if use_solve or pallas:
                m = self.loop_matrix_blocks(z)
                if transpose:
                    m = jnp.swapaxes(m, -1, -2)
                q = self._solve1(
                    m, jnp.broadcast_to(b_g[:, None, :], (g, f, nper))
                )
            else:
                p_blocks = self._inv(
                    self.loop_matrix_blocks(z).reshape(g * f, nper, nper)
                ).reshape(g, f, nper, nper)
                eq = "gfnm,gn->gfm" if transpose else "gfnm,gm->gfn"
                q = jnp.einsum(eq, p_blocks, b_g, precision=_F32)
            return jnp.transpose(q, (1, 0, 2)).reshape(f, self.num_delays)
        if use_solve or pallas:
            m = self.loop_matrix(z)
            if transpose:
                m = jnp.swapaxes(m, -1, -2)
            return self._solve1(m, b_c)
        p = self(z)
        eq = "fnm,n->fm" if transpose else "fnm,m->fn"
        return jnp.einsum(eq, p, b_c, precision=_F32)
