"""Differentiable GFDN model family (flax.linen).

H(z) = c(z)^T (D(z) Gamma(z)^-1 - A(z))^-1 b(z) + d(z), evaluated at all
rFFT bins at once. Variants mirror the reference model family
(model.py:24-1126):

* :class:`DiffGFDNVarReceiverPos` — output gains/filters conditioned on the
  listener position via an MLP;
* :class:`DiffGFDNVarSourceReceiverPos` — additionally input gains/filters
  conditioned on the source position;
* :class:`DiffGFDNSinglePos` — direct per-group scalar/SVF parameters for a
  single RIR fit;
* :class:`DiffDirectionalFDNVarReceiverPos` — SH-domain output gains for
  directional (ambisonic) FDNs.

TPU-first deltas from the reference:
* one fused einsum chain per forward — no per-batch/group python loops;
* the per-bin inverse is the real-block batched inverse (kernels/linalg);
* ``sub_fdn_output`` (colorless loss) vmaps the per-group solve, and uses
  the *orthogonalised* per-group mixing matrix ortho(M_g) as each sub-FDN's
  feedback matrix (the reference feeds the raw unconstrained M_g at
  model.py:237 — we keep every sub-FDN lossless-by-construction instead).
"""

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import CouplingMatrixType, FeatureEncodingType

from ..ops.unitary import orthogonal_from_skew
from .feedback_loop import FeedbackLoop
# TPU's default matmul precision is bf16; the response contractions are
# load-bearing for EDC parity, so they pin full f32 (cost is negligible:
# these matmuls are a tiny fraction of the step)
_F32 = jax.lax.Precision.HIGHEST

from .gain_heads import (
    expand_groups_to_delay_lines,
    GainsFromMLP,
    svf_cutoff_frequencies,
    svf_params_to_response,
    SVFFromMLP,
)
from .spatial import DirectionalBeamformerWeightsMLP


def _io_gain_init(num_delay_lines: int):
    """(2*randn - 1)/N initializer used for b and c (reference model.py:100-106).

    NB the reference really does use randn (normal), not rand — the 2x-1
    shift therefore gives a biased N(-1/N, (2/N)^2) init, which looks like
    a uniform->normal slip on their side but is mirrored here for
    training-trajectory parity.
    """

    def init(key):
        return (
            2.0 * jax.random.normal(key, (num_delay_lines, 1)) - 1.0
        ) / num_delay_lines

    return init


class DiffGFDN(nn.Module):
    """Base GFDN: io gains + feedback loop + per-group (colorless) outputs.

    ``feedback_loop_kwargs`` carries the static absorption / coupling
    configuration through to :class:`FeedbackLoop`; io gains are learnable
    unless fixed values from a colorless prototype are provided.
    """

    sample_rate: float
    num_groups: int
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
    fixed_input_gains: Optional[np.ndarray] = None
    fixed_output_gains: Optional[np.ndarray] = None
    use_colorless_loss: bool = False
    # forward-only deployments set this: the feedback drive runs as a
    # single-RHS solve (~1.6x faster) instead of the training-optimal
    # inverse (whose VJP is cheaper)
    inference_solve: bool = False
    # True = fused Pallas inverse; a TPU-PLACEMENT assertion resolved at
    # build time from the actual devices (utils.placement) — see FeedbackLoop
    use_pallas_inverse: Optional[bool] = None

    @property
    def num_delay_lines(self) -> int:
        return len(self.delays)

    @property
    def num_delay_lines_per_group(self) -> int:
        return self.num_delay_lines // self.num_groups

    def setup(self):
        n = self.num_delay_lines
        if self.fixed_input_gains is not None:
            self.input_gains = jnp.asarray(
                self.fixed_input_gains, jnp.float32
            ).reshape(n, 1)
        else:
            self.input_gains = self.param("input_gains", _io_gain_init(n))
        if self.fixed_output_gains is not None:
            self.output_gains = jnp.asarray(
                self.fixed_output_gains, jnp.float32
            ).reshape(n, 1)
        else:
            self.output_gains = self.param("output_gains", _io_gain_init(n))

        self.feedback_loop = FeedbackLoop(
            sample_rate=self.sample_rate,
            num_groups=self.num_groups,
            num_delay_lines_per_group=self.num_delay_lines_per_group,
            delays=self.delays,
            coupling_matrix_type=self.coupling_matrix_type,
            use_zero_coupling=self.use_zero_coupling,
            coupling_matrix_order=self.coupling_matrix_order,
            learn_common_decay_times=self.learn_common_decay_times,
            gains=self.gains,
            sos_coeffs=self.sos_coeffs,
            iir_coeffs=self.iir_coeffs,
            common_decay_times_init=self.common_decay_times_init,
            colorless_feedback_matrix_skew=self.colorless_feedback_matrix_skew,
            use_pallas_inverse=self.use_pallas_inverse,
        )
        self._setup_heads()

    def _setup_heads(self):
        """Subclass hook for position-conditioned heads."""

    # --------------------------- colorless sub-FDNs --------------------------

    def sub_fdn_output(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Lossless response of each sub-FDN (no absorption).

        Returns (Hout (F, G), Hout_per_del (G, Nper, F)) — the per-group FDN
        output and the per-delay-line contributions weighted by c
        (reference: model.py:209-252).
        """
        g = self.num_groups
        nper = self.num_delay_lines_per_group
        delays = jnp.asarray(self.delays, jnp.float32).reshape(g, nper)
        o = orthogonal_from_skew(self.feedback_loop.M)  # (G, Nper, Nper)

        # (G, F, Nper, Nper): diag(z^m) - A_g
        d = z[None, :, None] ** delays[:, None, :]
        eye = jnp.eye(nper, dtype=jnp.complex64)
        m = d[..., None] * eye[None, None] - o.astype(jnp.complex64)[:, None]
        f = z.shape[0]
        p = self.feedback_loop._inv(m.reshape(g * f, nper, nper)).reshape(
            g, f, nper, nper
        )

        c = self.output_gains.reshape(g, nper).astype(jnp.complex64)
        b = self.input_gains.reshape(g, nper).astype(jnp.complex64)
        # per-line: c_n * (P b)_n ... transposed contraction as in reference:
        # H_tmp[n, f] = c_n * sum_m P[f, n, m] b_m
        pb = jnp.einsum("gfnm,gm->gnf", p, b, precision=_F32)
        h_per_del = c[:, :, None] * pb  # (G, Nper, F)
        hout = jnp.sum(h_per_del, axis=1).T  # (F, G)
        return hout, h_per_del

    # ------------------------------ core forward -----------------------------

    def transfer_function(
        self,
        z: jnp.ndarray,
        c: jnp.ndarray,
        b: jnp.ndarray,
        direct: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """H[b, f] = sum_{n,m} C[b,n,f] P[f,n,m] B[b,m,f] (+ direct).

        ``c``/``b``: (batch, N, F) complex; returns (batch, F) complex.
        """
        p = self.feedback_loop(z)  # (F, N, N)
        t = jnp.einsum("bnf,fnm->bmf", c, p, precision=_F32)
        h = jnp.einsum("bmf,bmf->bf", t, b, precision=_F32)
        if direct is not None:
            h = h + direct
        return h

    def transfer_function_group_heads(
        self,
        z: jnp.ndarray,
        c_group: jnp.ndarray,
        b_group: Optional[jnp.ndarray] = None,
        direct: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """H for per-GROUP filter heads via a group-pooled loop response.

        Per-group heads modulate every delay line of a group identically
        (reference repeat-interleaves them, gain_filters.py:436-555), so P
        contracts with the per-line io gains ONCE into
        ``s[f,g,h] = sum_{n in g, m in h} c_gain[n] P[f,n,m] b_gain[m]``
        and the (B, N, F) complex broadcasts of :meth:`transfer_function`
        never materialize — (G/N)^2 = 16x less einsum work at N=12, G=3.

        ``c_group``: (B, G, F) complex; ``b_group``: (B, G, F), or None
        when the input side is frequency-independent (only ``input_gains``).
        """
        g = self.num_groups
        nper = self.num_delay_lines_per_group
        f = z.shape[0]
        cw = self.output_gains[:, 0].astype(jnp.complex64)
        bw = self.input_gains[:, 0].astype(jnp.complex64)
        if self.feedback_loop.is_block_diagonal:
            # zero coupling: P is block-diagonal, so s is DIAGONAL —
            # pool each group's Nper x Nper block directly and never
            # materialize the (F, N, N) plane or the (F, G, G) cross
            # terms (~150 MB of structurally-zero HBM traffic per step
            # at flagship scale)
            pb = self.feedback_loop.block_responses(z)  # (G, F, n, n)
            s_diag = jnp.einsum(
                "gfnm,gn,gm->fg",
                pb,
                cw.reshape(g, nper),
                bw.reshape(g, nper),
                precision=_F32,
            )  # (F, G)
            if b_group is None:
                h = jnp.einsum("bgf,fg->bf", c_group, s_diag, precision=_F32)
            else:
                h = jnp.einsum(
                    "bgf,fg,bgf->bf", c_group, s_diag, b_group,
                    precision=_F32,
                )
            if direct is not None:
                h = h + direct
            return h
        p = self.feedback_loop(z)  # (F, N, N)
        w = cw[None, :, None] * p * bw[None, None, :]
        s = w.reshape(f, g, nper, g, nper).sum(axis=(2, 4))  # (F, G, G)
        if b_group is None:
            h = jnp.einsum("bgf,fg->bf", c_group, s.sum(axis=-1), precision=_F32)
        else:
            h = jnp.einsum("bgf,fgh,bhf->bf", c_group, s, b_group, precision=_F32)
        if direct is not None:
            h = h + direct
        return h

    def transfer_function_scalar_heads(
        self,
        z: jnp.ndarray,
        c_scalars: jnp.ndarray,
        b_scalars: jnp.ndarray,
        direct: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Fast path for frequency-INDEPENDENT heads.

        H[b, f] = c~[b, :] . (P(f) b~) where c~ = per-line output scalars,
        b~ = per-line input scalars — one single-RHS contraction q = P b~
        (F, N) followed by one (B, N) x (N, F) matmul. Avoids materializing
        the (batch, N, F) complex broadcasts of the general path
        (~200 MB of HBM traffic per step at flagship scale).

        ``c_scalars``: (batch, N) real/complex; ``b_scalars``: (N,).
        """
        q = self.feedback_loop.drive(
            z, b_scalars, use_solve=self.inference_solve
        ).T  # (N, F)
        h = jnp.matmul(c_scalars.astype(jnp.complex64), q, precision=_F32)  # (B, F)
        if direct is not None:
            h = h + direct
        return h


class DiffGFDNVarReceiverPos(DiffGFDN):
    """Output gains/filters conditioned on listener position.

    Reference: model.py:502-661.
    """

    use_svf_in_output: bool = True
    num_fourier_features: int = 10
    num_hidden_layers: int = 3
    num_neurons: int = 128
    encoding_type: FeatureEncodingType = FeatureEncodingType.SINE
    compress_pole_factor: float = 1.0

    def _setup_heads(self):
        if self.use_svf_in_output:
            self.output_filters = SVFFromMLP(
                sample_rate=self.sample_rate,
                num_groups=self.num_groups,
                num_fourier_features=self.num_fourier_features,
                num_hidden_layers=self.num_hidden_layers,
                num_neurons=self.num_neurons,
                encoding_type=self.encoding_type,
                compress_pole_factor=self.compress_pole_factor,
                use_pallas=bool(self.use_pallas_inverse),
            )
        else:
            self.output_scalars = GainsFromMLP(
                num_groups=self.num_groups,
                num_fourier_features=self.num_fourier_features,
                num_hidden_layers=self.num_hidden_layers,
                num_neurons=self.num_neurons,
                encoding_type=self.encoding_type,
            )

    def __call__(
        self, x: Dict, output_scalars: Optional[jnp.ndarray] = None
    ):
        z = x["z_values"]
        batch = x["listener_position"].shape[0]
        nper = self.num_delay_lines_per_group
        f = z.shape[0]

        direct = x.get("target_early_response")
        if self.use_svf_in_output:
            group_resp = self.output_filters(x)  # (B, G, F) complex
            h = self.transfer_function_group_heads(z, group_resp, None, direct)
        else:
            # scalar heads: frequency-independent gains -> fast path
            if output_scalars is None:
                g = self.output_scalars(x)  # (B, G)
            else:
                g = output_scalars  # externally provided CS amplitudes
            c_scalars = (
                expand_groups_to_delay_lines(g, nper) * self.output_gains[:, 0]
            )
            h = self.transfer_function_scalar_heads(
                z, c_scalars, self.input_gains[:, 0], direct
            )
        if self.use_colorless_loss:
            return h, self.sub_fdn_output(z)
        return h

    def head_outputs(self, x: Dict) -> Dict:
        """Inference-time head outputs (gains or SVF params) per position."""
        if self.use_svf_in_output:
            _, params = self.output_filters(x, return_params=True)
            return params
        return {"gains": self.output_scalars(x)}

    def output_filter_params(self, x: Dict) -> Dict:
        """SVF/biquad parameters of the output head (for the reg loss)."""
        _, params = self.output_filters(x, return_params=True)
        return params


class DiffGFDNVarSourceReceiverPos(DiffGFDN):
    """Output AND input heads conditioned on listener / source position.

    Reference: model.py:305-496.
    """

    use_svf_in_output: bool = True
    use_svf_in_input: bool = True
    num_fourier_features: int = 10
    num_hidden_layers: int = 3
    num_neurons: int = 128
    encoding_type: FeatureEncodingType = FeatureEncodingType.SINE
    compress_pole_factor: float = 1.0
    input_num_fourier_features: int = 10
    input_num_hidden_layers: int = 3
    input_num_neurons: int = 128

    def _setup_heads(self):
        if self.use_svf_in_output:
            self.output_filters = SVFFromMLP(
                sample_rate=self.sample_rate,
                num_groups=self.num_groups,
                num_fourier_features=self.num_fourier_features,
                num_hidden_layers=self.num_hidden_layers,
                num_neurons=self.num_neurons,
                encoding_type=self.encoding_type,
                compress_pole_factor=self.compress_pole_factor,
                position_key="listener_position",
            )
        else:
            self.output_scalars = GainsFromMLP(
                num_groups=self.num_groups,
                num_fourier_features=self.num_fourier_features,
                num_hidden_layers=self.num_hidden_layers,
                num_neurons=self.num_neurons,
                encoding_type=self.encoding_type,
                position_key="norm_listener_position",
            )
        if self.use_svf_in_input:
            self.input_filters = SVFFromMLP(
                sample_rate=self.sample_rate,
                num_groups=self.num_groups,
                num_fourier_features=self.input_num_fourier_features,
                num_hidden_layers=self.input_num_hidden_layers,
                num_neurons=self.input_num_neurons,
                encoding_type=self.encoding_type,
                compress_pole_factor=self.compress_pole_factor,
                position_key="source_position",
            )
        else:
            self.input_scalars = GainsFromMLP(
                num_groups=self.num_groups,
                num_fourier_features=self.input_num_fourier_features,
                num_hidden_layers=self.input_num_hidden_layers,
                num_neurons=self.input_num_neurons,
                encoding_type=self.encoding_type,
                position_key="source_position",
            )

    def __call__(self, x: Dict):
        z = x["z_values"]
        batch = x["listener_position"].shape[0]
        nper = self.num_delay_lines_per_group
        f = z.shape[0]
        n = self.num_delay_lines
        direct = x.get("target_early_response")

        if not self.use_svf_in_output and not self.use_svf_in_input:
            # both heads frequency-independent: H[b] = vec(c~ b~^T) . vec(P)
            # — one (B, N^2) x (N^2, F) matmul, no (B, N, F) broadcasts
            c_s = (
                expand_groups_to_delay_lines(self.output_scalars(x), nper)
                * self.output_gains[:, 0]
            )
            b_s = (
                expand_groups_to_delay_lines(self.input_scalars(x), nper)
                * self.input_gains[:, 0]
            )
            if self.feedback_loop.is_block_diagonal:
                # zero coupling: contract only the G diagonal blocks —
                # (B, G*Nper^2) x (G*Nper^2, F), G x fewer terms, and the
                # (F, N, N) plane (mostly structural zeros) never exists
                g = self.num_groups
                pb = self.feedback_loop.block_responses(z)  # (G, F, n, n)
                c_gp = c_s.reshape(batch, g, nper)
                b_gp = b_s.reshape(batch, g, nper)
                w = jnp.einsum("bgn,bgm->bgnm", c_gp, b_gp).reshape(
                    batch, g * nper * nper
                )
                pf = jnp.transpose(pb, (1, 0, 2, 3)).reshape(
                    f, g * nper * nper
                )
                h = jnp.matmul(
                    w.astype(jnp.complex64), pf.T, precision=_F32
                )
            else:
                p = self.feedback_loop(z)  # (F, N, N)
                w = jnp.einsum("bn,bm->bnm", c_s, b_s).reshape(batch, n * n)
                h = jnp.matmul(
                    w.astype(jnp.complex64), p.reshape(f, n * n).T,
                    precision=_F32,
                )
            if direct is not None:
                h = h + direct
        else:
            # per-group heads either side -> group-pooled transfer function
            if self.use_svf_in_output:
                c_g = self.output_filters(x)  # (B, G, F)
            else:
                c_g = jnp.broadcast_to(
                    self.output_scalars(x).astype(jnp.complex64)[..., None],
                    (batch, self.num_groups, f),
                )
            if self.use_svf_in_input:
                b_g = self.input_filters(x)
            else:
                b_g = jnp.broadcast_to(
                    self.input_scalars(x).astype(jnp.complex64)[..., None],
                    (batch, self.num_groups, f),
                )
            h = self.transfer_function_group_heads(z, c_g, b_g, direct)

        if self.use_colorless_loss:
            return h, self.sub_fdn_output(z)
        return h


class DiffGFDNSinglePos(DiffGFDN):
    """Single source/receiver fit with direct per-group parameters.

    Scalars or SVF cascades are plain parameters (no MLP); reference:
    model.py:667-969. Forward returns H of shape (F,).
    """

    use_svf_in_output: bool = False
    use_svf_in_input: bool = False
    compress_pole_factor: float = 1.0

    def _setup_heads(self):
        g = self.num_groups
        cutoffs = svf_cutoff_frequencies(self.sample_rate)
        self._svf_cutoffs = cutoffs
        k = len(cutoffs)
        if self.use_svf_in_output:
            self.output_svf_params = self.param(
                "output_svf_params", _svf_param_init, (g, k, 2)
            )
        else:
            self.output_scalars = self.param(
                "output_scalars", lambda key: jnp.ones((g, 1)) / np.sqrt(g)
            )
        if self.use_svf_in_input:
            self.input_svf_params = self.param(
                "input_svf_params", _svf_param_init, (g, k, 2)
            )
        else:
            self.input_scalars = self.param(
                "input_scalars", lambda key: jnp.ones((g, 1)) / np.sqrt(g)
            )

    def _group_response(self, z: jnp.ndarray, which: str) -> jnp.ndarray:
        """(G, F) complex gain/filter response for input or output head."""
        if which == "output" and self.use_svf_in_output:
            resp, _, _ = svf_params_to_response(
                self.output_svf_params, self._svf_cutoffs, z,
                self.compress_pole_factor,
            )  # (G, F)
            return resp
        if which == "input" and self.use_svf_in_input:
            resp, _, _ = svf_params_to_response(
                self.input_svf_params, self._svf_cutoffs, z,
                self.compress_pole_factor,
            )
            return resp
        scalars = self.output_scalars if which == "output" else self.input_scalars
        return jnp.broadcast_to(
            scalars[:, :1].astype(jnp.complex64),
            (self.num_groups, z.shape[0]),
        )

    def output_filter_params(self, x: Dict) -> Dict:
        """Output-head biquad coefficients (for the aliasing reg loss)."""
        from .gain_heads import svf_params_to_biquads

        num, den = svf_params_to_biquads(
            self.output_svf_params, self._svf_cutoffs, self.compress_pole_factor
        )
        return {"biquad_num": num[None], "biquad_den": den[None]}

    def __call__(self, x: Dict):
        z = x["z_values"]
        direct = x.get("target_early_response")
        # heads are per GROUP (SVF cascades or scalars), so the group-
        # pooled path applies — and with zero coupling it contracts the
        # per-group blocks directly (no (F, N, N) plane, no (B, N, F)
        # broadcasts); io gain columns are folded in by the pooled path
        c_g = self._group_response(z, "output")[None]  # (1, G, F)
        b_g = self._group_response(z, "input")[None]
        h = self.transfer_function_group_heads(
            z, c_g, b_g, None if direct is None else direct[None]
        )[0]
        if self.use_colorless_loss:
            return h, self.sub_fdn_output(z)
        return h


def _svf_param_init(key, shape):
    """Random resonance channel, 0 dB gain channel (reference model.py:730-737)."""
    init = jax.random.normal(key, shape)
    return init.at[..., 1].set(0.0)


class DiffDirectionalFDNVarReceiverPos(DiffGFDN):
    """Directional (ambisonic) FDN with SH-domain output gains from an MLP.

    num_delay_lines_per_group == (ambi_order+1)^2; forward returns
    (B, num_ambi_channels, F). Reference: model.py:975-1126.
    """

    ambi_order: int = 2
    num_fourier_features: int = 10
    num_hidden_layers: int = 3
    num_neurons: int = 128
    use_skip_connections: bool = False
    analysis_matrix: Optional[np.ndarray] = None  # (num_dirs, (N+1)^2)

    def _setup_heads(self):
        assert self.num_delay_lines_per_group == (self.ambi_order + 1) ** 2, (
            "delay lines per group must equal the number of ambisonic channels"
        )
        self.sh_output_scalars = DirectionalBeamformerWeightsMLP(
            num_groups=self.num_groups,
            ambi_order=self.ambi_order,
            num_fourier_features=self.num_fourier_features,
            num_hidden_layers=self.num_hidden_layers,
            num_neurons=self.num_neurons,
            use_skip_connections=self.use_skip_connections,
        )

    def __call__(self, x: Dict):
        z = x["z_values"]
        batch = x["listener_position"].shape[0]
        g = self.num_groups
        nper = self.num_delay_lines_per_group
        f = z.shape[0]
        n = self.num_delay_lines

        # (B, G, n_ambi) normalized SH gains — frequency-independent, so the
        # shared input drive q = P b is computed once and the per-position
        # mix is a single contraction (no (B, N, F) broadcasts)
        sh_gains = self.sh_output_scalars(x, normalise=True)
        weights = sh_gains * self.output_gains.reshape(g, nper)[None]

        # contraction over the FIRST matrix index (the reference reads the
        # directional taps as P^T b, model.py:1083) — a transposed solve
        q = self.feedback_loop.drive(
            z, self.input_gains[:, 0], transpose=True,
            use_solve=self.inference_solve,
        ).T.reshape(g, nper, f)
        h = jnp.einsum(
            "bga,gaf->baf", weights.astype(jnp.complex64), q, precision=_F32
        )
        if self.use_colorless_loss:
            return h, self.sub_fdn_output(z)
        return h

    def directional_response(self, h_sh: jnp.ndarray) -> jnp.ndarray:
        """SH-domain response -> directional response via the analysis matrix.

        Reference: trainer.py:853-865.
        """
        a = np.asarray(self.analysis_matrix, np.float32)
        return jnp.einsum("jl,blk->bjk", a, h_sh, precision=_F32)
