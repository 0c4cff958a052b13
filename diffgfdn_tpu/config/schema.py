"""Pydantic config schema, YAML-compatible with the reference framework.

The field names and nesting mirror the reference's public config surface
(reference: src/diff_gfdn/config/config.py:43-283 and
src/spatial_sampling/config.py:27-79) so existing YAML presets keep working.
Internally the configs are converted to static python values that specialise
jit-compiled programs (static shapes; one compile per band config).

Differences from the reference (deliberate, TPU-first):
* ``device`` is accepted but ignored (JAX picks up the TPU automatically);
* extra fields remain forbidden to catch config typos.
"""

from enum import Enum
from typing import Literal, List, Optional, Tuple

import numpy as np
from pydantic import BaseModel, computed_field, ConfigDict, Field, model_validator


class CouplingMatrixType(Enum):
    """Types of coupling matrix in the GFDN feedback loop.

    Reference: src/diff_gfdn/config/config.py:17-30.
    """

    SCALAR = "scalar_matrix"    # unitary scalar coupling (Givens angles)
    FILTER = "filter_matrix"    # FIR paraunitary polynomial coupling
    RANDOM = "random_matrix"    # unstructured orthogonal feedback matrix

    def __repr__(self) -> str:  # pragma: no cover
        return str(self.value)


class FeatureEncodingType(Enum):
    """Position-feature encodings for the conditioning MLPs."""

    SINE = "sinusoidal"
    MESHGRID = "meshgrid"

    def __repr__(self) -> str:  # pragma: no cover
        return str(self.value)


class BeamformerType(Enum):
    """Beamformer used to convert SH-domain weights to directional gains."""

    BUTTER = "butterworth"
    MAX_DI = "max_directivity"
    MAX_RE = "max_re"


class FeedbackLoopConfig(BaseModel):
    """Feedback-loop (coupled feedback matrix) options."""

    pu_matrix_order: int = 2 ** 5
    coupling_matrix_type: CouplingMatrixType = CouplingMatrixType.SCALAR
    use_zero_coupling: bool = True


class MLPTuningConfig(BaseModel):
    """Hyperparameter sweep ranges for the conditioning MLP."""

    tune_hyperparameters: bool = True
    min_layers: int = 1
    max_layers: int = 20
    min_neurons: int = 2 ** 4
    max_neurons: int = 2 ** 7
    step_size: int = 2 ** 4
    num_trials: int = 50
    # "tpe" (Tree-structured Parzen Estimator, the reference's optuna
    # default), "random", or "optuna" (used when importable)
    sampler: Literal["tpe", "random", "optuna"] = "tpe"
    # epochs per trial training; None = the full trainer budget
    # (the reference trains full runs per trial, solver.py:361-384)
    trial_epochs: Optional[int] = 2


class SubbandProcessingConfig(BaseModel):
    """Config for running one DiffGFDN per octave subband."""

    centre_frequency: float
    frequency_range: Tuple[float, float]
    num_fraction_octaves: int = 3
    use_amp_preserving_filterbank: bool = True


class OutputFilterConfig(BaseModel):
    """Position-conditioned output (or input) gain/filter head."""

    use_svfs: bool = True
    compress_pole_factor: float = 1.0
    mlp_tuning_config: Optional[MLPTuningConfig] = None
    num_hidden_layers: int = 3
    num_neurons_per_layer: int = 2 ** 7
    num_fourier_features: int = 10
    encoding_type: FeatureEncodingType = FeatureEncodingType.SINE
    beamformer_type: Optional[BeamformerType] = None
    use_skip_connections: bool = False


class DecayFilterConfig(BaseModel):
    """Delay-line absorption configuration."""

    use_absorption_filters: bool = True
    learn_common_decay_times: bool = False
    initialise_with_opt_values: bool = True


class TestSetConfig(BaseModel):
    """Held-out test split config."""

    seed: int = 4314
    ratio: float = 0.1


class TrainerConfig(BaseModel):
    """Training hyperparameters (reference: config/config.py:108-182)."""

    batch_size: int = 32
    num_freq_bins: Optional[int] = None
    device: Optional[str] = "tpu"  # accepted for YAML parity; unused by JAX
    train_valid_split: Optional[float] = 0.8
    hold_out_test_set: Optional[TestSetConfig] = None
    grid_resolution_m: Optional[float] = None
    max_epochs: int = 5
    lr: float = 0.01
    io_lr: float = 0.01
    coupling_angle_lr: float = 0.01
    output_filt_ir_len_ms: float = 500
    use_reg_loss: bool = False
    use_erb_edr_loss: bool = False
    use_colorless_loss: bool = False
    use_asym_spectral_loss: bool = False
    edc_loss_weight: float = 1.0
    edr_loss_weight: float = 1.0
    spectral_loss_weight: float = 1.0
    sparsity_loss_weight: float = 1.0
    use_edc_mask: bool = False
    use_frequency_weighting: bool = False
    subband_process_config: Optional[SubbandProcessingConfig] = None
    # single-position fits: shard the rFFT bin axis over all visible
    # devices (parallel/freq_parallel.py). None = auto (on iff >1 device),
    # True = require (warns + falls back on one device), False = off.
    use_freq_parallel: Optional[bool] = None
    train_dir: str = "output/tpu/"
    ir_dir: str = "audio/tpu/"
    save_true_irs: bool = False
    alias_attenuation_db: Optional[int] = None
    reduced_pole_radius: float = Field(default=1.0)

    @model_validator(mode="after")
    def _compute_reduced_pole_radius(self):
        """reduced_pole_radius = 10^(-|attn_db| / nfft / 20).

        Sampling H on |z| = 1/rho > 1 attenuates time-domain aliasing by
        `alias_attenuation_db` at the end of the nfft-long IR
        (reference: config/config.py:172-182).
        """
        if self.alias_attenuation_db is not None:
            if self.num_freq_bins is None:
                raise ValueError(
                    "alias_attenuation_db requires num_freq_bins: the "
                    "reduced pole radius is 10^(-attn/nfft/20) and nothing "
                    "recomputes it once nfft is derived from the dataset — "
                    "the requested attenuation would be silently dropped"
                )
            self.reduced_pole_radius = 10 ** (
                -abs(self.alias_attenuation_db) / self.num_freq_bins / 20
            )
        return self


class ColorlessFDNConfig(BaseModel):
    """Colorless (lossless-prototype) FDN pre-optimisation config."""

    use_colorless_prototype: bool = False
    batch_size: int = 2000
    max_epochs: int = 20
    train_valid_split: float = 0.8
    lr: float = 0.01
    alpha: float = 1.0
    saved_param_path: Optional[str] = None

    @computed_field
    @property
    def load_fixed_parameters(self) -> bool:
        """Whether to load pre-saved A, b, c."""
        return self.saved_param_path is not None


class DiffGFDNConfig(BaseModel):
    """Top-level training config (reference: config/config.py:210-283)."""

    seed: int = 46434
    room_dataset_path: str = "resources/Georg_3room_FDTD/srirs.pkl"
    num_groups: int = 3
    ir_path: Optional[str] = None
    sample_rate: float = 32000.0
    trainer_config: TrainerConfig = TrainerConfig()
    delay_range_ms: List[float] = [20.0, 50.0]
    ambi_order: Optional[int] = None
    num_delay_lines: Optional[int] = 12
    feedback_loop_config: FeedbackLoopConfig = FeedbackLoopConfig()
    decay_filter_config: DecayFilterConfig = DecayFilterConfig()
    output_filter_config: OutputFilterConfig = OutputFilterConfig()
    input_filter_config: Optional[OutputFilterConfig] = OutputFilterConfig()
    colorless_fdn_config: ColorlessFDNConfig = ColorlessFDNConfig()

    @model_validator(mode="after")
    def _set_num_delay_lines(self):
        """Directional FDNs need (ambi_order+1)^2 delay lines per group."""
        if self.ambi_order is not None:
            self.num_delay_lines = ((self.ambi_order + 1) ** 2) * self.num_groups
        return self

    @model_validator(mode="after")
    def _check_grid_resolution(self):
        """Grid-resolution based splits only make sense for directional FDNs."""
        if self.trainer_config.grid_resolution_m is not None:
            if self.ambi_order is None:
                raise AttributeError(
                    "Only use grid resolution for directional reverberation training!"
                )
            self.trainer_config.train_valid_split = None
        return self

    @computed_field
    @property
    def delay_length_samps(self) -> List[int]:
        """Co-prime (prime) delay-line lengths drawn from the delay range.

        Same algorithm as the reference (config/config.py:262-279): a seeded
        permutation of the primes inside [delay_range_ms], topped with the
        next prime above the range. Implemented with a local sieve instead of
        sympy.
        """
        lo = int(self.delay_range_ms[0] * 1e-3 * self.sample_rate)
        hi = int(self.delay_range_ms[1] * 1e-3 * self.sample_rate)
        primes = _primes_in_range(lo, hi)
        rng = np.random.RandomState(self.seed)
        rand_primes = np.asarray(primes, dtype=np.int64)[
            rng.permutation(len(primes))
        ]
        if len(rand_primes) < self.num_delay_lines - 1:
            raise ValueError(
                f"delay_range_ms={list(self.delay_range_ms)} at "
                f"fs={self.sample_rate:g} contains only {len(rand_primes)} "
                f"primes but num_delay_lines={self.num_delay_lines} needs "
                f"{self.num_delay_lines - 1} — widen the range (a silent "
                "truncation would break the per-group channel layout)"
            )
        delays = list(rand_primes[: self.num_delay_lines - 1])
        delays.append(_next_prime(hi))
        return [int(d) for d in delays]

    model_config = ConfigDict(extra="forbid")


# ------------------------- spatial sampling configs -------------------------


class DNNType(Enum):
    """DNN families available for common-slopes amplitude models."""

    CNN = "cnn"
    MLP = "mlp"

    def __repr__(self) -> str:  # pragma: no cover
        return str(self.value)


class CNNConfig(BaseModel):
    num_hidden_channels: int = 2 ** 6
    num_layers: int = 3
    kernel_size: Tuple[int, int] = (3, 3)


class MLPConfig(BaseModel):
    num_neurons_per_layer: int = 2 ** 7
    num_hidden_layers: int = 3


class DNNConfig(BaseModel):
    mlp_config: Optional[MLPConfig] = None
    cnn_config: Optional[CNNConfig] = None
    num_fourier_features: int = 10
    beamformer_type: BeamformerType = BeamformerType.MAX_DI


class SpatialSamplingConfig(BaseModel):
    """Config for the common-slopes spatial-sampling models."""

    room_dataset_path: str = "resources/Georg_3room_FDTD/srirs.pkl"
    batch_size: int = 32
    device: Optional[str] = "tpu"
    seed: int = 241924
    num_grid_spacing: Optional[int] = None
    max_epochs: int = 50
    lr: float = 0.001
    train_dir: str = "output/spatial-sampling/"
    dnn_config: DNNConfig = DNNConfig()
    use_directional_rirs: bool = False

    @computed_field
    @property
    def network_type(self) -> DNNType:
        """Which DNN family is configured."""
        return DNNType.CNN if self.dnn_config.mlp_config is None else DNNType.MLP


# ------------------------------ prime helpers -------------------------------


def _primes_in_range(lo: int, hi: int) -> List[int]:
    """All primes p with lo <= p < hi (simple sieve; ranges are tiny)."""
    if hi <= 2:
        return []
    sieve = np.ones(hi, dtype=bool)
    sieve[:2] = False
    for p in range(2, int(hi ** 0.5) + 1):
        if sieve[p]:
            sieve[p * p :: p] = False
    primes = np.nonzero(sieve)[0]
    return [int(p) for p in primes if p >= lo]


def _next_prime(n: int) -> int:
    """Smallest prime strictly greater than n."""
    cand = n + 1
    while True:
        if cand >= 2 and all(cand % p for p in range(2, int(cand ** 0.5) + 1)):
            return cand
        cand += 1
