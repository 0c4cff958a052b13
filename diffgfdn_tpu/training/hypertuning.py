"""MLP hyperparameter search (dependency-free random search).

Reference behaviour: src/diff_gfdn/hypertuning.py:15-111 uses optuna to
suggest (num_hidden_layers, num_neurons) for the conditioning MLP, trains
the full model per trial and minimizes the summed validation loss. optuna
isn't available in this environment; we use seeded random search over the
same ranges (the search space is tiny — layers x neuron-widths — so random
search with ~tens of trials covers it well).
"""

import logging
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import numpy as np

from ..config.schema import DiffGFDNConfig, MLPTuningConfig

logger = logging.getLogger("diffgfdn_tpu")


@dataclass
class TrialResult:
    num_hidden_layers: int
    num_neurons_per_layer: int
    objective: float


def sample_trial(rng: np.random.RandomState, tcfg: MLPTuningConfig) -> Tuple[int, int]:
    """One (layers, neurons) draw from the configured ranges."""
    layers = int(rng.randint(tcfg.min_layers, tcfg.max_layers + 1))
    steps = np.arange(tcfg.min_neurons, tcfg.max_neurons + 1, tcfg.step_size)
    neurons = int(steps[rng.randint(len(steps))])
    return layers, neurons


def mlp_hyperparameter_tuning(
    config: DiffGFDNConfig,
    train_fn: Callable[[DiffGFDNConfig], float],
    num_trials: Optional[int] = None,
    seed: int = 0,
) -> Tuple[DiffGFDNConfig, List[TrialResult]]:
    """Random-search the output-MLP architecture.

    ``train_fn(config) -> objective`` trains with the candidate config and
    returns the validation objective (lower = better). Returns the best
    config and the trial history.
    """
    tcfg = config.output_filter_config.mlp_tuning_config or MLPTuningConfig()
    num_trials = num_trials or tcfg.num_trials
    rng = np.random.RandomState(seed)
    seen = set()
    results: List[TrialResult] = []
    best: Optional[TrialResult] = None

    for trial in range(num_trials):
        layers, neurons = sample_trial(rng, tcfg)
        if (layers, neurons) in seen:
            continue
        seen.add((layers, neurons))
        cand = config.model_copy(deep=True)
        cand.output_filter_config.num_hidden_layers = layers
        cand.output_filter_config.num_neurons_per_layer = neurons
        objective = float(train_fn(cand))
        res = TrialResult(layers, neurons, objective)
        results.append(res)
        logger.info(
            "trial %d: layers=%d neurons=%d objective=%.4f",
            trial, layers, neurons, objective,
        )
        if best is None or objective < best.objective:
            best = res

    best_config = config.model_copy(deep=True)
    best_config.output_filter_config.num_hidden_layers = best.num_hidden_layers
    best_config.output_filter_config.num_neurons_per_layer = (
        best.num_neurons_per_layer
    )
    return best_config, results
