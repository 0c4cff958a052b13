"""Analytical run-time cost models (FLOPs / memory per output sample).

The reference publishes these closed-form models as its only quantitative
performance anchors (notebooks/compare_flops.ipynb; BASELINE.md table).
They compare a frequency-dependent GFDN against parallel subband GFDNs and
a directional GFDN against partitioned convolution at rendering time.

Conventions follow the reference notebook: ``n`` delay lines, ``b`` octave
bands (a frequency-dependent absorption GEQ costs ~27 FLOPs per band per
line per sample), MLP inference over ``f`` output features.
"""

import numpy as np

from ..ops.basic import ms_to_samps


def gfdn_flops(n, b: int, is_parallel: bool = False):
    """FLOPs/sample of one frequency-dependent GFDN (or B parallel
    broadband subband GFDNs when ``is_parallel``)."""
    n = np.asarray(n)
    if is_parallel:
        return b * (2 * n ** 2 + 4 * n + 1)
    return 2 * n ** 2 + n + 27 * n * b + 1


def mlp_flops(num_layers, num_neurons, f: int):
    """FLOPs of one MLP inference with ``f`` output features."""
    num_neurons = np.asarray(num_neurons)
    return num_layers * (2 * num_neurons ** 2 + num_neurons) + f * (
        2 * num_neurons + 1
    )


def mlp_mems(num_layers, num_neurons, f: int):
    """Parameter-memory footprint of the MLP (reference notebook)."""
    num_neurons = np.asarray(num_neurons)
    return num_layers * (num_neurons ** 2 + num_neurons) + f * (num_neurons + 1)


def gfdn_mems(fs: float, num_delay_lines: int, avg_delay_ms: float,
              num_groups: int):
    """State-memory footprint of a grouped FDN (delay lines + matrices)."""
    matrix_elems = (num_delay_lines // num_groups) ** 2
    num_modes = ms_to_samps(avg_delay_ms, fs) * num_delay_lines
    return num_modes + matrix_elems + 2 * num_delay_lines + 3 * num_groups


def conv_flops(num_channels: int, rir_len_ms: float, fs: float, nfft: int):
    """FLOPs/sample of partitioned (overlap-add) convolution rendering."""
    rir_len_samps = ms_to_samps(rir_len_ms, fs)
    fft_flops = num_channels * 20 * np.log2(nfft) + 5 * np.log2(nfft)
    ola_flops = num_channels * (8 * np.ceil(rir_len_samps / (0.5 * nfft)) - 3)
    return fft_flops + ola_flops


def dir_gfdn_flops(n_sh: int, g: int, b: int, j: int):
    """FLOPs/sample of the directional GFDN (SH order ``n_sh``, ``g``
    groups, ``b`` bands, ``j`` beamforming directions)."""
    num_chans = n_sh + 1
    core = 2 * b * (num_chans * g) ** 2 + 4 * num_chans * g * b
    sph_fb = j * (2 * num_chans ** 2 - 1)
    return core + sph_fb + b * j
