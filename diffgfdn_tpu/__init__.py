"""diffgfdn_tpu — TPU-native differentiable Grouped Feedback Delay Networks.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of orchidas/DiffGFDN
(differentiable GFDNs for 6DoF late-reverberation rendering in coupled rooms),
re-designed TPU-first:

* frequency-sampled FDN transfer functions evaluated as batched complex
  linear solves, fully vectorized over rFFT bins (no Python loops),
* flax.linen models with pure-functional train steps under ``jax.jit``,
* ``jax.sharding.Mesh`` based parallelism — data-parallel over receiver
  positions and "expert"-parallel over octave bands,
* host-side (numpy/scipy) init-time filter fitting (GEQ least squares,
  Prony), kept outside the compiled graph.

Reference behaviour studied from /root/reference (orchidas/DiffGFDN); see
SURVEY.md for the layer map. This is an independent implementation.
"""

__version__ = "0.1.0"
