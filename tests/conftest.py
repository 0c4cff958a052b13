"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the remote `axon` TPU backend in
every python process and sets jax.config.jax_platforms = "axon,cpu", which
both overrides the JAX_PLATFORMS env var and can stall for minutes while the
TPU tunnel is claimed. Tests must run hermetically on CPU, so we override
the *config* (not just the env) before any backend is initialized.

Multi-chip sharding is validated on ``xla_force_host_platform_device_count=8``
CPU devices; the real-TPU path is exercised by bench.py / the driver.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# must beat xla_bridge backend initialization; the sitecustomize already set
# jax_platforms to "axon,cpu" at interpreter start.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
