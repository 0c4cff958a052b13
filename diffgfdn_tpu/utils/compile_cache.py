"""Persistent XLA compilation cache (production deployment default).

Every CLI entry point enables JAX's persistent compilation cache so
repeated runs never re-pay XLA compile time: at the production scale
(nfft = 131 072) the flagship training program costs ~40 s to compile
and ~0.4 s to replay from cache, and the effect holds on the remote
axon TPU backend in this environment (verified cross-process).

Cache keys include the HLO module and compiler version, so edited
programs recompile and unchanged programs replay — the cache can serve
stale results only for bit-identical programs, which is the point.

Env overrides:
  DIFFGFDN_JAX_CACHE_DIR=<dir>  cache location
  DIFFGFDN_JAX_CACHE_DIR=""     disable entirely
"""

import os
from pathlib import Path

_DEFAULT_DIR = Path(
    os.environ.get("XDG_CACHE_HOME", str(Path.home() / ".cache"))
) / "diffgfdn_tpu" / "jax"


def enable_persistent_cache(cache_dir=None) -> str:
    """Point JAX at a persistent compile cache; returns the directory.

    Safe to call repeatedly; an empty DIFFGFDN_JAX_CACHE_DIR (or empty
    ``cache_dir``) disables the cache and returns "".
    """
    if cache_dir is None:
        cache_dir = os.environ.get("DIFFGFDN_JAX_CACHE_DIR", str(_DEFAULT_DIR))
    if not cache_dir:
        return ""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return str(cache_dir)
