"""ctypes bindings for the native streaming GFDN renderer.

Compiles ``tdfdn.cpp`` on first use (g++ -O3, cached next to the source)
and exposes a stateful :class:`NativeGFDNRenderer` for host-side real-time
rendering without any JAX/device dependency. Sample-exact against the JAX
block-feedforward core (tested in tests/test_native.py).
"""

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("diffgfdn_tpu")

_SRC = Path(__file__).with_name("tdfdn.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_library() -> Path:
    """g++ the shared library into a user cache dir (idempotent)."""
    cache = Path(
        os.environ.get("DIFFGFDN_NATIVE_CACHE", Path.home() / ".cache" / "diffgfdn_tpu")
    )
    cache.mkdir(parents=True, exist_ok=True)
    lib_path = cache / "libtdfdn.so"
    if lib_path.exists() and lib_path.stat().st_mtime >= _SRC.stat().st_mtime:
        return lib_path
    # compile to a process-unique temp name and os.replace into place:
    # another process dlopening a half-written .so loads garbage (the
    # in-process _LOCK cannot guard concurrent pytest workers / jobs)
    tmp_path = cache / f"libtdfdn.{os.getpid()}.so.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(tmp_path),
    ]
    logger.info("building native renderer: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp_path, lib_path)  # atomic on POSIX
    finally:
        tmp_path.unlink(missing_ok=True)
    return lib_path


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build_library()))
            lib.tdfdn_create.restype = ctypes.c_void_p
            lib.tdfdn_create.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ]
            lib.tdfdn_destroy.argtypes = [ctypes.c_void_p]
            lib.tdfdn_reset.argtypes = [ctypes.c_void_p]
            lib.tdfdn_set_absorption_sos.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int,
            ]
            lib.tdfdn_process.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_long,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int,
                ctypes.c_float,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
    return _LIB


def native_available() -> bool:
    """True if the native renderer can be built/loaded on this host."""
    try:
        _load()
        return True
    except Exception as exc:  # noqa: BLE001
        logger.warning("native renderer unavailable: %s", exc)
        return False


class NativeGFDNRenderer:
    """Stateful streaming GFDN: feed blocks, receive rendered audio.

    Args mirror the time-domain core (kernels/tdgfdn.py): ``delays`` in
    samples, ``gains`` whole-delay absorption gains, ``feedback_matrix``
    (N, N), ``input_gains`` (N,). ``sos_coeffs`` (N, S, 3, 2) installs
    per-line SOS absorption cascades instead of the scalar gains (the GEQ
    fits from ops/absorption.py) — frequency-dependent decay in the
    streaming path, sample-exact vs the TPU core's block state-space
    filtering.
    """

    def __init__(
        self, delays, gains, feedback_matrix, input_gains, sos_coeffs=None
    ):
        lib = _load()
        self._lib = lib
        self.n = len(delays)
        self._delays = np.ascontiguousarray(delays, np.int32)
        if gains is None:
            gains = np.ones(self.n, np.float32)
        self._gains = np.ascontiguousarray(gains, np.float32)
        self._a = np.ascontiguousarray(feedback_matrix, np.float32).reshape(
            self.n, self.n
        )
        self._b = np.ascontiguousarray(input_gains, np.float32)
        self._handle = lib.tdfdn_create(
            self.n, self._delays, self._gains, self._a, self._b
        )
        self._sos = None
        if sos_coeffs is not None:
            self.set_absorption_sos(sos_coeffs)

    def set_absorption_sos(self, sos_coeffs: np.ndarray) -> None:
        """Install (N, S, 3, 2) absorption cascades (num/den on last axis)."""
        sos = np.asarray(sos_coeffs, np.float64)
        n, s = sos.shape[:2]
        assert n == self.n, (n, self.n)
        # (N, S, 6): b0 b1 b2 a0 a1 a2
        packed = np.concatenate([sos[..., 0], sos[..., 1]], axis=-1)
        self._sos = np.ascontiguousarray(packed, np.float32)
        self._lib.tdfdn_set_absorption_sos(self._handle, self._sos, int(s))

    def process(
        self,
        signal: np.ndarray,
        output_gains: np.ndarray,
        direct_gain: float = 0.0,
    ) -> np.ndarray:
        """Render a block: (T,) input -> (n_outs, T) outputs (stateful)."""
        sig = np.ascontiguousarray(signal, np.float32)
        c = np.ascontiguousarray(np.atleast_2d(output_gains), np.float32)
        n_outs = c.shape[0]
        out = np.empty((n_outs, sig.shape[0]), np.float32)
        self._lib.tdfdn_process(
            self._handle, sig, sig.shape[0], c, n_outs,
            np.float32(direct_gain), out,
        )
        return out

    def reset(self):
        self._lib.tdfdn_reset(self._handle)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.tdfdn_destroy(self._handle)
        except Exception:  # noqa: BLE001
            pass
