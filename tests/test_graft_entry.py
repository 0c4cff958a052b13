"""Driver-contract coverage for __graft_entry__.py.

The driver (a) compile-checks ``entry()`` single-chip and (b) runs
``dryrun_multichip(N)`` on N virtual CPU devices to validate the multi-chip
sharding without real chips. Round 1's dryrun died because eager ops
dispatched to a broken default TPU platform — these tests pin the contract
on the virtual 8-device CPU mesh the conftest sets up.
"""

import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_dryrun_multichip_8_cpu_mesh():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_rejects_too_few_devices():
    from __graft_entry__ import dryrun_multichip

    with pytest.raises(RuntimeError, match="need 1000 devices"):
        dryrun_multichip(1000)


def test_dryrun_is_hermetic_wrt_default_device():
    """No eager op inside dryrun_multichip may touch the PROCESS-default device.

    Reproduces the round-1 driver failure shape: there the process default
    was a broken TPU platform and any eager dispatch to it crashed. Here we
    poison the default to a CPU device OUTSIDE the mesh (cpu[7], while the
    dryrun meshes cpu[0..3]) and spy on eager dispatch — any op landing on
    the poisoned default means the ``jax.default_device`` wrap regressed.
    """
    from jax._src import core

    from __graft_entry__ import dryrun_multichip

    poisoned = jax.devices("cpu")[7]
    seen_devices = set()
    orig_process = core.EvalTrace.process_primitive

    def spy(self, prim, args, params):
        out = orig_process(self, prim, args, params)
        outs = out if isinstance(out, (tuple, list)) else (out,)
        for o in outs:
            if hasattr(o, "devices"):
                try:
                    seen_devices.update(o.devices())
                except Exception:
                    pass
        return out

    prev_default = jax.config.jax_default_device
    jax.config.update("jax_default_device", poisoned)
    core.EvalTrace.process_primitive = spy
    try:
        dryrun_multichip(4)
    finally:
        core.EvalTrace.process_primitive = orig_process
        jax.config.update("jax_default_device", prev_default)

    assert seen_devices, "spy saw no eager dispatch — instrumentation broke"
    assert poisoned not in seen_devices, (
        f"eager ops leaked to the process-default device: {seen_devices}"
    )


@pytest.mark.slow
def test_entry_forward_compiles():
    from __graft_entry__ import entry

    fn, (params, batch) = entry()
    out = jax.jit(fn)(params, batch)
    assert np.isfinite(np.asarray(out)).all()
