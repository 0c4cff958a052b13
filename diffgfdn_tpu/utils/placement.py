"""Device-placement resolution for backend-specific kernels.

The fused Pallas kernels compile only for TPU. Whether to use them is a
question about WHERE a computation is PLACED — which only the caller can
know. ``jax.default_backend()`` answers a different question ("what is the
process-default platform") and lies whenever computation is placed
elsewhere, e.g. a CPU-device mesh inside a TPU-registered process (exactly
what the multi-chip dryrun does). The rule, enforced across this package:

* kernel-dispatch code (anything that runs at trace time) NEVER consults
  ``jax.default_backend()``;
* placement is resolved ONCE, host-side, at model-build time, from the
  devices the caller intends to run on — this module;
* ``devices=None`` means "the caller will not place work explicitly", in
  which case the process-default device IS the placement, and consulting
  it here (host-side, build-time) is truthful.
"""

from typing import Optional, Sequence


def placement_is_tpu(devices: Optional[Sequence] = None) -> bool:
    """True iff the computation's placement is (entirely) on TPU devices.

    ``devices``: the devices/mesh the model will run on. ``None`` = default
    placement (only correct when the caller does not place work elsewhere —
    e.g. CLI/solver runs with no explicit mesh).
    """
    import jax

    if devices is None:
        try:
            devices = [jax.local_devices()[0]]
        except RuntimeError:
            # no usable default platform at all: no TPU to speak of
            return False
    devices = list(devices)
    return bool(devices) and all(d.platform == "tpu" for d in devices)
