"""Kernel selection must follow PLACEMENT, never jax.default_backend().

Round-1 regression class: a model constructed without ``use_pallas_inverse``
inside a TPU-registered process, but whose computation is placed on CPU mesh
devices, selected compiled TPU Pallas kernels. The contract now: the module
default is the portable XLA path; Pallas is an explicit opt-in resolved at
build time from the actual devices (diffgfdn_tpu.utils.placement).
"""

import jax
import numpy as np

from diffgfdn_tpu.models.feedback_loop import FeedbackLoop
from diffgfdn_tpu.utils.placement import placement_is_tpu


def test_placement_is_tpu_resolves_from_given_devices():
    cpu = jax.devices("cpu")
    assert placement_is_tpu(cpu) is False
    assert placement_is_tpu(cpu[:1]) is False
    assert placement_is_tpu([]) is False


def test_feedback_loop_auto_mode_is_portable_xla_path():
    """use_pallas_inverse=None must NOT consult the process backend."""
    fl = FeedbackLoop(
        sample_rate=8000.0,
        num_groups=2,
        num_delay_lines_per_group=2,
        delays=(163, 179, 191, 211),
        gains=np.full(4, 0.99, np.float32),
    )
    assert fl._pallas_inverse() is False
    assert (
        FeedbackLoop(
            sample_rate=8000.0,
            num_groups=2,
            num_delay_lines_per_group=2,
            delays=(163, 179, 191, 211),
            gains=np.full(4, 0.99, np.float32),
            use_pallas_inverse=True,
        )._pallas_inverse()
        is True
    )


def test_build_gfdn_model_resolves_pallas_from_devices(tmp_path):
    from diffgfdn_tpu.config.schema import DiffGFDNConfig, TrainerConfig
    from diffgfdn_tpu.training.build import build_gfdn_model

    cfg = DiffGFDNConfig(
        num_groups=3,
        num_delay_lines=6,
        sample_rate=8000.0,
        delay_range_ms=[20.0, 45.0],
        trainer_config=TrainerConfig(
            batch_size=4, num_freq_bins=512, train_dir=str(tmp_path)
        ),
    )
    model = build_gfdn_model(
        cfg,
        common_decay_times=np.asarray([0.08, 0.12, 0.1]),
        devices=jax.devices("cpu"),
    )
    assert model.use_pallas_inverse is False
    model = build_gfdn_model(
        cfg,
        common_decay_times=np.asarray([0.08, 0.12, 0.1]),
        use_pallas_inverse=True,
    )
    assert model.use_pallas_inverse is True


def test_no_default_backend_in_kernel_dispatch_paths():
    """AST source audit: kernels and models never consult
    jax.default_backend() in executable code (docstrings/comments may
    explain the rule)."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "diffgfdn_tpu"
    offenders = []
    for sub in ("kernels", "models"):
        for path in (pkg / sub).glob("*.py"):
            tree = ast.parse(path.read_text())
            for node in ast.walk(tree):
                name = None
                if isinstance(node, ast.Attribute):
                    name = node.attr
                elif isinstance(node, ast.Name):
                    name = node.id
                if name == "default_backend":
                    offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, offenders


def test_tdgfdn_kernel_policy_is_measured():
    """The compiled TD kernel is selected only on TPU placement AND with a
    recorded measurement showing it DECISIVELY faster than the scan — a
    parity-level reading inside measurement noise must not flip production
    behavior (the hysteresis margin, kernels/tdgfdn.py)."""
    from diffgfdn_tpu.kernels import tdgfdn

    delays = (641, 757, 809, 877)
    key = tuple(delays)
    tdgfdn._KERNEL_TIMINGS.pop(key, None)
    try:
        # CPU placement (test env): never the kernel, measured or not
        assert not tdgfdn.use_pallas_kernel(delays)
        tdgfdn.record_kernel_timing(delays, kernel_dt=1.0, scan_dt=2.0)
        assert not tdgfdn.use_pallas_kernel(delays)

        # fake TPU placement: policy follows the recorded measurement
        class _Dev:
            platform = "tpu"

        devs = [_Dev()]
        assert tdgfdn.use_pallas_kernel(delays, devices=devs)
        tdgfdn.record_kernel_timing(delays, kernel_dt=2.0, scan_dt=1.0)
        assert not tdgfdn.use_pallas_kernel(delays, devices=devs)
        # hysteresis: a 2% win is measurement noise, not a selection —
        # the kernel must beat the scan by the full margin
        tdgfdn.record_kernel_timing(delays, kernel_dt=0.98, scan_dt=1.0)
        assert not tdgfdn.use_pallas_kernel(delays, devices=devs)
        margin = tdgfdn._KERNEL_SELECTION_MARGIN
        tdgfdn.record_kernel_timing(delays, kernel_dt=margin, scan_dt=1.0)
        assert tdgfdn.use_pallas_kernel(delays, devices=devs)
        tdgfdn._KERNEL_TIMINGS.pop(key, None)
        # no measurement: default to the scan
        assert not tdgfdn.use_pallas_kernel(delays, devices=devs)
    finally:
        tdgfdn._KERNEL_TIMINGS.pop(key, None)
