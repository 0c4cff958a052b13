"""Benchmark: full-band DiffGFDN training throughput on TPU vs PyTorch-CPU.

Flagship config (BASELINE.md): 3-room omni DiffGFDNVarReceiverPos, N = 12
delay lines, nfft = 131072 (65537 rFFT bins), batch = 32 receivers,
EDC + EDR losses, Adam. The baseline is an algorithmically equivalent
PyTorch-CPU train step (the reference's eager formulation: complex
torch.linalg.inv over all bins + einsum + irfft/STFT losses + backward).

Three measurements:
  1. scalar-head train step (headline, comparable across rounds),
  2. SVF-output-head train step (+reg loss) — the reference's DEFAULT
     OutputFilterConfig — vs an equivalent torch-CPU SVF step,
  3. 2-s RIR synthesis x-realtime per chip (838 receivers, GEQ-filtered
     absorption, alias-free time-domain core) vs the BASELINE.md
     >= 1000x-real-time north-star target.

Prints ONE JSON line: the headline metric plus an ``extra_metrics`` list
carrying the other two.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache (production deployment default).

    Verified to work on the remote axon TPU backend in this environment
    (a 13 s production-shape compile replays in 0.4 s across processes).
    Compile keys include the HLO module + compiler version, so edited
    code recompiles and unchanged programs replay. Disable with
    DIFFGFDN_JAX_CACHE_DIR="".
    """
    cache_dir = os.environ.get(
        "DIFFGFDN_JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


_enable_compile_cache()

NFFT = 131072
BATCH = 32
FS = 32000.0
DELAYS = (1031, 1087, 1153, 1201, 1249, 1301, 1361, 1409, 1459, 1499, 1553, 1601)
T60S = (0.5, 1.1, 0.8)
NUM_GROUPS = 3


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_batch(f):
    rng = np.random.RandomState(0)
    pos = rng.rand(BATCH, 3).astype(np.float32) * 4.0
    # target spectra: shaped-noise RIR spectra at flagship scale
    t = np.arange(NFFT) / FS
    env = np.exp(-t * np.log(1e6) / 0.8)
    rirs = rng.randn(BATCH, NFFT).astype(np.float32) * np.sqrt(env)[None, :]
    target = np.fft.rfft(rirs, NFFT, axis=-1).astype(np.complex64)
    return {
        "z_values": np.exp(1j * np.linspace(0, np.pi, f)).astype(np.complex64),
        "source_position": rng.rand(BATCH, 3).astype(np.float32),
        "listener_position": pos,
        "norm_listener_position": pos / 4.0,
        "target_early_response": np.zeros((BATCH, f), np.complex64),
        "target_rir_response": target,
    }


def bench_tpu(steps: int = 24):
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.training.optim import make_optimizer
    from diffgfdn_tpu.training.trainer import GFDNTrainer
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    log("jax devices:", jax.devices())
    f = NFFT // 2 + 1
    gains = []
    for k in range(NUM_GROUPS):
        d = np.asarray(DELAYS[4 * k : 4 * k + 4])
        gains.append(np.asarray(decay_times_to_gain_per_sample(T60S[k], d, FS)))
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=np.concatenate(gains),
        use_svf_in_output=False,
        num_hidden_layers=3,
        num_neurons=128,
        num_fourier_features=10,
        # bench runs on the default placement (the real chip): truthful
        use_pallas_inverse=placement_is_tpu(),
    )
    cfg = TrainerConfig(
        batch_size=BATCH, num_freq_bins=NFFT, max_epochs=1, lr=1e-3
    )
    from diffgfdn_tpu.data.batching import BatchArrays
    from diffgfdn_tpu.utils.cio import init_with_batch

    trainer = GFDNTrainer(
        model, cfg, steps_per_epoch=21, common_decay_times=np.asarray(T60S),
        sample_rate=FS,
    )
    raw = make_batch(f)
    arrays = BatchArrays(
        z_values=raw["z_values"],
        source_position=raw["source_position"],
        listener_position=raw["listener_position"],
        norm_listener_position=raw["norm_listener_position"],
        target_early_response=raw["target_early_response"],
        target_late_response=raw["target_rir_response"],
        target_rir_response=raw["target_rir_response"],
    )
    log("precomputing target features...")
    trainer.precompute_target_features(arrays)
    params = init_with_batch(model, jax.random.PRNGKey(0), raw)
    trainer.optimizer = make_optimizer(cfg, params, 21)
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(1)

    # device-resident data: upload once, gather batches on device by index
    # (the TPU sits behind a network tunnel; per-step host batches would
    # cost ~10x the compute)
    data = trainer.upload_arrays(arrays)
    step = jax.jit(trainer._make_indexed_step(True))
    idx = jnp.arange(BATCH, dtype=jnp.int32)

    log("compiling tpu train step...")
    t0 = time.time()
    params, opt_state, total, _ = step(params, opt_state, data, idx, key)
    total.block_until_ready()
    log(f"compile+first step: {time.time() - t0:.1f}s, loss={float(total):.3f}")

    # pipelined throughput: training loops don't sync per step (losses
    # accumulate on device); blocking each step would add one full tunnel
    # round trip (~45 ms) of pure latency
    reps = 4
    times = []
    for _ in range(reps):
        t0 = time.time()
        for i in range(steps):
            params, opt_state, total, _ = step(params, opt_state, data, idx, key)
        total.block_until_ready()
        times.append((time.time() - t0) / steps)
    # the TPU here is tunnel-shared: contention adds multi-x additive noise
    # between (and within) sessions, so best-of-N is the honest estimate of
    # the program's own speed; the median is logged for context
    dt = float(np.min(times))
    log(
        f"tpu step: best {dt * 1e3:.1f} ms (median {np.median(times)*1e3:.1f}, "
        f"max {max(times)*1e3:.1f}) -> {1.0 / dt:.2f} steps/s"
    )

    # production path: GFDNTrainer.fit_indexed scans the whole epoch in ONE
    # dispatch (scan_epochs) — per-dispatch RPC overhead disappears
    epoch_fn = jax.jit(trainer._make_indexed_epoch())
    idx_mat = jnp.tile(idx, (steps, 1))
    params, opt_state, totals, _ = epoch_fn(params, opt_state, data, idx_mat, key)
    totals.block_until_ready()
    scan_times = []
    for _ in range(reps):
        t0 = time.time()
        params, opt_state, totals, _ = epoch_fn(
            params, opt_state, data, idx_mat, key
        )
        totals.block_until_ready()
        scan_times.append((time.time() - t0) / steps)
    sdt = float(np.min(scan_times))
    # logged for evidence only: the fullband step is COMPUTE-bound (the
    # scanned number also carries the per-step param normalization the raw
    # step omits), so pipelined per-step dispatch already hits device speed
    log(f"tpu scanned step: {sdt * 1e3:.2f} ms -> {1.0 / sdt:.1f} steps/s "
        f"(one dispatch per {steps} steps, incl. per-step normalization)")
    return 1.0 / dt, 1.0 / sdt


def bench_tpu_svf(steps: int = 12):
    """SVF-output-head flagship train step (+ aliasing reg loss) on TPU.

    This is the reference's default head (OutputFilterConfig.use_svfs=True,
    gain_filters.py:262-433): the MLP emits (resonance, gain-dB) grids per
    group, converted to biquad cascades and evaluated at all 65537 bins.
    """
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.data.batching import BatchArrays
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.training.optim import make_optimizer
    from diffgfdn_tpu.training.trainer import GFDNTrainer
    from diffgfdn_tpu.utils.cio import init_with_batch
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    f = NFFT // 2 + 1
    gains = []
    for k in range(NUM_GROUPS):
        d = np.asarray(DELAYS[4 * k : 4 * k + 4])
        gains.append(np.asarray(decay_times_to_gain_per_sample(T60S[k], d, FS)))
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=np.concatenate(gains),
        use_svf_in_output=True,
        num_hidden_layers=3,
        num_neurons=128,
        num_fourier_features=10,
        use_pallas_inverse=placement_is_tpu(),
    )
    cfg = TrainerConfig(
        batch_size=BATCH, num_freq_bins=NFFT, max_epochs=1, lr=1e-3,
        use_reg_loss=True,
    )
    raw = make_batch(f)
    arrays = BatchArrays(
        z_values=raw["z_values"],
        source_position=raw["source_position"],
        listener_position=raw["listener_position"],
        norm_listener_position=raw["norm_listener_position"],
        target_early_response=raw["target_early_response"],
        target_late_response=raw["target_rir_response"],
        target_rir_response=raw["target_rir_response"],
    )
    trainer = GFDNTrainer(
        model, cfg, steps_per_epoch=21, common_decay_times=np.asarray(T60S),
        sample_rate=FS,
    )
    log("svf: precomputing target features...")
    trainer.precompute_target_features(arrays)
    params = init_with_batch(model, jax.random.PRNGKey(0), raw)
    trainer.optimizer = make_optimizer(cfg, params, 21)
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(1)
    data = trainer.upload_arrays(arrays)
    step = jax.jit(trainer._make_indexed_step(True))
    idx = jnp.arange(BATCH, dtype=jnp.int32)

    log("compiling svf train step...")
    t0 = time.time()
    params, opt_state, total, _ = step(params, opt_state, data, idx, key)
    total.block_until_ready()
    log(f"svf compile+first step: {time.time() - t0:.1f}s, loss={float(total):.3f}")

    times = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, total, _ = step(params, opt_state, data, idx, key)
        total.block_until_ready()
        times.append((time.time() - t0) / steps)
    dt = float(np.min(times))
    log(
        f"svf tpu step: best {dt * 1e3:.1f} ms (median {np.median(times)*1e3:.1f})"
        f" -> {1.0 / dt:.2f} steps/s"
    )
    return 1.0 / dt


def bench_synthesis_tpu(dur_s: float = 2.0, num_receivers: int = 838):
    """2-s RIR synthesis x-realtime: 838 receivers, GEQ-filtered absorption,
    alias-free time-domain core, one chip. BASELINE.md target: >= 1000x."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.tdgfdn import (
        filter_bank_from_sos,
        synthesize_rirs_time_domain_filtered,
    )
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_filters_geq

    t_len = int(dur_s * FS)
    band_centre = 62.5 * 2.0 ** np.arange(8)
    rng = np.random.RandomState(0)
    t60s = np.stack([
        np.linspace(t * 1.4, t * 0.5, len(band_centre)) for t in T60S
    ])  # (G, bands): realistic LF-heavy decay
    sos = np.concatenate([
        decay_times_to_gain_filters_geq(
            band_centre, t60s[g], np.asarray(DELAYS[4 * g : 4 * g + 4]), FS
        )
        for g in range(NUM_GROUPS)
    ])  # (12, 11, 3, 2)
    bank = filter_bank_from_sos(sos, DELAYS)
    a = np.linalg.qr(rng.randn(len(DELAYS), len(DELAYS)))[0].astype(np.float32)
    b = rng.randn(len(DELAYS)).astype(np.float32)
    c = rng.randn(num_receivers, len(DELAYS)).astype(np.float32) / np.sqrt(12)

    synth = jax.jit(
        lambda cg: synthesize_rirs_time_domain_filtered(
            DELAYS, bank, jnp.asarray(a), jnp.asarray(b), cg, t_len
        )
    )
    log("compiling synthesis...")
    t0 = time.time()
    out = synth(jnp.asarray(c))
    out.block_until_ready()
    log(f"synthesis compile+first: {time.time() - t0:.1f}s")

    # chain calls through the data so the tunnel's replay cache can't elide
    # repeated identical executions
    cg = jnp.asarray(c)
    steps, reps = 4, 3
    times = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(steps):
            out = synth(cg)
            cg = cg + 1e-12 * out[:, : len(DELAYS)]
        out.block_until_ready()
        times.append((time.time() - t0) / steps)
    dt = float(np.min(times))
    xrt = num_receivers * dur_s / dt
    log(
        f"synthesis: best {dt * 1e3:.1f} ms for {num_receivers} x {dur_s:.0f}s "
        f"RIRs -> {xrt:,.0f}x real time"
    )
    return xrt


def bench_tdgfdn_kernel(dur_s: float = 2.0, num_receivers: int = 838):
    """Compiled Pallas TD kernel vs XLA scan on the real chip.

    Measures the 2-s flagship synthesis (scalar absorption) through BOTH
    paths, asserts f32-exact agreement, records the timings into the
    production selection policy (kernels.tdgfdn.record_kernel_timing — so
    this very process would pick the measured winner), and returns
    (kernel_x_realtime, kernel_dt / scan_dt).
    """
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.tdgfdn import (
        delay_line_outputs,
        delay_line_outputs_pallas,
        record_kernel_timing,
        use_pallas_kernel,
    )
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    if not placement_is_tpu():
        log("tdgfdn kernel bench skipped: not TPU-placed")
        return None

    t_len = int(dur_s * FS)
    rng = np.random.RandomState(0)
    a = np.linalg.qr(rng.randn(len(DELAYS), len(DELAYS)))[0].astype(np.float32)
    gains = np.asarray(
        [10.0 ** (-3.0 * d / (FS * T60S[i // 4])) for i, d in enumerate(DELAYS)],
        np.float32,
    )
    b = rng.randn(len(DELAYS)).astype(np.float32)
    c = rng.randn(num_receivers, len(DELAYS)).astype(np.float32) / np.sqrt(12)
    impulse = jnp.zeros(t_len, jnp.float32).at[0].set(1.0)

    paths = {
        "scan": jax.jit(
            lambda g: delay_line_outputs(DELAYS, g, jnp.asarray(a),
                                         jnp.asarray(b), impulse)
        ),
        "kernel": jax.jit(
            lambda g: delay_line_outputs_pallas(DELAYS, g, jnp.asarray(a),
                                                jnp.asarray(b), impulse,
                                                interpret=False)
        ),
    }
    outs, gstate = {}, {}
    for name, fn in paths.items():
        g = jnp.asarray(gains)
        t0 = time.time()
        out = fn(g)
        out.block_until_ready()
        log(f"tdgfdn {name} compile+first: {time.time() - t0:.1f}s")
        outs[name] = np.asarray(out)
        gstate[name] = g
    # INTERLEAVE the two paths' reps: the shared tunnel's contention
    # drifts on multi-second scales, and back-to-back blocks measured the
    # same pair at 1.61x (round-4 builder) vs 1.02x (round-4 driver) —
    # alternating reps exposes both paths to the same drift
    steps, reps = 4, 5
    times = {name: [] for name in paths}
    for _ in range(reps):
        for name, fn in paths.items():
            g = gstate[name]
            t0 = time.time()
            for _ in range(steps):
                # chain through the data to beat the tunnel replay cache
                out = fn(g)
                g = g + 1e-16 * out[0]
            out.block_until_ready()
            times[name].append((time.time() - t0) / steps)
            gstate[name] = g
    dts = {name: float(np.min(ts)) for name, ts in times.items()}
    err = float(np.max(np.abs(outs["scan"] - outs["kernel"])))
    assert err < 1e-5, f"kernel-vs-scan mismatch: {err}"
    record_kernel_timing(DELAYS, dts["kernel"], dts["scan"])
    chosen = "kernel" if use_pallas_kernel(DELAYS) else "scan"
    # x-realtime convention matches bench_synthesis_tpu (838 receivers
    # share one delay-line run; the (T,N)@(N,B) mix is negligible)
    xrt = num_receivers * dur_s / dts["kernel"]
    log(
        f"tdgfdn kernel {dts['kernel']*1e3:.1f} ms vs scan "
        f"{dts['scan']*1e3:.1f} ms (|err| {err:.1e}) -> policy picks {chosen}"
    )
    return xrt, dts["kernel"] / dts["scan"], dts["kernel"], dts["scan"]


def _production_dataset(tmpdir: str) -> str:
    """Synthetic Treble-scale dataset: 838 receivers, fs 32 kHz, 4.096-s RIRs.

    The real 838-receiver Treble pickle is git-LFS-hosted and absent
    (SURVEY §7.3); this generates the structurally identical synthetic
    counterpart at the REFERENCE'S production scale (dataloader.py:425-480:
    838 receivers, nfft 131072).
    """
    import pickle
    from pathlib import Path

    from diffgfdn_tpu.data.synthetic import generate_three_room_pickle

    path = Path(tmpdir) / "srirs_production.pkl"
    t0 = time.time()
    generate_three_room_pickle(
        path, fs=FS, num_rec_per_room=280, rir_len_s=NFFT / FS,
        decay_times=T60S, seed=0,
    )
    with open(path, "rb") as fh:
        data = pickle.load(fh)
    n = 838  # exact reference receiver count (840 generated; trim 2)
    data["rcvPos"] = data["rcvPos"][:, :n]
    data["srirs"] = np.asarray(data["srirs"][:n], np.float32)
    data["amplitudes"] = data["amplitudes"][:, :n]
    data["noise_floor"] = data["noise_floor"][:, :n]
    with open(path, "wb") as fh:
        pickle.dump(data, fh)
    log(f"production dataset: 838 receivers x {NFFT} samples "
        f"({time.time() - t0:.1f}s)")
    return str(path)


def bench_fullband_production(dataset_path: str, tmpdir: str):
    """End-to-end flagship training at REFERENCE PRODUCTION SCALE.

    838 receivers, nfft=131072, 20 epochs, batch 32 — through the REAL
    solver path (run_training_var_receiver_pos: pickle parse -> splits ->
    precomputed target features -> device-resident scanned epochs ->
    per-epoch checkpoints -> .mat export). The reference's corresponding
    deliverable is run_subband_training_treble.py:175-375 /
    trainer.py:338-564 at exactly this scale. Returns
    (wallclock_s, epochs_run, final_valid_edc_db).
    """
    from pathlib import Path

    from diffgfdn_tpu.config.schema import (
        ColorlessFDNConfig,
        DiffGFDNConfig,
        OutputFilterConfig,
        TrainerConfig,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.training.solver import run_training_var_receiver_pos

    import logging as _logging

    _logging.getLogger("diffgfdn_tpu").setLevel(_logging.INFO)
    if not _logging.getLogger().handlers:
        _logging.basicConfig(level=_logging.INFO)
    cfg = DiffGFDNConfig(
        seed=235,
        room_dataset_path=dataset_path,
        num_groups=NUM_GROUPS,
        sample_rate=FS,
        num_delay_lines=12,
        trainer_config=TrainerConfig(
            batch_size=BATCH, num_freq_bins=NFFT, max_epochs=20,
            lr=1e-3, io_lr=1e-3, coupling_angle_lr=1e-3,
            train_dir=str(Path(tmpdir) / "fullband"),
        ),
        output_filter_config=OutputFilterConfig(
            use_svfs=False, num_hidden_layers=3, num_neurons_per_layer=128,
        ),
        colorless_fdn_config=ColorlessFDNConfig(
            use_colorless_prototype=False
        ),
    )
    t0 = time.time()
    room = ThreeRoomDataset(dataset_path, nfft=NFFT)
    log(f"fullband production: dataset parse {time.time() - t0:.1f}s")
    trainer, _ = run_training_var_receiver_pos(cfg, room_data=room)
    wall = time.time() - t0
    epochs = len(trainer.train_loss)
    edc = float(
        trainer.individual_valid_loss[-1].get("edc_loss", float("nan"))
    )
    log(
        f"fullband production: {wall:.1f}s end-to-end "
        f"(parse+features+compile+{epochs} epochs+checkpoints+export), "
        f"final valid EDC {edc:.2f} dB"
    )
    return wall, epochs, edc


def bench_subband_production(dataset_path: str, tmpdir: str):
    """Full 8-band subband pipeline at REFERENCE PRODUCTION SCALE.

    Band-parallel training of all 8 octave bands (20 epochs, full loss
    stack incl. colorless, per-band checkpoints), then checkpoint
    inference + broadband resynthesis + per-receiver EDC error over all
    838 receivers — resynthesis and error computed ON DEVICE
    (broadband_edc_errors_device: only 838 error scalars cross the
    tunnel). Reference: run_subband_training_treble.py:175-375. Returns
    (wallclock_s, train_s, infer_s, mean_edc_err_db).
    """
    from pathlib import Path

    from diffgfdn_tpu.cli.run_subband_training import (
        create_config,
        DEFAULT_FREQS,
        training_band_parallel,
    )
    from diffgfdn_tpu.data.room_dataset import ThreeRoomDataset
    from diffgfdn_tpu.inference.gfdn_inference import (
        broadband_edc_errors_device,
    )

    import logging as _logging

    _logging.getLogger("diffgfdn_tpu").setLevel(_logging.INFO)
    if not _logging.getLogger().handlers:
        _logging.basicConfig(level=_logging.INFO)
    base = str(Path(tmpdir) / "subband")
    configs = [
        create_config(
            fc, dataset_path, base, NFFT, sample_rate=FS, max_epochs=20
        )
        for fc in DEFAULT_FREQS
    ]
    t0 = time.time()
    room = ThreeRoomDataset(dataset_path, nfft=NFFT)
    training_band_parallel(configs, room_data=room)
    train_s = time.time() - t0
    t1 = time.time()
    errs = broadband_edc_errors_device(
        configs, room, np.arange(room.num_rec)
    )
    infer_s = time.time() - t1
    wall = time.time() - t0
    mean_edc = float(np.mean(errs))
    try:
        from diffgfdn_tpu.utils.plot import plot_position_map

        fig_path = str(Path(tmpdir) / "production_edc_error_map.png")
        plot_position_map(
            room.receiver_position, errs, room.room_dims,
            room.room_start_coord, title="broadband EDC error",
            cbar_label="dB", save_path=fig_path,
        )
        log(f"EDC error map saved: {fig_path}")
    except Exception as e:  # noqa: BLE001
        log("edc map figure failed:", repr(e))
    log(
        f"subband production pipeline: {wall:.1f}s "
        f"(train {train_s:.1f}s + all-band device inference {infer_s:.1f}s), "
        f"mean broadband EDC error {mean_edc:.2f} dB over 838 receivers"
    )
    return wall, train_s, infer_s, mean_edc


# 27 co-prime delays (9 per group) for the directional config: ambisonic
# order 2 => 9 SH channels per group, 3 coupled groups (BASELINE config 3)
DIR_DELAYS = (
    809, 877, 937, 1009, 1069, 1123, 1187, 1237, 1279,
    1321, 1381, 1433, 1487, 1531, 1583, 1621, 1669, 1723,
    1759, 1811, 1861, 1901, 1949, 1993, 2027, 2081, 2129,
)


def _directional_setup():
    """Shared geometry for the directional TPU bench and its torch baseline."""
    from diffgfdn_tpu.models.spatial import build_analysis_matrix
    from diffgfdn_tpu.ops.sph import t_design_directions

    dirs = t_design_directions(5)  # (2, 12) (azi, colat)
    des = np.stack([dirs[0], np.pi / 2 - dirs[1]])  # (azi, elevation)
    analysis = build_analysis_matrix(2, des, None)  # (12, 9)
    rng = np.random.RandomState(7)
    amps = rng.rand(16, analysis.shape[0], NUM_GROUPS).astype(np.float32)
    amps *= np.asarray([0.4, 1.0, 0.7], np.float32)  # per-room scale
    return analysis, amps


def bench_tpu_directional(steps: int = 10):
    """BASELINE config 3: directional FDN training step on TPU.

    N = 27 delay lines (3 coupled groups x 9 SH channels, ambisonic order
    2), 12 analysis directions, batch 16, nfft 131072, directional EDC
    loss (SH-domain irfft + time-domain beamforming). Reference semantics:
    model.py:975-1126 + trainer.py:798-921.
    """
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.data.batching import BatchArrays
    from diffgfdn_tpu.losses.spatial import make_decay_envelopes
    from diffgfdn_tpu.models import DiffDirectionalFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.training.optim import make_optimizer
    from diffgfdn_tpu.training.trainer import DirectionalGFDNTrainer
    from diffgfdn_tpu.utils.cio import init_with_batch
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    batch = 16
    f = NFFT // 2 + 1
    analysis, amps = _directional_setup()
    gains = np.concatenate([
        np.asarray(
            decay_times_to_gain_per_sample(
                T60S[k], np.asarray(DIR_DELAYS[9 * k : 9 * k + 9]), FS
            )
        )
        for k in range(NUM_GROUPS)
    ])
    model = DiffDirectionalFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DIR_DELAYS,
        gains=gains,
        ambi_order=2,
        num_hidden_layers=3,
        num_neurons=128,
        num_fourier_features=10,
        analysis_matrix=analysis,
        use_zero_coupling=False,  # coupled groups: full 27x27 loop inverse
        use_pallas_inverse=placement_is_tpu(),
    )
    cfg = TrainerConfig(batch_size=batch, num_freq_bins=NFFT, max_epochs=1,
                        lr=1e-3)
    envelopes = make_decay_envelopes(
        np.asarray(T60S), int(max(T60S) * FS), FS
    )
    trainer = DirectionalGFDNTrainer(
        model, cfg, steps_per_epoch=21, common_decay_times=np.asarray(T60S),
        sample_rate=FS, directional_envelopes=np.asarray(envelopes),
    )
    rng = np.random.RandomState(0)
    pos = rng.rand(batch, 3).astype(np.float32) * 4.0
    zeros = np.zeros((batch, f), np.complex64)
    arrays = BatchArrays(
        z_values=np.exp(1j * np.linspace(0, np.pi, f)).astype(np.complex64),
        source_position=rng.rand(batch, 3).astype(np.float32),
        listener_position=pos,
        norm_listener_position=pos / 4.0,
        target_early_response=zeros,
        target_late_response=zeros,
        target_rir_response=zeros,
        target_common_slope_amps=amps,
    )
    raw = {
        "z_values": arrays.z_values,
        "listener_position": pos,
        "norm_listener_position": pos / 4.0,
        "target_common_slope_amps": amps,
    }
    params = init_with_batch(model, jax.random.PRNGKey(0), raw)
    trainer.optimizer = make_optimizer(cfg, params, 21)
    opt_state = trainer.optimizer.init(params)
    data = trainer.upload_arrays(arrays)
    step = jax.jit(trainer._make_indexed_step(True))
    idx = jnp.arange(batch, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)

    log("compiling directional train step...")
    t0 = time.time()
    params, opt_state, total, _ = step(params, opt_state, data, idx, key)
    total.block_until_ready()
    log(f"directional compile+first: {time.time() - t0:.1f}s, "
        f"loss={float(total):.3f}")

    times = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, total, _ = step(params, opt_state, data, idx, key)
        total.block_until_ready()
        times.append((time.time() - t0) / steps)
    dt = float(np.min(times))
    log(f"directional tpu step: best {dt * 1e3:.1f} ms "
        f"(median {np.median(times) * 1e3:.1f}) -> {1.0 / dt:.2f} steps/s")
    return 1.0 / dt


def bench_torch_cpu_directional(steps: int = 2):
    """Equivalent eager torch-CPU directional train step (same work shape:
    27x27 coupled loop inverse at all bins, SH output mix, directional
    EDC loss via irfft + beamforming + Schroeder)."""
    import os

    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    batch = 16
    f = NFFT // 2 + 1
    n = len(DIR_DELAYS)
    analysis, amps_np = _directional_setup()
    analysis_t = torch.tensor(np.asarray(analysis, np.float32))
    amps = torch.tensor(amps_np)
    delays = torch.tensor(DIR_DELAYS, dtype=torch.float32)
    gains = np.concatenate([
        10.0 ** (-3.0 * np.asarray(DIR_DELAYS[9 * k : 9 * k + 9])
                 / (FS * T60S[k]))
        for k in range(NUM_GROUPS)
    ])
    gamma = torch.tensor(gains, dtype=torch.float32)
    t_env = np.arange(int(max(T60S) * FS)) / FS
    env = np.stack([np.exp(-t_env * np.log(1e6) / t60) for t60 in T60S])
    env_t = torch.tensor(env, dtype=torch.float32)

    m_param = torch.randn(n, n, requires_grad=True)
    b_gain = torch.randn(n, requires_grad=True)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(60, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, NUM_GROUPS * 9),
    )
    opt = torch.optim.Adam([m_param, b_gain] + list(mlp.parameters()), lr=1e-3)
    rng = np.random.RandomState(0)
    pos = torch.tensor(rng.rand(batch, 3).astype(np.float32))
    freqs = torch.exp(torch.linspace(np.log(1.0), np.log(32.0), 10))
    z = torch.tensor(
        np.exp(1j * np.linspace(0, np.pi, f)).astype(np.complex64)
    )
    mix = int(0.02 * FS)
    t_len = env.shape[-1]

    def step():
        opt.zero_grad()
        phase = freqs[None, :, None] * np.pi * pos[:, None, :]
        enc = torch.cat([torch.sin(phase), torch.cos(phase)], -1).reshape(
            batch, -1
        )
        w = torch.tanh(mlp(enc)).reshape(batch, NUM_GROUPS, 9)

        skew = torch.triu(m_param, 1)
        skew = skew - skew.transpose(-1, -2)
        a = torch.matrix_exp(skew).to(torch.complex64)
        d_diag = z[:, None] ** delays[None, :] / gamma[None, :]
        m = torch.diag_embed(d_diag) - a[None]
        p = torch.linalg.inv(m)  # (F, 27, 27) complex
        q = torch.einsum(
            "fnm,n->fm", p, b_gain.to(torch.complex64)
        ).reshape(f, NUM_GROUPS, 9)
        h = torch.einsum("bga,fga->baf", w.to(torch.complex64), q)

        rir_sh = torch.fft.irfft(h, NFFT, dim=-1)[..., mix : mix + t_len]
        rir_dir = torch.einsum("jl,blt->bjt", analysis_t, rir_sh)
        edc = torch.flip(
            torch.cumsum(torch.flip(rir_dir ** 2, dims=[-1]), dim=-1),
            dims=[-1],
        )
        edc_true = torch.einsum(
            "bjk,kt->bjt", amps, env_t[:, : rir_dir.shape[-1]] ** 2
        )
        loss = torch.mean(
            torch.abs(
                10 * torch.log10(edc + 1e-9)
                - 10 * torch.log10(edc_true + 1e-9)
            )
        )
        loss.backward()
        opt.step()
        return float(loss.detach())

    t0 = time.time()
    step()
    log(f"torch directional warmup: {time.time() - t0:.1f}s")
    times = []
    for _ in range(steps):
        t0 = time.time()
        step()
        times.append(time.time() - t0)
    dt = float(np.min(times))
    log(f"torch cpu directional step: best {dt:.2f} s -> "
        f"{1.0 / dt:.3f} steps/s")
    return 1.0 / dt


def bench_tpu_band_parallel(steps: int = 6):
    """BASELINE config 2: all 8 octave-band GFDNs training in ONE step.

    One chip, fused band axis (vmapped, band-sharded on multi-chip
    meshes); flagship scale per band (nfft 131072, batch 32). The
    reference trains the 8 bands as sequential python jobs
    (run_subband_training_treble.py:175-204).
    """
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.data.batching import BatchArrays
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel.band_parallel import BandParallelTrainer
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    f = NFFT // 2 + 1
    centres = [62.5 * 2.0 ** k for k in range(8)]
    band_resps = np.stack([
        subband_filter_response(fc, (min(centres), max(centres)), 1, FS, NFFT)
        for fc in centres
    ])  # (8, F) complex
    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            T60S[k], np.asarray(DELAYS[4 * k : 4 * k + 4]), FS))
        for k in range(NUM_GROUPS)
    ])
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS,
        num_groups=NUM_GROUPS,
        delays=DELAYS,
        gains=gains,
        use_svf_in_output=False,
        num_hidden_layers=3,
        num_neurons=128,
        num_fourier_features=10,
        use_pallas_inverse=placement_is_tpu(),
    )
    cfg = TrainerConfig(batch_size=BATCH, num_freq_bins=NFFT, max_epochs=1,
                        lr=1e-3)
    trainer = BandParallelTrainer(
        model, cfg, band_resps, steps_per_epoch=21,
        max_ir_len_ms=float(max(T60S)) * 1e3,
    )
    raw = make_batch(f)
    arrays = BatchArrays(
        z_values=raw["z_values"],
        source_position=raw["source_position"],
        listener_position=raw["listener_position"],
        norm_listener_position=raw["norm_listener_position"],
        target_early_response=raw["target_early_response"],
        target_late_response=raw["target_rir_response"],
        target_rir_response=raw["target_rir_response"],
    )
    # init traces the forward: use a short z grid (param shapes are F-free)
    small = dict(raw)
    small["z_values"] = raw["z_values"][:2049]
    small["target_early_response"] = raw["target_early_response"][:, :2049]
    params, opt_state = trainer.init(small, seeds=list(range(8)))
    log("band-parallel: precomputing per-band target features...")
    trainer.precompute_band_target_features(arrays)
    data = trainer.upload_arrays(arrays)
    step = jax.jit(trainer._make_indexed_step())
    band_feats = trainer._band_feats if trainer._band_feats is not None else {}
    idx = jnp.arange(BATCH, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)
    active = jnp.ones(8, jnp.float32)

    log("compiling 8-band fused step...")
    t0 = time.time()
    params, opt_state, total, _ = step(
        params, opt_state, data, band_feats, trainer._band_resps_dev, idx,
        key, active,
    )
    total.block_until_ready()
    log(f"band-parallel compile+first: {time.time() - t0:.1f}s, "
        f"losses={np.round(np.asarray(total), 2).tolist()}")

    times = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, total, _ = step(
                params, opt_state, data, band_feats,
                trainer._band_resps_dev, idx, key, active,
            )
        total.block_until_ready()
        times.append((time.time() - t0) / steps)
    dt = float(np.min(times))
    log(f"band-parallel tpu step (all 8 bands): best {dt * 1e3:.1f} ms "
        f"(median {np.median(times) * 1e3:.1f}) -> {1.0 / dt:.2f} steps/s")
    return 1.0 / dt


def bench_tpu_spatial_mlp(steps: int = 30):
    """BASELINE config 4: Common-Slopes SH-MLP spatial-sampling train step.

    Directional beamformer-weights MLP (3x128), 12 directions, 3 slopes,
    batch 32, spatial EDC loss at fs 32k (reference:
    spatial_sampling/trainer.py:94-192).
    """
    import jax

    import optax

    from diffgfdn_tpu.losses.spatial import (
        make_decay_envelopes,
        spatial_edc_loss,
    )
    from diffgfdn_tpu.models.spatial import (
        directional_amplitudes,
        DirectionalBeamformerWeightsMLP,
    )

    batch = 32
    analysis, _ = _directional_setup()
    rng = np.random.RandomState(0)
    pos = rng.rand(batch, 3).astype(np.float32) * 4.0
    target = rng.rand(batch, analysis.shape[0], NUM_GROUPS).astype(np.float32)
    envelopes = make_decay_envelopes(np.asarray(T60S), int(max(T60S) * FS), FS)
    model = DirectionalBeamformerWeightsMLP(
        num_groups=NUM_GROUPS, ambi_order=2, num_fourier_features=10,
        num_hidden_layers=3, num_neurons=128,
    )
    batch_dict = {
        "listener_position": pos,
        "norm_listener_position": pos / 4.0,
        "target_common_slope_amps": target,
    }
    params = model.init(jax.random.PRNGKey(0), batch_dict)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    a_mat = np.asarray(analysis, np.float32)

    def loss_fn(p, b):
        amps = directional_amplitudes(a_mat, model.apply(p, b))
        return spatial_edc_loss(amps, b["target_common_slope_amps"], envelopes)

    @jax.jit
    def step(p, o, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    log("compiling spatial CS-MLP step...")
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, batch_dict)
    loss.block_until_ready()
    log(f"spatial compile+first: {time.time() - t0:.1f}s, "
        f"loss={float(loss):.3f}")

    times = []
    for _ in range(4):
        t0 = time.time()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, batch_dict)
        loss.block_until_ready()
        times.append((time.time() - t0) / steps)
    dt = float(np.min(times))
    log(f"spatial cs-mlp tpu step: best {dt * 1e3:.1f} ms "
        f"(median {np.median(times) * 1e3:.1f}) -> {1.0 / dt:.2f} steps/s")

    # production path: SpatialSamplingTrainer scans the whole epoch in ONE
    # dispatch (scan_epochs) — the per-dispatch RPC overhead above
    # disappears and throughput is set by device compute alone
    scan_len = 100

    @jax.jit
    def epoch(p, o, b):
        def body(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            updates, o2 = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o2), loss

        (p, o), losses = jax.lax.scan(body, (p, o), None, length=scan_len)
        return p, o, losses[-1]

    params, opt_state, loss = epoch(params, opt_state, batch_dict)
    loss.block_until_ready()
    scan_times = []
    for _ in range(4):
        t0 = time.time()
        params, opt_state, loss = epoch(params, opt_state, batch_dict)
        loss.block_until_ready()
        scan_times.append((time.time() - t0) / scan_len)
    sdt = float(np.min(scan_times))
    log(f"spatial cs-mlp tpu scanned step: {sdt * 1e3:.2f} ms "
        f"-> {1.0 / sdt:.1f} steps/s (one dispatch per {scan_len} steps)")
    return 1.0 / dt, 1.0 / sdt


def bench_torch_cpu_spatial(steps: int = 5):
    """Equivalent eager torch-CPU CS-MLP spatial train step."""
    import os

    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    batch = 32
    analysis, _ = _directional_setup()
    a_mat = torch.tensor(np.asarray(analysis, np.float32))
    t_env = np.arange(int(max(T60S) * FS)) / FS
    env = np.stack([np.exp(-t_env * np.log(1e6) / t60) for t60 in T60S])
    env_t = torch.tensor(env, dtype=torch.float32)
    rng = np.random.RandomState(0)
    pos = torch.tensor(rng.rand(batch, 3).astype(np.float32))
    target = torch.tensor(
        rng.rand(batch, a_mat.shape[0], NUM_GROUPS).astype(np.float32)
    )
    freqs = torch.exp(torch.linspace(np.log(1.0), np.log(32.0), 10))
    mlp = torch.nn.Sequential(
        torch.nn.Linear(60, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, NUM_GROUPS * 9),
    )
    opt = torch.optim.Adam(mlp.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        phase = freqs[None, :, None] * np.pi * pos[:, None, :]
        enc = torch.cat([torch.sin(phase), torch.cos(phase)], -1).reshape(
            batch, -1
        )
        w = mlp(enc).reshape(batch, NUM_GROUPS, 9)
        amps = torch.sigmoid(torch.einsum("jn,bkn->bjk", a_mat, w))
        edc_p = torch.einsum("bjk,kt->bjt", amps, env_t ** 2)
        edc_t = torch.einsum("bjk,kt->bjt", target, env_t ** 2)
        loss = torch.mean(
            torch.abs(
                10 * torch.log10(edc_p + 1e-9)
                - 10 * torch.log10(edc_t + 1e-9)
            )
        )
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()
    times = []
    for _ in range(steps):
        t0 = time.time()
        step()
        times.append(time.time() - t0)
    dt = float(np.min(times))
    log(f"torch cpu spatial step: best {dt * 1e3:.1f} ms -> "
        f"{1.0 / dt:.2f} steps/s")
    return 1.0 / dt


def bench_binaural_render(backend: str = "host"):
    """BASELINE config 5: 6DoF moving-listener binaural render.

    Per-hop SH rotation + HRTF-SH beamforming + crossfaded overlap-add
    (reference: sound_examples.py:356-539). ``backend="host"`` is the
    streaming hop loop on one CPU core; ``backend="jax"`` batches every
    hop into one device program. Returns x-real-time.
    """
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "binaural_bench",
        Path(__file__).resolve().parent / "tools" / "binaural_bench.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the device backend is a throughput path: use a long trajectory so
    # the fixed ~45 ms tunnel round trip amortises (the host loop is
    # latency-insensitive and linear in hops either way)
    return mod.measure(
        backend=backend, hops=240 if backend in ("jax", "device") else 30
    )


def bench_torch_cpu_svf(steps: int = 2):
    """Equivalent eager PyTorch-CPU SVF-head train step (reference default).

    Same shape of work as the reference's SVF_from_MLP path
    (gain_filters.py:262-433): MLP -> (B, G, K, 2) SVF params -> biquad
    cascade -> response at all bins -> per-line output filters -> H -> EDC
    + EDR losses -> backward.
    """
    import os

    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    f = NFFT // 2 + 1
    n = len(DELAYS)
    nper = n // NUM_GROUPS
    n_sections = 10
    delays = torch.tensor(DELAYS, dtype=torch.float32)
    gains = []
    for k in range(NUM_GROUPS):
        d = np.asarray(DELAYS[4 * k : 4 * k + 4])
        gains.append(10.0 ** (-3.0 * d / (FS * T60S[k])))
    gamma = torch.tensor(np.concatenate(gains), dtype=torch.float32)

    m_param = torch.randn(NUM_GROUPS, nper, nper, requires_grad=True)
    b_gain = torch.randn(n, 1, requires_grad=True)
    c_gain = torch.randn(n, 1, requires_grad=True)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(60, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, NUM_GROUPS * n_sections * 2),
    )
    opt = torch.optim.Adam(
        [m_param, b_gain, c_gain] + list(mlp.parameters()), lr=1e-3
    )

    batch = make_batch(f)
    z = torch.tensor(batch["z_values"])
    zinv = 1.0 / z
    zinv2 = zinv * zinv
    pos = torch.tensor(batch["norm_listener_position"])
    target = torch.tensor(batch["target_rir_response"])
    freqs = torch.exp(torch.linspace(np.log(1.0), np.log(32.0), 10))
    cutoffs = torch.tensor(
        np.pi * 62.5 * 2.0 ** np.arange(n_sections) / FS, dtype=torch.float32
    )
    mix_samps = int(0.02 * FS)
    max_len = int(1.1 * FS)

    def step():
        opt.zero_grad()
        phase = freqs[None, :, None] * np.pi * pos[:, None, :]
        enc = torch.cat([torch.sin(phase), torch.cos(phase)], dim=-1).reshape(
            BATCH, -1
        )
        raw = mlp(enc).reshape(BATCH, NUM_GROUPS, n_sections, 2)
        res = torch.sigmoid(raw[..., 0]).clamp(1e-6, 1.0)
        g_db = 12.0 * torch.sigmoid(raw[..., 1]) - 6.0
        g_lin = 10.0 ** (g_db / 20.0)
        # peaking-style SVF->biquad (same op count class as the reference)
        gfac = torch.tan(cutoffs)[None, None, :]
        b0 = 1.0 + g_lin * gfac / res
        b1 = 2.0 * (gfac ** 2 - 1.0).expand_as(b0)
        b2 = 1.0 - g_lin * gfac / res
        a0 = 1.0 + gfac / res
        a1 = b1
        a2 = 1.0 - gfac / res
        # cascade response at all bins: (B, G, F)
        resp = torch.ones(BATCH, NUM_GROUPS, f, dtype=torch.complex64)
        for k in range(n_sections):
            num = (
                b0[..., k, None] + b1[..., k, None] * zinv
                + b2[..., k, None] * zinv2
            )
            den = (
                a0[..., k, None] + a1[..., k, None] * zinv
                + a2[..., k, None] * zinv2
            )
            resp = resp * (num / den)

        skew = torch.triu(m_param, 1)
        skew = skew - skew.transpose(-1, -2)
        o = torch.matrix_exp(skew)
        block = torch.einsum("gab,hbc->gahc", o, o).reshape(n, n)
        a = block.to(torch.complex64)
        d_diag = z[:, None] ** delays[None, :] / gamma[None, :]
        m = torch.diag_embed(d_diag) - a[None]
        p = torch.linalg.inv(m)

        c_line = (
            resp.repeat_interleave(nper, dim=1)
            * c_gain.to(torch.complex64)[None, :, 0, None]
        )  # (B, N, F)
        b_vec = b_gain.to(torch.complex64)[:, 0]
        pb = torch.einsum("fnm,m->fn", p, b_vec)  # (F, N)
        h = torch.einsum("bnf,fn->bf", c_line, pb)

        tgt_rir = torch.fft.irfft(target, NFFT)[..., mix_samps:max_len]
        ach_rir = torch.fft.irfft(h, NFFT)[..., mix_samps:max_len]

        def edc(x):
            return torch.flip(
                torch.cumsum(torch.flip(x ** 2, dims=[-1]), dim=-1), dims=[-1]
            )

        loss_edc = torch.mean(
            torch.abs(
                10 * torch.log10(edc(tgt_rir) + 1e-9)
                - 10 * torch.log10(edc(ach_rir) + 1e-9)
            )
        )
        win = torch.hann_window(4096)
        s_t = torch.stft(
            torch.fft.irfft(target, NFFT), 4096, 2048, window=win,
            center=False, return_complex=True,
        )
        s_a = torch.stft(
            torch.fft.irfft(h, NFFT), 4096, 2048, window=win,
            center=False, return_complex=True,
        )

        def edr(s):
            p_ = torch.abs(s) ** 2
            return 10 * torch.log10(
                torch.flip(
                    torch.cumsum(torch.flip(p_, dims=[-1]), dim=-1), dims=[-1]
                )
                + 1e-9
            )

        loss_edr = torch.sum(torch.abs(edr(s_t) - edr(s_a))) / torch.sum(
            torch.abs(edr(s_t))
        )
        loss = loss_edc + loss_edr
        loss.backward()
        opt.step()
        return float(loss.detach())

    t0 = time.time()
    step()
    log(f"torch svf warmup step: {time.time() - t0:.1f}s")
    times = []
    for _ in range(steps):
        t0 = time.time()
        step()
        times.append(time.time() - t0)
    dt = float(np.min(times))
    log(f"torch cpu svf step: best {dt:.2f} s -> {1.0 / dt:.3f} steps/s")
    return 1.0 / dt


def bench_torch_cpu(steps: int = 3):
    """Equivalent eager PyTorch-CPU train step (the reference's formulation)."""
    import os

    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())
    f = NFFT // 2 + 1
    n = len(DELAYS)
    nper = n // NUM_GROUPS
    delays = torch.tensor(DELAYS, dtype=torch.float32)
    gains = []
    for k in range(NUM_GROUPS):
        d = np.asarray(DELAYS[4 * k : 4 * k + 4])
        gains.append(10.0 ** (-3.0 * d / (FS * T60S[k])))
    gamma = torch.tensor(np.concatenate(gains), dtype=torch.float32)

    m_param = torch.randn(NUM_GROUPS, nper, nper, requires_grad=True)
    b_gain = torch.randn(n, 1, requires_grad=True)
    c_gain = torch.randn(n, 1, requires_grad=True)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(60, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LayerNorm(128), torch.nn.ReLU(),
        torch.nn.Linear(128, NUM_GROUPS),
    )
    opt = torch.optim.Adam(
        [m_param, b_gain, c_gain] + list(mlp.parameters()), lr=1e-3
    )

    batch = make_batch(f)
    z = torch.tensor(batch["z_values"])
    pos = torch.tensor(batch["norm_listener_position"])
    target = torch.tensor(batch["target_rir_response"])
    freqs = torch.exp(torch.linspace(np.log(1.0), np.log(32.0), 10))
    mix_samps = int(0.02 * FS)
    max_len = int(1.1 * FS)

    def step():
        opt.zero_grad()
        # position encoding + MLP head
        phase = freqs[None, :, None] * np.pi * pos[:, None, :]
        enc = torch.cat([torch.sin(phase), torch.cos(phase)], dim=-1).reshape(
            BATCH, -1
        )
        g = torch.sigmoid(mlp(enc)) * 2.0 - 1.0  # (B, G)
        c_mod = g.repeat_interleave(nper, dim=1)  # (B, N)

        # feedback loop: P = inv(D Gamma^-1 - A) over all bins
        skew = torch.triu(m_param, 1)
        skew = skew - skew.transpose(-1, -2)
        o = torch.matrix_exp(skew)  # (G, nper, nper)
        block = torch.einsum("gab,hbc->gahc", o, o).reshape(n, n)
        a = block.to(torch.complex64)
        d_diag = z[:, None] ** delays[None, :] / gamma[None, :]
        m = torch.diag_embed(d_diag) - a[None]
        p = torch.linalg.inv(m)  # (F, N, N) complex

        c = c_mod.to(torch.complex64)[:, :, None] * c_gain.to(torch.complex64)[None]
        b = b_gain.to(torch.complex64)[None].expand(BATCH, n, 1)
        t_mat = torch.einsum("bn,fnm->bmf", c[..., 0], p)
        h = torch.einsum("bmf,bm->bf", t_mat, b[..., 0])

        # EDC loss
        tgt_rir = torch.fft.irfft(target, NFFT)[..., mix_samps:max_len]
        ach_rir = torch.fft.irfft(h, NFFT)[..., mix_samps:max_len]

        def edc(x):
            return torch.flip(
                torch.cumsum(torch.flip(x ** 2, dims=[-1]), dim=-1), dims=[-1]
            )

        loss_edc = torch.mean(
            torch.abs(
                10 * torch.log10(edc(tgt_rir) + 1e-9)
                - 10 * torch.log10(edc(ach_rir) + 1e-9)
            )
        )
        # EDR loss
        win = torch.hann_window(4096)
        s_t = torch.stft(
            torch.fft.irfft(target, NFFT), 4096, 2048, window=win,
            center=False, return_complex=True,
        )
        s_a = torch.stft(
            torch.fft.irfft(h, NFFT), 4096, 2048, window=win,
            center=False, return_complex=True,
        )

        def edr(s):
            p_ = torch.abs(s) ** 2
            return 10 * torch.log10(
                torch.flip(torch.cumsum(torch.flip(p_, dims=[-1]), dim=-1), dims=[-1])
                + 1e-9
            )

        loss_edr = torch.sum(torch.abs(edr(s_t) - edr(s_a))) / torch.sum(
            torch.abs(edr(s_t))
        )
        loss = loss_edc + loss_edr
        loss.backward()
        opt.step()
        return float(loss)

    t0 = time.time()
    step()
    warm = time.time() - t0
    log(f"torch warmup step: {warm:.1f}s")
    times = []
    for _ in range(steps):
        t0 = time.time()
        step()
        times.append(time.time() - t0)
    dt = float(np.min(times))
    log(f"torch cpu step: best {dt:.2f} s -> {1.0 / dt:.3f} steps/s")
    return 1.0 / dt


def bench_convergence():
    """Training-convergence parity: matched-init matched-data toy training
    through fit_indexed vs the eager-torch reference-equivalent epoch loop
    (tools/convergence.py). Returns (ours_final_edc_db, torch_final_edc_db)
    — the claim this proves: 'gets the same answer', not just faster steps.
    """
    import tempfile

    from tools.convergence import compare

    with tempfile.TemporaryDirectory() as d:
        res = compare(d, max_epochs=20)
    log(
        f"convergence: final valid EDC ours {res['ours_final_edc_db']:.3f} dB"
        f" vs torch {res['torch_final_edc_db']:.3f} dB; best "
        f"{min(res['ours_valid_edc_db']):.3f} vs "
        f"{min(res['torch_valid_edc_db']):.3f}"
    )
    return res["ours_final_edc_db"], res["torch_final_edc_db"]


def bench_native_render(dur_s: float = 2.0, block: int = 256):
    """Native C++ streaming renderer: per-block latency + x-realtime.

    The host real-time deployment path (native/tdfdn.cpp via ctypes): a
    2-s flagship tail (N = 12 lines, fs 32 kHz, stereo output mix)
    processed in 256-sample blocks — the shape of a real audio callback —
    with sample-exactness vs the JAX time-domain core asserted in the
    same run. The reference has no real-time path at all
    (sound_examples.py:80-353 is offline). Returns
    (x_realtime, median_block_latency_us, max_block_latency_us).
    """
    from diffgfdn_tpu.native import native_available, NativeGFDNRenderer

    if not native_available():
        log("native render bench skipped: g++ unavailable")
        return None
    import jax.numpy as jnp

    from diffgfdn_tpu.kernels.tdgfdn import time_domain_gfdn
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample

    rng = np.random.RandomState(0)
    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            T60S[k], np.asarray(DELAYS[4 * k : 4 * k + 4]), FS))
        for k in range(NUM_GROUPS)
    ]).astype(np.float32)
    a = np.linalg.qr(rng.randn(len(DELAYS), len(DELAYS)))[0].astype(np.float32)
    b = rng.randn(len(DELAYS)).astype(np.float32)
    c = (rng.randn(2, len(DELAYS)) / np.sqrt(12)).astype(np.float32)

    t_len = int(dur_s * FS)
    u = np.zeros(t_len, np.float32)
    u[0] = 1.0
    import jax

    # highest matmul precision for the reference: XLA:TPU's default f32
    # matmul runs bf16-input passes, and the per-step feedback matvec
    # error compounds over 64k steps to ~1e-3 — the C++ renderer is true
    # f32, so the exactness assert needs a true-f32 reference
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(time_domain_gfdn(
            DELAYS, jnp.asarray(gains), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(c), jnp.asarray(u), direct_gain=0.25,
        ))

    renderer = NativeGFDNRenderer(DELAYS, gains, a, b)
    renderer.process(u[:block], c, direct_gain=0.25)  # warm (page-in)
    renderer.reset()
    lat, outs = [], []
    for i in range(0, t_len, block):
        blk = u[i : i + block]
        t0 = time.perf_counter()
        outs.append(renderer.process(blk, c, direct_gain=0.25))
        lat.append(time.perf_counter() - t0)
    out = np.concatenate(outs, axis=-1)
    err = float(np.max(np.abs(out - ref)))
    assert err < 1e-4, f"native-vs-jax mismatch: {err}"
    xrt = dur_s / sum(lat)
    med_us = float(np.median(lat)) * 1e6
    max_us = float(np.max(lat)) * 1e6
    budget_us = block / FS * 1e6
    log(
        f"native render: {xrt:.1f}x real time, block latency median "
        f"{med_us:.0f} us / max {max_us:.0f} us (budget {budget_us:.0f} us "
        f"@ {block} samples, |err| {err:.1e})"
    )
    return xrt, med_us, max_us


def bench_convergence_flagship():
    """Convergence parity at the REFERENCE PRODUCTION SHAPE: full nfft
    131072 (65537 rFFT bins), fs 32 kHz, batch 32, the 3x128 MLP head,
    2-s-class decays — ours on the chip, the eager-torch twin on CPU, 20
    epochs each from matched init/data (tools/convergence.py scale=
    "flagship"; VERDICT r4 item 3: pins fft precision + fused-solve VJP
    behaviour at the scale where they matter).
    """
    import tempfile

    from tools.convergence import compare

    with tempfile.TemporaryDirectory() as d:
        res = compare(d, max_epochs=20, scale="flagship")
    log(
        "flagship convergence: final valid EDC ours "
        f"{res['ours_final_edc_db']:.3f} dB vs torch "
        f"{res['torch_final_edc_db']:.3f} dB; best "
        f"{min(res['ours_valid_edc_db']):.3f} vs "
        f"{min(res['torch_valid_edc_db']):.3f}"
    )
    return (
        res["ours_final_edc_db"],
        res["torch_final_edc_db"],
        float(min(res["ours_valid_edc_db"])),
        float(min(res["torch_valid_edc_db"])),
    )


def _try(name, fn, *args, **kwargs):
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # noqa: BLE001
        log(f"{name} bench failed:", repr(e))
        return None


def main():
    # --- TPU measurements (all five BASELINE tracked configs) ---
    tpu_sps, tpu_scan_sps = bench_tpu()
    svf_sps = _try("svf tpu", bench_tpu_svf)
    xrt = _try("synthesis", bench_synthesis_tpu)
    kernel_res = _try("tdgfdn kernel", bench_tdgfdn_kernel)
    dir_sps = _try("directional tpu", bench_tpu_directional)
    band_sps = _try("band-parallel tpu", bench_tpu_band_parallel)
    spatial_res = _try("spatial tpu", bench_tpu_spatial_mlp)
    spatial_sps, spatial_scan_sps = (
        spatial_res if spatial_res is not None else (None, None)
    )
    conv = _try("convergence parity", bench_convergence)

    # --- production-scale end-to-end proofs (real chip only) ---
    fullband_prod = subband_prod = conv_flagship = None
    try:
        from diffgfdn_tpu.utils.placement import placement_is_tpu

        run_production = placement_is_tpu()
    except Exception:  # noqa: BLE001
        run_production = False
    if run_production:
        conv_flagship = _try(
            "flagship convergence", bench_convergence_flagship
        )
    if run_production:
        import tempfile

        prod_tmp = tempfile.mkdtemp(prefix="dgfdn_prod_")
        prod_path = _try("production dataset", _production_dataset, prod_tmp)
        if prod_path is not None:
            fullband_prod = _try(
                "fullband production",
                bench_fullband_production, prod_path, prod_tmp,
            )
            subband_prod = _try(
                "subband production",
                bench_subband_production, prod_path, prod_tmp,
            )
    else:
        log("production-scale benches skipped: not TPU-placed")

    native_res = _try("native render", bench_native_render)
    binaural_xrt = _try("binaural render", bench_binaural_render)
    binaural_dev_xrt = _try(
        "binaural render (device)", bench_binaural_render, backend="jax"
    )
    binaural_chip_xrt = _try(
        "binaural render (on-chip)", bench_binaural_render, backend="device"
    )

    # --- torch-CPU baselines (the reference's eager formulation) ---
    cpu_sps = _try("torch fullband", bench_torch_cpu)
    cpu_svf_sps = (
        _try("torch svf", bench_torch_cpu_svf) if svf_sps is not None else None
    )
    cpu_dir_sps = (
        _try("torch directional", bench_torch_cpu_directional)
        if dir_sps is not None
        else None
    )
    cpu_spatial_sps = (
        _try("torch spatial", bench_torch_cpu_spatial)
        if spatial_sps is not None
        else None
    )

    def ratio(a, b):
        return None if a is None or b is None else round(a / b, 2)

    extra = []
    if svf_sps is not None:
        extra.append({
            "metric": "svf_head_train_steps_per_sec",
            "value": round(svf_sps, 3),
            "unit": "steps/sec",
            "vs_baseline": ratio(svf_sps, cpu_svf_sps),
        })
    if dir_sps is not None:
        extra.append({
            "metric": "directional_train_steps_per_sec",
            "value": round(dir_sps, 3),
            "unit": "steps/sec_n27_coupled_12dir_batch16",
            "vs_baseline": ratio(dir_sps, cpu_dir_sps),
        })
    if band_sps is not None:
        # reference baseline: 8 sequential torch-CPU band jobs, each one
        # full-band step of the same shape => cpu_sps / 8 all-band steps/s
        extra.append({
            "metric": "band_parallel_8band_steps_per_sec",
            "value": round(band_sps, 3),
            "unit": "all8band_steps/sec_one_chip",
            "vs_baseline": (
                None if cpu_sps is None else round(band_sps / (cpu_sps / 8), 2)
            ),
        })
    if spatial_sps is not None:
        extra.append({
            "metric": "spatial_cs_mlp_train_steps_per_sec",
            "value": round(spatial_sps, 3),
            "unit": "steps/sec_12dir_batch32",
            "vs_baseline": ratio(spatial_sps, cpu_spatial_sps),
        })
    if spatial_scan_sps is not None:
        extra.append({
            "metric": "spatial_cs_mlp_scanned_steps_per_sec",
            "value": round(spatial_scan_sps, 1),
            "unit": "steps/sec_scanned_epoch_12dir_batch32",
            "vs_baseline": ratio(spatial_scan_sps, cpu_spatial_sps),
        })
    if xrt is not None:
        extra.append({
            "metric": "rir_synthesis_x_realtime",
            "value": round(xrt, 0),
            "unit": "x_realtime_2s_838rec_per_chip",
            "vs_baseline": round(xrt / 1000.0, 2),  # >=1000x target
        })
    if kernel_res is not None:
        kernel_xrt, kernel_vs_scan, kernel_dt, scan_dt = kernel_res
        extra.append({
            "metric": "tdgfdn_pallas_x_realtime",
            "value": round(kernel_xrt, 0),
            "unit": "x_realtime_2s_838rec_compiled_mosaic_kernel",
            # speedup vs the XLA scan computing the identical recursion:
            # > 1 means the kernel is faster (the selection policy picks
            # it only above the 1/0.9 hysteresis margin)
            "vs_baseline": round(1.0 / kernel_vs_scan, 2),
        })
        extra.append({
            "metric": "tdgfdn_kernel_ms",
            "value": round(kernel_dt * 1e3, 2),
            "unit": "ms_2s_12line_synthesis_interleaved_best",
            "vs_baseline": round(scan_dt / kernel_dt, 2),
        })
        extra.append({
            "metric": "tdgfdn_scan_ms",
            "value": round(scan_dt * 1e3, 2),
            "unit": "ms_2s_12line_synthesis_interleaved_best",
            "vs_baseline": round(kernel_dt / scan_dt, 2),
        })
    if fullband_prod is not None:
        fp_wall, fp_epochs, fp_edc = fullband_prod
        # torch-CPU estimate: measured eager step time x the reference's
        # 20-epoch x 21-batch envelope (run_subband_training_treble.py)
        torch_est = None if cpu_sps is None else 20 * 21 / cpu_sps
        extra.append({
            "metric": "fullband_time_to_train_s",
            "value": round(fp_wall, 1),
            "unit": f"s_end_to_end_838rec_nfft131072_{fp_epochs}epoch",
            "vs_baseline": (
                None if torch_est is None else round(torch_est / fp_wall, 1)
            ),
        })
        extra.append({
            "metric": "fullband_production_final_edc_db",
            "value": round(fp_edc, 3),
            "unit": "db_final_valid_edc_838rec_nfft131072",
            "vs_baseline": None,
        })
    if subband_prod is not None:
        sp_wall, sp_train, sp_infer, sp_edc = subband_prod
        torch_est8 = None if cpu_sps is None else 8 * 20 * 21 / cpu_sps
        extra.append({
            "metric": "subband_pipeline_wallclock_s",
            "value": round(sp_wall, 1),
            "unit": (
                f"s_8band_train{sp_train:.0f}s_infer{sp_infer:.0f}s_"
                "838rec_nfft131072_20epoch"
            ),
            "vs_baseline": (
                None if torch_est8 is None else round(torch_est8 / sp_wall, 1)
            ),
        })
        extra.append({
            "metric": "subband_broadband_mean_edc_err_db",
            "value": round(sp_edc, 3),
            "unit": "db_mean_edc_err_838rec_device_resynthesis",
            "vs_baseline": None,
        })
    if conv is not None:
        ours_edc, torch_edc = conv
        extra.append({
            "metric": "train_convergence_final_edc_db",
            "value": round(ours_edc, 4),
            "unit": "db_final_valid_edc_20epoch_matched_init_toy",
            # torch-reference final EDC / ours: >= 1 means we converge to
            # an answer at least as good as the reference algorithm's
            "vs_baseline": round(torch_edc / ours_edc, 4),
        })
    if conv_flagship is not None:
        cf_ours, cf_torch, cf_ours_best, cf_torch_best = conv_flagship
        extra.append({
            "metric": "train_convergence_flagship_edc_db",
            "value": round(cf_ours, 4),
            "unit": (
                f"db_final_valid_edc_20epoch_nfft131072_best"
                f"{cf_ours_best:.2f}_torchbest{cf_torch_best:.2f}"
            ),
            "vs_baseline": round(cf_torch / cf_ours, 4),
        })
    if native_res is not None:
        nat_xrt, nat_med_us, nat_max_us = native_res
        extra.append({
            "metric": "native_render_x_realtime",
            "value": round(nat_xrt, 1),
            "unit": (
                f"x_realtime_2s_stereo_256blk_median{nat_med_us:.0f}us_"
                f"max{nat_max_us:.0f}us"
            ),
            "vs_baseline": round(nat_xrt, 1),  # vs 1x real time
        })
    if binaural_xrt is not None:
        extra.append({
            "metric": "binaural_render_x_realtime",
            "value": round(binaural_xrt, 1),
            "unit": "x_realtime_6dof_host_cpu",
            "vs_baseline": round(binaural_xrt, 1),  # vs 1x real time
        })
    if binaural_dev_xrt is not None:
        extra.append({
            "metric": "binaural_render_batched_x_realtime",
            "value": round(binaural_dev_xrt, 1),
            "unit": "x_realtime_6dof_batched_device",
            "vs_baseline": (
                round(binaural_dev_xrt, 1)
                if binaural_xrt is None
                else round(binaural_dev_xrt / binaural_xrt, 1)
            ),  # vs the host streaming path (or 1x real time)
        })
    if binaural_chip_xrt is not None:
        extra.append({
            "metric": "binaural_render_device_x_realtime",
            "value": round(binaural_chip_xrt, 0),
            "unit": "x_realtime_6dof_per_chip_steady_state",
            # the per-chip steady-state number (fetch-synced, no payload
            # transfer): what a production deployment sees; vs_baseline =
            # ratio to the tunnel-fetched end-to-end path, i.e. how much
            # of the program the tunnel's payload bandwidth hides
            "vs_baseline": (
                round(binaural_chip_xrt, 0)
                if binaural_dev_xrt is None
                else round(binaural_chip_xrt / binaural_dev_xrt, 1)
            ),
        })

    print(
        json.dumps(
            {
                "metric": "fullband_train_steps_per_sec",
                "value": round(tpu_sps, 3),
                "unit": "steps/sec",
                "vs_baseline": ratio(tpu_sps, cpu_sps),
                "extra_metrics": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
