"""Numerical parity vs the PyTorch reference formulations (BASELINE.md).

The EDC loss must agree with the reference's torch implementation within
1e-3; EDR and the colorless losses are checked too. The torch twins below
implement the reference's published formulas (losses.py:149-281, 377-495,
colorless_fdn/losses.py) independently on the same inputs.
"""

import numpy as np
import torch

import jax.numpy as jnp

from diffgfdn_tpu.losses import amse_loss, edc_loss, edr_loss, mse_loss, sparsity_loss

FS = 16000.0
NFFT = 8192


def _torch_db(x, is_squared=False):
    factor = 10.0 if is_squared else 20.0
    return torch.clamp(
        factor * torch.log10(torch.abs(x) + torch.finfo(torch.float32).eps),
        min=-200.0,
    )


def torch_edc_loss(target_response, achieved_response, mixing, max_len):
    t = torch.fft.irfft(target_response, NFFT)[..., mixing:max_len]
    a = torch.fft.irfft(achieved_response, NFFT)[..., mixing:max_len]

    def edc(x):
        return torch.flip(torch.cumsum(torch.flip(x ** 2, dims=[-1]), dim=-1),
                          dims=[-1])

    return torch.mean(
        torch.abs(_torch_db(edc(t), True) - _torch_db(edc(a), True))
    )


def torch_edr_loss(target_response, achieved_response, win=1024, hop=512):
    t = torch.fft.irfft(target_response, NFFT)
    a = torch.fft.irfft(achieved_response, NFFT)
    w = torch.hann_window(win)  # periodic, the reference's default
    st = torch.stft(t, win, hop, win_length=win, window=w, center=False,
                    return_complex=True)
    sa = torch.stft(a, win, hop, win_length=win, window=w, center=False,
                    return_complex=True)

    def edr(s):
        p = torch.abs(s) ** 2
        return _torch_db(
            torch.flip(torch.cumsum(torch.flip(p, dims=[-1]), dim=-1), dims=[-1]),
            True,
        )

    et, ea = edr(st), edr(sa)
    freq_loss = torch.sum(torch.abs(et - ea), dim=-1)
    if et.ndim == 3:
        per_item = torch.sum(freq_loss, dim=-1) / torch.sum(
            torch.abs(et), dim=[-2, -1]
        )
        return torch.sum(per_item)
    return torch.sum(freq_loss) / torch.sum(torch.abs(et))


def _spectra(batch=3, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(NFFT) / FS
    env = np.exp(-t * np.log(1e6) / 0.25)
    rirs = rng.randn(batch, NFFT) * np.sqrt(env)
    rirs2 = rng.randn(batch, NFFT) * np.sqrt(env) * 0.8
    return (
        np.fft.rfft(rirs, NFFT, -1).astype(np.complex64),
        np.fft.rfft(rirs2, NFFT, -1).astype(np.complex64),
    )


def test_edc_loss_parity_within_1e3():
    target, achieved = _spectra()
    mixing, max_len = 320, 4000
    ours = float(
        edc_loss(jnp.asarray(target), jnp.asarray(achieved), mixing, max_len)
    )
    ref = float(
        torch_edc_loss(
            torch.tensor(target), torch.tensor(achieved), mixing, max_len
        )
    )
    assert abs(ours - ref) < 1e-3, (ours, ref)


def test_edr_loss_parity():
    target, achieved = _spectra(seed=1)
    ours = float(
        edr_loss(jnp.asarray(target), jnp.asarray(achieved),
                 win_size=1024, hop_size=512)
    )
    ref = float(torch_edr_loss(torch.tensor(target), torch.tensor(achieved)))
    # STFT framing conventions match (win=2*hop, no centering); tolerance
    # covers float32 accumulation differences across backends
    assert abs(ours - ref) / abs(ref) < 1e-3, (ours, ref)


def test_colorless_loss_parity():
    rng = np.random.RandomState(2)
    h = (rng.randn(257) + 1j * rng.randn(257)).astype(np.complex64)
    ones = np.ones(257, np.complex64)

    ours_mse = float(mse_loss(jnp.asarray(h), jnp.asarray(ones)))
    ref_mse = float(
        torch.mean((torch.abs(torch.tensor(h)) - 1.0) ** 2)
    )
    assert abs(ours_mse - ref_mse) < 1e-5

    ours_amse = float(amse_loss(jnp.asarray(h), jnp.asarray(ones)))
    # torch amse: power 4 where |h| - 1 > 1
    diff = torch.abs(torch.tensor(h)) - 1.0
    exp = 2.0 + 2.0 * (diff > 1.0).float()
    ref_amse = float(torch.mean(torch.abs(diff) ** exp))
    assert abs(ours_amse - ref_amse) < 1e-4

    a = np.linalg.qr(rng.randn(8, 8))[0].astype(np.float32)
    ours_sp = float(sparsity_loss(jnp.asarray(a)))
    n = 8
    ref_sp = float(
        -(torch.sum(torch.abs(torch.tensor(a))) - n * np.sqrt(n))
        / (n * (np.sqrt(n) - 1))
    )
    assert abs(ours_sp - ref_sp) < 1e-5


def test_schroeder_parity():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 1000).astype(np.float32)
    from diffgfdn_tpu.ops.basic import schroeder_backward_int

    ours = np.asarray(schroeder_backward_int(jnp.asarray(x)))
    ref = torch.flip(
        torch.cumsum(torch.flip(torch.tensor(x) ** 2, dims=[-1]), dim=-1),
        dims=[-1],
    ).numpy()
    assert np.allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_directional_edc_loss_sh_path_matches_directional_path():
    """irfft-then-beamform == beamform-then-irfft (linear ops commute)."""
    import jax.numpy as jnp

    from diffgfdn_tpu.losses import (
        directional_edc_loss,
        directional_edc_loss_from_sh,
    )

    rng = np.random.RandomState(0)
    b, l, j, f = 3, 9, 12, 257
    h_sh = (rng.randn(b, l, f) + 1j * rng.randn(b, l, f)).astype(np.complex64)
    analysis = rng.randn(j, l).astype(np.float32) / np.sqrt(l)
    amps = (0.1 + rng.rand(b, j, 2)).astype(np.float32)
    t_env = 400
    t_ax = np.arange(t_env) / 8000.0
    env = np.stack([
        np.exp(-t_ax * np.log(1e6) / 0.1), np.exp(-t_ax * np.log(1e6) / 0.3)
    ]).astype(np.float32)

    h_dir = np.einsum("jl,blk->bjk", analysis, h_sh)
    a = float(directional_edc_loss(
        jnp.asarray(h_dir), jnp.asarray(amps), jnp.asarray(env), 32, 380
    ))
    b_ = float(directional_edc_loss_from_sh(
        jnp.asarray(h_sh), analysis, jnp.asarray(amps), jnp.asarray(env),
        32, 380,
    ))
    assert abs(a - b_) < 1e-4 * max(1.0, abs(a)), (a, b_)


def test_frequency_weighting_emphasizes_low_frequencies():
    """EDR frequency weights fall from ~top below the cutoff to ~bottom
    above it. Regression: the (top, bottom) arguments used to be passed
    swapped — the same swap the reference's own call site has
    (losses.py:426-428), contradicting its "more weight on the lower
    frequency loss" intent — which emphasized HIGH frequencies instead."""
    from diffgfdn_tpu.losses import frequency_weighting

    freqs = np.linspace(0.0, 16000.0, 257)
    w = np.asarray(frequency_weighting(freqs, cutoff_freq_hz=1e3,
                                       top=2.0, bottom=1.0))
    assert abs(w[0] - 2.0) < 0.1            # low end near top
    assert abs(w[-1] - 1.0) < 0.05          # high end near bottom
    assert np.all(np.diff(w) <= 1e-6)       # monotone decreasing


def test_edc_loss_window_extends_past_bin_count():
    """The EDC window is clamped at the irfft LENGTH 2(F-1), not at the
    bin count F. Regression: a max_ir_len in (F, 2(F-1)] — the common
    case, since num_freq_bins is the next pow2 of maxT60*fs — used to be
    silently clamped to F, ignoring the last part of the decay."""
    from diffgfdn_tpu.losses import edc_loss as jx_edc_loss

    F = 513
    n = 2 * (F - 1)  # 1024 time samples
    rng = np.random.RandomState(0)
    late = np.zeros(n, np.float32)
    late[F + 50 : F + 60] = rng.randn(10).astype(np.float32)
    target = np.fft.rfft(np.ones(n).astype(np.float32) * 1e-3, n)
    achieved = np.fft.rfft(late + 1e-3, n)
    # energy differing ONLY in samples (F, n): a window clamped at F sees
    # identical signals and returns ~0
    loss = float(
        jx_edc_loss(
            jnp.asarray(target.astype(np.complex64)),
            jnp.asarray(achieved.astype(np.complex64)),
            mixing_time_samps=0,
            max_ir_len_samps=n,
        )
    )
    assert loss > 1.0
