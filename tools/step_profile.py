"""Chained component-timing decomposition of the tracked train steps.

Produces the measured numbers behind DESIGN.md's "Flagship-step profile
analysis" and "Band-parallel-step profile analysis" (the same methodology
as the round-3 directional analysis at DESIGN.md "Directional-step profile
analysis"): every probe is a jitted ``state -> state`` function chained
through its own outputs with a bounded multiplicative perturbation large
enough not to underflow in f32 — so the tunnel's replay cache cannot serve
repeats — run as pipelined loops of ``iters`` dispatches with a single
``block_until_ready`` at the end. Best-of-``reps`` is reported: the chip
is tunnel-shared and contention adds additive noise between reps.

Usage (on the real chip; CPU works for methodology checks):

    python tools/step_profile.py fullband
    python tools/step_profile.py band_parallel

Reference scale: BASELINE.md flagship (nfft 131072, batch 32, N = 12,
3 coupled groups) — the same setup bench.py times end-to-end.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (repo-root bench: constants + batch builder)
from bench import BATCH, DELAYS, FS, NFFT, NUM_GROUPS, T60S, log  # noqa: E402


def timed(fn, state, iters=12, reps=4, name=""):
    """Best-of-reps mean ms/dispatch of the chained jitted fn."""
    import jax

    t0 = time.time()
    state = fn(state)  # compile + warm
    jax.block_until_ready(state)
    if name:
        log(f"  [{name}] compiled in {time.time() - t0:.1f}s")
    best = float("inf")
    meds = []
    for _ in range(reps):
        t0 = time.time()
        s = state
        for _ in range(iters):
            s = fn(s)
        jax.block_until_ready(s)
        dt = (time.time() - t0) / iters
        meds.append(dt)
        best = min(best, dt)
        state = s
    return best * 1e3, float(np.median(meds) * 1e3)


def _scale_tree(params, s):
    """Bounded, f32-safe chained perturbation of a param pytree."""
    import jax
    import jax.numpy as jnp

    f = 1.0 + 1e-5 * jnp.tanh(s)
    return jax.tree_util.tree_map(lambda p: p * f, params)


def _report(name, probes):
    log(f"\n=== {name} decomposition (best ms / median ms) ===")
    out = {}
    for k, (best, med) in probes.items():
        log(f"  {k:34s} {best:8.2f}   {med:8.2f}")
        out[k] = {"best_ms": round(best, 3), "median_ms": round(med, 3)}
    print(json.dumps({"config": name, "probes": out}))


def profile_fullband(svf: bool = False):
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.data.batching import BatchArrays
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.training.optim import make_optimizer
    from diffgfdn_tpu.training.trainer import GFDNTrainer, decode_batch
    from diffgfdn_tpu.utils.cio import init_with_batch
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    log("devices:", jax.devices())
    f = NFFT // 2 + 1
    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            T60S[k], np.asarray(DELAYS[4 * k: 4 * k + 4]), FS))
        for k in range(NUM_GROUPS)
    ])
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS, num_groups=NUM_GROUPS, delays=DELAYS, gains=gains,
        use_svf_in_output=svf, num_hidden_layers=3, num_neurons=128,
        num_fourier_features=10, use_pallas_inverse=placement_is_tpu(),
    )
    cfg = TrainerConfig(batch_size=BATCH, num_freq_bins=NFFT, max_epochs=1,
                        lr=1e-3, use_reg_loss=svf)
    trainer = GFDNTrainer(model, cfg, steps_per_epoch=21,
                          common_decay_times=np.asarray(T60S), sample_rate=FS)
    raw = bench.make_batch(f)
    arrays = BatchArrays(
        z_values=raw["z_values"],
        source_position=raw["source_position"],
        listener_position=raw["listener_position"],
        norm_listener_position=raw["norm_listener_position"],
        target_early_response=raw["target_early_response"],
        target_late_response=raw["target_rir_response"],
        target_rir_response=raw["target_rir_response"],
    )
    trainer.precompute_target_features(arrays)
    params = init_with_batch(model, jax.random.PRNGKey(0), raw)
    trainer.optimizer = make_optimizer(cfg, params, 21)
    opt_state = trainer.optimizer.init(params)
    data = trainer.upload_arrays(arrays)
    idx = jnp.arange(BATCH, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)
    probes = {}

    # 1. the full production step (fwd + bwd + Adam), naturally chained
    step = jax.jit(trainer._make_indexed_step(True))

    def full(state):
        p, o = state
        p, o, total, _ = step(p, o, data, idx, key)
        return (p, o)

    probes["full_step"] = timed(full, (params, opt_state), name="full_step")

    # 2. fwd + bwd only (tiny SGD keeps the chain; its axpy over ~1e5
    #    params is negligible against the step)
    def loss_fn(p, batch, k):
        all_losses = trainer._losses(p, batch, k)
        return sum(all_losses.values())

    @jax.jit
    def fwdbwd(state):
        (p,) = state
        batch = decode_batch(trainer._gather_device(data, idx))
        total, g = jax.value_and_grad(loss_fn)(p, batch, key)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)
        return (p,)

    probes["fwd_bwd"] = timed(fwdbwd, (params,), name="fwd_bwd")

    # 3. fwd only (full loss value)
    @jax.jit
    def fwd(state):
        (p,) = state
        batch = decode_batch(trainer._gather_device(data, idx))
        total = loss_fn(p, batch, key)
        return (_scale_tree(p, total),)

    probes["fwd_loss"] = timed(fwd, (params,), name="fwd_loss")

    # 4. model forward only (solve + MLP heads + assembly), cheap reduction
    @jax.jit
    def fwd_model(state):
        (p,) = state
        batch = decode_batch(trainer._gather_device(data, idx))
        h, _ = trainer._model_outputs(p, batch)
        s = jnp.mean(jnp.real(h) ** 2 + jnp.imag(h) ** 2)
        return (_scale_tree(p, s),)

    probes["fwd_model_only"] = timed(fwd_model, (params,), name="fwd_model_only")

    # 5. model forward + backward, cheap reduction
    @jax.jit
    def fwdbwd_model(state):
        (p,) = state

        def m(pp):
            batch = decode_batch(trainer._gather_device(data, idx))
            h, _ = trainer._model_outputs(pp, batch)
            return jnp.mean(jnp.real(h) ** 2 + jnp.imag(h) ** 2)

        _, g = jax.value_and_grad(m)(p)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)
        return (p,)

    probes["fwd_bwd_model_only"] = timed(fwdbwd_model, (params,), name="fwd_bwd_model_only")

    # 6. loss side only: losses evaluated on a FIXED achieved spectrum,
    #    driven by one scalar so fwd AND bwd are measurable. h0 is the
    #    real model output (right sparsity/scale for the EDC tail).
    #    NB: everything complex stays inside jit — the axon backend has no
    #    eager complex ops (utils/cio.py).
    @jax.jit
    def _h0ri(p):
        batch = decode_batch(trainer._gather_device(data, idx))
        h = trainer._model_outputs(p, batch)[0]
        return jnp.stack([jnp.real(h), jnp.imag(h)], -1)

    h0ri = _h0ri(params)

    def losses_of_scale(c, batch):
        h = (h0ri[..., 0] * c) + 1j * (h0ri[..., 1] * c)
        orig = trainer._model_outputs
        try:
            trainer._model_outputs = lambda p, b: (h, None)
            # real params ride along: the svf-mode reg-loss branch
            # evaluates the head from params even with the response frozen
            total = sum(trainer._losses(params, batch, key).values())
        finally:
            trainer._model_outputs = orig
        return total

    @jax.jit
    def loss_side(state):
        (c,) = state
        batch = decode_batch(trainer._gather_device(data, idx))
        total = losses_of_scale(c, batch)
        return (1.0 + 1e-5 * jnp.tanh(total),)

    probes["loss_side_fwd"] = timed(loss_side, (jnp.float32(1.0),), name="loss_side_fwd")

    @jax.jit
    def loss_side_bwd(state):
        (c,) = state
        batch = decode_batch(trainer._gather_device(data, idx))
        total, g = jax.value_and_grad(
            lambda cc: losses_of_scale(cc, batch))(c)
        return (1.0 + 1e-5 * jnp.tanh(total + 0.0 * g),)

    probes["loss_side_fwd_bwd"] = timed(loss_side_bwd, (jnp.float32(1.0),), name="loss_side_fwd_bwd")

    # 7. the loss-shape irfft alone: (B, 65537) -> 131072
    @jax.jit
    def irfft_probe(state):
        (x,) = state
        h = x[..., 0] + 1j * x[..., 1]
        y = jnp.fft.irfft(h, NFFT, axis=-1)
        s = jnp.mean(jnp.abs(y))
        return (x * (1.0 + 1e-5 * jnp.tanh(s)),)

    probes["irfft_B_F"] = timed(irfft_probe, (h0ri,), name="irfft_B_F")

    # 8. optimizer update alone (Adam m/v + apply over ~1e5 params)
    g0 = jax.jit(lambda p: jax.grad(
        lambda pp: loss_fn(
            pp, decode_batch(trainer._gather_device(data, idx)), key))(p)
    )(params)

    @jax.jit
    def opt_probe(state):
        p, o, s = state
        # sin keeps the perturbation non-saturating over any chain length
        f = 1.0 + 1e-5 * jnp.sin(s)
        g = jax.tree_util.tree_map(lambda a: a * f, g0)
        updates, o = trainer.optimizer.update(g, o, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
        return (p, o, s + 1.0)

    probes["optimizer_only"] = timed(opt_probe, (params, opt_state, jnp.float32(0.0)), name="optimizer_only")

    # 9. on-device batch gather + complex decode alone
    @jax.jit
    def gather_probe(state):
        (s,) = state
        batch = decode_batch(trainer._gather_device(data, idx))
        tot = sum(jnp.sum(jnp.abs(v)) if jnp.iscomplexobj(v)
                  else jnp.sum(v) for v in batch.values())
        return (s + 1e-12 * tot,)

    probes["gather_decode_only"] = timed(gather_probe, (jnp.float32(0.0),), name="gather_decode_only")

    if svf:
        # SVF head response alone: MLP -> biquad cascades -> (B, G, F)
        def _head_resp(m, x):
            return m.output_filters(x)

        @jax.jit
        def head_probe(state):
            (p,) = state
            batch = decode_batch(trainer._gather_device(data, idx))
            resp = model.apply(p, batch, method=_head_resp)
            s = jnp.mean(jnp.real(resp) ** 2 + jnp.imag(resp) ** 2)
            return (_scale_tree(p, s),)

        probes["svf_head_fwd_only"] = timed(
            head_probe, (params,), name="svf_head_fwd_only")

        @jax.jit
        def head_bwd_probe(state):
            (p,) = state

            def m(pp):
                batch = decode_batch(trainer._gather_device(data, idx))
                resp = model.apply(pp, batch, method=_head_resp)
                return jnp.mean(jnp.real(resp) ** 2 + jnp.imag(resp) ** 2)

            _, g = jax.value_and_grad(m)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)
            return (p,)

        probes["svf_head_fwd_bwd"] = timed(
            head_bwd_probe, (params,), name="svf_head_fwd_bwd")

        # aliasing reg loss alone (head params -> biquad IR energy tail)
        from diffgfdn_tpu.losses.gfdn import reg_loss
        from diffgfdn_tpu.ops.basic import ms_to_samps

        reg_len = ms_to_samps(cfg.output_filt_ir_len_ms, FS)

        @jax.jit
        def reg_probe(state):
            (p,) = state

            def m(pp):
                batch = decode_batch(trainer._gather_device(data, idx))
                head = model.apply(
                    pp, batch, method=type(model).output_filter_params)
                return reg_loss(head["biquad_num"], head["biquad_den"],
                                reg_len)

            _, g = jax.value_and_grad(m)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)
            return (p,)

        probes["reg_loss_fwd_bwd"] = timed(
            reg_probe, (params,), name="reg_loss_fwd_bwd")

    _report("svf" if svf else "fullband", probes)


def _band_setup():
    """Shared 8-band bench-scale setup for the band_parallel/band_loss modes."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.config.schema import TrainerConfig
    from diffgfdn_tpu.data.batching import BatchArrays
    from diffgfdn_tpu.models import DiffGFDNVarReceiverPos
    from diffgfdn_tpu.ops.absorption import decay_times_to_gain_per_sample
    from diffgfdn_tpu.ops.filterbanks import subband_filter_response
    from diffgfdn_tpu.parallel.band_parallel import BandParallelTrainer
    from diffgfdn_tpu.utils.placement import placement_is_tpu

    log("devices:", jax.devices())
    f = NFFT // 2 + 1
    centres = [62.5 * 2.0 ** k for k in range(8)]
    band_resps = np.stack([
        subband_filter_response(fc, (min(centres), max(centres)), 1, FS, NFFT)
        for fc in centres
    ])
    gains = np.concatenate([
        np.asarray(decay_times_to_gain_per_sample(
            T60S[k], np.asarray(DELAYS[4 * k: 4 * k + 4]), FS))
        for k in range(NUM_GROUPS)
    ])
    model = DiffGFDNVarReceiverPos(
        sample_rate=FS, num_groups=NUM_GROUPS, delays=DELAYS, gains=gains,
        use_svf_in_output=False, num_hidden_layers=3, num_neurons=128,
        num_fourier_features=10, use_pallas_inverse=placement_is_tpu(),
    )
    cfg = TrainerConfig(batch_size=BATCH, num_freq_bins=NFFT, max_epochs=1,
                        lr=1e-3)
    trainer = BandParallelTrainer(model, cfg, band_resps, steps_per_epoch=21,
                                  max_ir_len_ms=float(max(T60S)) * 1e3)
    raw = bench.make_batch(f)
    arrays = BatchArrays(
        z_values=raw["z_values"],
        source_position=raw["source_position"],
        listener_position=raw["listener_position"],
        norm_listener_position=raw["norm_listener_position"],
        target_early_response=raw["target_early_response"],
        target_late_response=raw["target_rir_response"],
        target_rir_response=raw["target_rir_response"],
    )
    small = dict(raw)
    small["z_values"] = raw["z_values"][:2049]
    small["target_early_response"] = raw["target_early_response"][:, :2049]
    params, opt_state = trainer.init(small, seeds=list(range(8)))
    trainer.precompute_band_target_features(arrays)
    data = trainer.upload_arrays(arrays)
    band_feats = trainer._band_feats if trainer._band_feats is not None else {}
    return dict(
        model=model, trainer=trainer, params=params, opt_state=opt_state,
        data=data, band_feats=band_feats,
        band_resps_dev=trainer._band_resps_dev,
        idx=jnp.arange(BATCH, dtype=jnp.int32), key=jax.random.PRNGKey(1),
        active=jnp.ones(8, jnp.float32),
    )


def profile_band_parallel():
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.training.trainer import decode_batch

    s = _band_setup()
    model, trainer = s["model"], s["trainer"]
    params, opt_state = s["params"], s["opt_state"]
    data, band_feats = s["data"], s["band_feats"]
    band_resps_dev, idx, key, active = (
        s["band_resps_dev"], s["idx"], s["key"], s["active"])
    probes = {}

    # 1. the full 8-band fused step
    step = jax.jit(trainer._make_indexed_step())

    def full(state):
        p, o = state
        p, o, total, _ = step(p, o, data, band_feats, band_resps_dev, idx,
                              key, active)
        return (p, o)

    probes["full_step_8band"] = timed(full, (params, opt_state), iters=6, name="full_step_8band")

    # 2. vmapped fwd only (all 8 band losses)
    vstep = jax.jit(trainer._make_indexed_valid())

    def fwd(state):
        (p,) = state
        total, _ = vstep(p, data, band_feats, band_resps_dev, idx, key)
        return (_scale_tree(p, jnp.sum(total)),)

    probes["fwd_loss_8band"] = timed(fwd, (params,), iters=6, name="fwd_loss_8band")

    # 3. vmapped fwd + bwd, no optimizer
    loss_fn = trainer._loss_fn
    gather = trainer._gather
    gather_feats = trainer._gather_feats

    @jax.jit
    def fwdbwd(state):
        (p,) = state
        enc = gather(data, idx)
        feats = gather_feats(band_feats, idx)

        def band(pp, ff, br):
            batch = {**decode_batch(enc), **ff}
            (tot, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                pp, batch, br, key)
            return tot, g

        tot, g = jax.vmap(band)(p, feats, band_resps_dev)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, p, g)
        return (p,)

    probes["fwd_bwd_8band"] = timed(fwdbwd, (params,), iters=6, name="fwd_bwd_8band")

    # 4. vmapped model forward only (8 solves + heads + band filtering)
    @jax.jit
    def fwd_model(state):
        (p,) = state
        enc = gather(data, idx)

        def band(pp, br):
            batch = decode_batch(enc)
            h = model.apply(pp, batch)
            h = h * br[..., 0] + 1j * (h * br[..., 1])
            return jnp.mean(jnp.real(h) ** 2 + jnp.imag(h) ** 2)

        s = jnp.sum(jax.vmap(band)(p, band_resps_dev))
        return (_scale_tree(p, s),)

    probes["fwd_model_only_8band"] = timed(fwd_model, (params,), iters=6, name="fwd_model_only_8band")

    # 5. single-band step at identical shape: the serial-x8 floor reference
    #    (band-0 slices taken inside jit — no eager ops on axon)
    @jax.jit
    def _band0(p, o):
        take = jax.tree_util.tree_map
        return take(lambda a: a[0], p), take(lambda a: a[0], o)

    one_params, one_opt = _band0(params, opt_state)

    @jax.jit
    def one_step(state):
        p, o = state
        enc = gather(data, idx)
        feats = {k: v[0][idx] for k, v in band_feats.items()}
        batch = {**decode_batch(enc), **feats}
        (tot, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, band_resps_dev[0], key)
        updates, o = trainer.optimizer.update(g, o, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
        return (p, o)

    probes["single_band_step"] = timed(one_step, (one_params, one_opt), name="single_band_step")

    _report("band_parallel", probes)


def profile_band_loss():
    """Loss-side decomposition of the 8-band step (the dominant cost)."""
    import jax
    import jax.numpy as jnp

    from diffgfdn_tpu.losses.gfdn import edc_loss_from_rir, edr_loss_from_rir
    from diffgfdn_tpu.training.trainer import decode_batch

    s = _band_setup()
    model, trainer = s["model"], s["trainer"]
    params = s["params"]
    data, band_feats = s["data"], s["band_feats"]
    band_resps_dev, idx = s["band_resps_dev"], s["idx"]
    gather = trainer._gather
    gather_feats = trainer._gather_feats
    mixing, max_len = trainer._mixing, trainer._max_len
    win, hop = trainer._edr_win, trainer._edr_hop
    probes = {}

    # frozen band-filtered achieved response (8, B, F, 2), computed once
    @jax.jit
    def _h0ri(p):
        enc = gather(data, idx)

        def band(pp, br):
            h = model.apply(pp, decode_batch(enc))
            h = h * br[..., 0] + 1j * (h * br[..., 1])
            return jnp.stack([jnp.real(h), jnp.imag(h)], -1)

        return jax.vmap(band)(p, band_resps_dev)

    h0ri = _h0ri(params)
    n = 2 * (h0ri.shape[-2] - 1)
    end = min(max_len, n)

    # h0ri (134 MB) MUST ride the probe state, not the closure: the axon
    # remote-compile request serializes closed-over constants and 413s
    def make_loss(barrier, do_edc, do_edr):
        def per_band(hri, feats):
            h = hri[..., 0] + 1j * hri[..., 1]
            rir = jnp.fft.irfft(h, n, axis=-1)
            if barrier:
                rir = jax.lax.optimization_barrier(rir)
            tot = jnp.float32(0.0)
            if do_edc:
                tot = tot + edc_loss_from_rir(
                    feats["target_edc_db"], rir[..., mixing:end])
            if do_edr:
                tot = tot + edr_loss_from_rir(
                    feats["target_edr_db"], feats["target_edr_abs_sum"],
                    rir, win_size=win, hop_size=hop)
            return tot

        def loss(x, c):
            feats = gather_feats(band_feats, idx)
            return jnp.sum(jax.vmap(per_band)(x * c, feats))

        return loss

    for nm, (barrier, do_edc, do_edr) in {
        "loss8_fwd": (True, True, True),
        "loss8_fwd_nobarrier": (False, True, True),
        "loss8_edc_only": (True, True, False),
        "loss8_edr_only": (True, False, True),
    }.items():
        loss = make_loss(barrier, do_edc, do_edr)

        @jax.jit
        def probe(state, loss=loss):
            x, c = state
            t = loss(x, c)
            return (x, 1.0 + 1e-5 * jnp.tanh(t))

        probes[nm] = timed(probe, (h0ri, jnp.float32(1.0)), iters=6, name=nm)

    loss = make_loss(True, True, True)

    @jax.jit
    def probe_bwd(state):
        x, c = state
        t, g = jax.value_and_grad(loss, argnums=1)(x, c)
        return (x, 1.0 + 1e-5 * jnp.tanh(t + 0.0 * g))

    probes["loss8_fwd_bwd"] = timed(
        probe_bwd, (h0ri, jnp.float32(1.0)), iters=6, name="loss8_fwd_bwd")

    # the loss-shape irfft alone: (8, 32, 65537) -> 131072
    @jax.jit
    def irfft_probe(state):
        (x,) = state
        h = x[..., 0] + 1j * x[..., 1]
        y = jnp.fft.irfft(h, n, axis=-1)
        z = jnp.mean(jnp.abs(y))
        return (x * (1.0 + 1e-5 * jnp.tanh(z)),)

    probes["irfft8"] = timed(irfft_probe, (h0ri,), iters=6, name="irfft8")

    # per-step feature gather alone (135 MB of EDR planes + EDC)
    @jax.jit
    def feats_probe(state):
        (c,) = state
        feats = gather_feats(band_feats, idx)
        t = sum(jnp.sum(v) for v in feats.values())
        return (c + 1e-12 * t,)

    probes["feats_gather_only"] = timed(
        feats_probe, (jnp.float32(0.0),), iters=6, name="feats_gather_only")

    _report("band_loss", probes)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fullband"
    if which == "fullband":
        profile_fullband()
    elif which == "svf":
        profile_fullband(svf=True)
    elif which == "band_parallel":
        profile_band_parallel()
    elif which == "band_loss":
        profile_band_loss()
    else:
        raise SystemExit(f"unknown config {which!r}")
