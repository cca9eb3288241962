"""Per-stage time attribution at the PRODUCTION bench configuration.

PERF.md's stage shares were measured at frames=256 (blanker 34 %); the
winning bench config is frames=2048/k=48 and XLA fuses differently at
that scale — this tool measures the stages that matter there
(VERDICT r3 #7/#8 anchor).

Method: compile cumulative partial chains at the bench geometry and
time each with the same K-steps-per-dispatch batching bench.py uses;
stage cost = difference of successive cumulative times.  Partial
chains are real jitted programs (state threaded through lax.scan), so
each addition pays its true fused cost, not a synthetic microbenchmark.

Run on the TPU:    python tools/stage_attribution.py
Logic check (CPU): JAX_PLATFORMS=cpu python tools/stage_attribution.py --quick
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_partial(stop: str, p, geo, tables, pw):
    """A jitted k-step scan of the chain truncated after `stop`."""
    import jax
    import jax.numpy as jnp

    from linrad_tpu.ops import blanker as blanker_ops
    from linrad_tpu.ops import sellim as sellim_ops
    from linrad_tpu.ops.fft1 import fft1_step
    from linrad_tpu.ops.fft2 import fft2_step
    from linrad_tpu.ops.timf2 import timf2_step
    from linrad_tpu.pipeline.chain import (NBState, RxState,
                                           narrowband_tail)

    step_seconds = geo.samples_per_step / geo.timf1_sampling_speed

    def one(tables, state: RxState, block, tune_bin):
        s_fft1, fft1_spec, step_power = fft1_step(
            geo, tables.fft1, state.fft1, block, p.fft_avg1num)
        acc = jnp.sum(step_power)
        if stop == "fft1":
            return RxState(**{**state.__dict__, "fft1": s_fft1}), acc
        avg_p = jnp.sum(s_fft1.sumsq_avg, axis=-1)
        s_sellim = sellim_ops.update_liminfo(
            geo, state.sellim, avg_p, p.sellim_maxlevel,
            ston=p.sellim_ston)
        wgain, sgain = sellim_ops.liminfo_gains(s_sellim.liminfo)
        s_timf2, weak, strong, wpwr = timf2_step(
            geo, tables.timf2_syn, state.timf2, fft1_spec, wgain, sgain)
        acc = acc + jnp.sum(wpwr[:8])
        new = {**state.__dict__, "fft1": s_fft1, "sellim": s_sellim,
               "timf2": s_timf2}
        if stop == "timf2":
            return RxState(**new), acc
        nf = state.blanker.noise_floor
        s_blank = blanker_ops.update_noise_floor(state.blanker, wpwr,
                                                 step_seconds)
        weak, wpwr, n_fit = blanker_ops.clever_blanker(
            weak, wpwr, tables.blanker, nf, p.clever_bln_limit, pw,
            p.max_pulses_per_block, block_size=p.blanker_block_size,
            rounds=p.blanker_rounds)
        weak, wpwr, _nc = blanker_ops.stupid_blanker(
            weak, wpwr, nf, p.stupid_bln_limit, pw)
        acc = acc + jnp.sum(wpwr[:8]) + n_fit
        new["blanker"] = s_blank
        if stop == "blanker":
            return RxState(**new), acc
        s_fft2, fftx_spec, fft2_power = fft2_step(
            geo, tables.fft2, state.fft2, weak, strong, p.fft_avg1num)
        acc = acc + jnp.sum(fft2_power)
        new["fft2"] = s_fft2
        if stop == "fft2":
            return RxState(**new), acc
        nb, audio, _bb, _g = narrowband_tail(
            geo, p, tables, NBState.from_rx(state), fftx_spec, tune_bin)
        new.update(mix1=nb.mix1, fft3=nb.fft3, mix2=nb.mix2, bfo=nb.bfo,
                   am=nb.am, fm=nb.fm, coh=nb.coh, agc=nb.agc,
                   squelch=nb.squelch, pol=nb.pol, mix2_fir=nb.mix2_fir)
        acc = acc + jnp.sum(audio)
        return RxState(**new), acc

    def run_k(tables, state, blocks, tune):
        def body(s, blk):
            s, acc = one(tables, s, blk, tune)
            return s, acc
        return jax.lax.scan(body, state, blocks)

    return jax.jit(run_k, donate_argnums=(1,))


def main():
    import jax
    import jax.numpy as jnp

    quick = "--quick" in sys.argv
    if quick:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from linrad_tpu import derive_geometry
    from linrad_tpu.ops.blanker import BlankerTables
    from linrad_tpu.pipeline.chain import RxState, RxTables

    p = bench._params(
        blanker_rounds=8,
        target_fft1_frames_per_step=(64 if quick else 2048),
        max_pulses_per_block=(16 if quick else 512))
    geo = derive_geometry(p)
    tables = RxTables.create(geo, p)
    _, pw = BlankerTables.create(geo)
    k = 4 if quick else 48
    n = geo.samples_per_step
    rng = np.random.default_rng(0)
    t = np.arange(n)
    sig = (np.exp(2j * np.pi * 0.13 * t)
           + 0.02 * (rng.normal(size=n) + 1j * rng.normal(size=n))
           ).astype(np.complex64)
    sig[::9973] += 30.0
    blocks = jnp.asarray(
        np.broadcast_to(sig[None, :, None], (k, n, 1)).copy())
    tune = jnp.asarray(1024, jnp.int32)
    stages = ["fft1", "timf2", "blanker", "fft2", "full"]
    times = {}
    for stop in stages:
        fn = build_partial(stop, p, geo, tables, pw)
        state = RxState.create(geo)
        state, accs = fn(tables, state, blocks, tune)   # compile+warm
        jax.block_until_ready(accs)
        reps = 1 if quick else 16
        wins = 2 if quick else 6
        best = float("inf")
        for _ in range(wins):
            state = RxState.create(geo)
            t0 = time.perf_counter()
            for _ in range(reps):
                state, accs = fn(tables, state, blocks, tune)
            jax.block_until_ready(accs)
            best = min(best, (time.perf_counter() - t0) / reps)
        times[stop] = best
        print(f"cumulative through {stop}: {best * 1e3:.3f} ms/dispatch",
              flush=True)
    full = times["full"]
    shares = {}
    prev = 0.0
    for stop in stages:
        shares[stop] = (times[stop] - prev) / full
        prev = times[stop]
    print(json.dumps({"config": {
        "frames": geo.fft1_frames_per_step, "k": k,
        "rounds": p.blanker_rounds},
        "cumulative_s": times, "stage_share": shares}))


if __name__ == "__main__":
    main()
