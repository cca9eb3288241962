"""Fetch-verified flagship-chain execution check (r5).

After the complex-safe indexing rewrite (ops/cplx.py), this tool
answers: does the FULL flagship chain now actually execute on the axon
backend?  It runs the entry() configuration with the pair-gather chain
and fetch-verifies one step (the fetch triggers real execution on this
lazily-executing backend), then times K batched steps fetch-verified —
the first honest chain throughput number.

Prints '@@'+JSON lines; exits 0 only when the chain step's fetch
SUCCEEDED (whatever the timing).  Designed to be retried by a watch
loop through upload-outage bursts.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_bisect(out: dict) -> None:
    """On a chain failure, find the FIRST failing stage composition —
    each probe is fetch-verified so the result reflects real
    execution, maximising the information from one healthy window."""
    import jax
    import jax.numpy as jnp

    from linrad_tpu import RxParams, derive_geometry
    from linrad_tpu.ops.blanker import BlankerTables
    from linrad_tpu.ops.fft1 import fft1_step
    from linrad_tpu.pipeline.chain import (RxState, RxTables,
                                           make_rx_step)
    from linrad_tpu.utils.xfer import device_complex

    def sub(name, **kw):
        try:
            p = RxParams(rx_ad_speed=96_000, first_fft_bandwidth=100.0,
                         mix1_bandwidth_reduction_n=4,
                         clever_bln_limit=6.0, stupid_bln_limit=4.0,
                         max_pulses_per_block=64, **kw)
            geo = derive_geometry(p)
            tables = RxTables.create(geo, p)
            state = RxState.create(geo)
            pw = 2
            if geo.second_fft_enable:
                _, pw = BlankerTables.create(geo)
            stp = jax.jit(make_rx_step(geo, p, blanker_pulsewidth=pw))
            rng = np.random.default_rng(0)
            blk = device_complex(
                (rng.normal(size=(geo.samples_per_step, 1))
                 + 1j * rng.normal(size=(geo.samples_per_step, 1))
                 ).astype(np.complex64))
            _, o = stp(tables, state, blk, jnp.asarray(256, jnp.int32))
            float(np.asarray(jnp.sum(jnp.abs(o.audio))
                             .astype(jnp.float32)))
            out[name] = "OK"
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAIL {type(e).__name__} {str(e)[:60]}"

    sub("stage_narrowband_only", second_fft_enable=False,
        blanker_enable=False, agc_enable=False)
    sub("stage_plus_fft2", second_fft_enable=True,
        blanker_enable=False, agc_enable=False)
    sub("stage_plus_blanker", second_fft_enable=True,
        blanker_enable=True, agc_enable=False)
    # fft1_step alone (the framing + window + DFT front end)
    try:
        p = RxParams(rx_ad_speed=96_000, first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4,
                     second_fft_enable=False, blanker_enable=False,
                     agc_enable=False)
        geo = derive_geometry(p)
        tables = RxTables.create(geo, p)
        state = RxState.create(geo)
        rng = np.random.default_rng(0)
        blk = device_complex(
            (rng.normal(size=(geo.samples_per_step, 1))
             + 1j * rng.normal(size=(geo.samples_per_step, 1))
             ).astype(np.complex64))
        f = jax.jit(lambda s, b: fft1_step(geo, tables.fft1, s, b,
                                           p.fft_avg1num))
        _, spec, _pw = f(state.fft1, blk)
        float(np.asarray(jnp.sum(jnp.abs(spec)).astype(jnp.float32)))
        out["stage_fft1_only"] = "OK"
    except Exception as e:  # noqa: BLE001
        out["stage_fft1_only"] = f"FAIL {type(e).__name__} {str(e)[:60]}"


def main() -> int:
    import jax
    import jax.numpy as jnp

    out: dict = {}
    try:
        x = jnp.asarray(np.ones(8, np.float32))
        float(np.asarray(jnp.sum(x)))
    except Exception as e:  # noqa: BLE001
        print("@@" + json.dumps(
            {"health": f"FAIL {type(e).__name__} {str(e)[:60]}"}),
            flush=True)
        return 1

    import __graft_entry__ as ge

    # the backend's failure bursts are sub-minute; retry the whole
    # setup+first-step IN-PROCESS (imports are the expensive part —
    # each retry after them is cheap)
    last_err = None
    for attempt in range(6):
        t0 = time.perf_counter()
        try:
            step, (tables, state, block, tune) = ge.entry()
            stepj = jax.jit(step)
            state2, o = stepj(tables, state, block, tune)
            s = float(np.asarray(jnp.sum(jnp.abs(o.audio))
                                 .astype(jnp.float32)))
            dt = time.perf_counter() - t0
            out["chain_step"] = {
                "ok": True, "first_fetch_s": round(dt, 2),
                "audio_sum": round(s, 4), "attempt": attempt,
                "finite": bool(np.isfinite(s))}
            break
        except Exception as e:  # noqa: BLE001
            last_err = f"{type(e).__name__} {str(e)[:80]}"
            print("@@" + json.dumps({"attempt": attempt,
                                     "err": last_err}), flush=True)
            time.sleep(20)
    else:
        out["chain_step"] = {"ok": False, "err": last_err}
        print("@@" + json.dumps(out), flush=True)
        _stage_bisect(out)
        print("@@" + json.dumps(out), flush=True)
        return 2
    print("@@" + json.dumps(out), flush=True)

    # steady-state fetch-verified single-step rate (state threads, each
    # fetch barriers true completion)
    n = block.shape[0]
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        state2, o = stepj(tables, state2, block, tune)
    float(np.asarray(jnp.sum(jnp.abs(o.audio)).astype(jnp.float32)))
    dt = time.perf_counter() - t0
    out["single_step"] = {
        "msps_fetch_verified": round(reps * n / dt / 1e6, 2),
        "reps": reps}
    print("@@" + json.dumps(out), flush=True)

    # batched runner, fetch-verified
    try:
        import bench
        fv = bench.bench_fetch_verified(
            k_steps=8, dispatches=3, blanker_rounds=8,
            target_fft1_frames_per_step=2048, max_pulses_per_block=512)
        out["batched"] = fv
    except Exception as e:  # noqa: BLE001
        out["batched"] = {"err": f"{type(e).__name__} {str(e)[:80]}"}
    print("@@" + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
