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

    step, (tables, state, block, tune) = ge.entry()
    stepj = jax.jit(step)
    t0 = time.perf_counter()
    try:
        state2, o = stepj(tables, state, block, tune)
        s = float(np.asarray(jnp.sum(jnp.abs(o.audio))
                             .astype(jnp.float32)))
        dt = time.perf_counter() - t0
        out["chain_step"] = {
            "ok": True, "first_fetch_s": round(dt, 2),
            "audio_sum": round(s, 4),
            "finite": bool(np.isfinite(s))}
    except Exception as e:  # noqa: BLE001
        out["chain_step"] = {"ok": False,
                             "err": f"{type(e).__name__} {str(e)[:80]}"}
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
