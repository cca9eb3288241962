"""Fetch-verified kernel-variant bench (r5 timing-integrity follow-up).

Every perf decision before r5 (MXU matmul-DFT default, Pallas fft1
rejection, dispatch-size frontier) was timed with `block_until_ready`,
which on this backend can resolve before the computation's value is
available (docs/PERF.md timing-integrity caveat).  This tool re-times
the load-bearing choices with a TRUE completion barrier: every timing
window ends with a host fetch of a scalar reduced from the final
output, so the measured time provably covers the compute.

Run when the backend's device->host path is healthy:

  python tools/fetch_bench.py            # all comparisons
  python tools/fetch_bench.py fft1       # just the fft1 variant race

Prints one '@@'+JSON line per comparison (same convention bench.py's
subprocess runner parses).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_fetch(fn, out_of, reps: int = 5) -> float:
    """Median seconds per rep; each window barriers on a scalar fetch."""
    import jax
    import jax.numpy as jnp

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(jnp.sum(jnp.abs(out_of(out)))))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_fft_variants(n: int = 2048, batch: int = 3072) -> dict:
    """MXU matmul-DFT vs XLA FFT at the fft1 shape, fetch-verified."""
    import jax
    import jax.numpy as jnp

    from linrad_tpu.ops import fft as fftlib
    from linrad_tpu.utils.xfer import device_complex

    rng = np.random.default_rng(0)
    x = device_complex((rng.normal(size=(batch, n))
                        + 1j * rng.normal(size=(batch, n))
                        ).astype(np.complex64))
    out = {"n": n, "batch": batch}
    reps = 10      # 2*reps transforms per fetch: amortizes the ~29 ms
    for variant in ("mxu", "mxu_bf16", "xla"):

        def f_(a, v=variant):
            y = a
            for _ in range(reps):      # fwd+inv round trips, chained
                y = fftlib.ifft(fftlib.fft(y, variant=v), variant=v)
            return y
        f = jax.jit(f_)
        jax.block_until_ready(f(x))          # compile
        dt = _timed_fetch(lambda: f(x), lambda o: o) / (2 * reps)
        out[f"{variant}_ms"] = round(dt * 1e3, 3)
        out[f"{variant}_gflops"] = round(float(
            batch * (8.0 * n * n if variant.startswith("mxu")
                     else 5.0 * n * np.log2(n)) / dt / 1e9), 1)
    out["mxu_over_xla"] = round(out["xla_ms"] / out["mxu_ms"], 2)
    return out


def bench_chain_fetch(frames: int = 2048, k_steps: int = 8) -> dict:
    """Full-chain throughput with fetch barrier vs block_until_ready,
    plus the single-step version — the dispatch-size story re-measured
    honestly."""
    import bench

    return bench.bench_fetch_verified(
        k_steps=k_steps, dispatches=3, blanker_rounds=8,
        target_fft1_frames_per_step=frames, max_pulses_per_block=512)


def bench_fft1_variant_chain() -> dict:
    """Chain throughput with fft1_variant None (size rule) vs 'xla',
    fetch-verified — re-examines the matmul-DFT default."""
    import bench

    out = {}
    for name, var in (("default", None), ("xla", "xla")):
        try:
            r = bench.bench_fetch_verified(
                k_steps=8, dispatches=3, blanker_rounds=8,
                target_fft1_frames_per_step=2048,
                max_pulses_per_block=512, fft1_variant=var)
            out[name] = r
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    jobs = {
        "fft1": lambda: bench_fft_variants(2048, 3072),
        "fft_small": lambda: bench_fft_variants(256, 4096),
        "chain": bench_chain_fetch,
        "chain_variant": bench_fft1_variant_chain,
    }
    for name, fn in jobs.items():
        if which not in ("all", name):
            continue
        try:
            print("@@" + json.dumps({name: fn()}), flush=True)
        except Exception as e:  # noqa: BLE001
            print("@@" + json.dumps(
                {name: {"error": f"{type(e).__name__}: {e}"}}), flush=True)


if __name__ == "__main__":
    main()
