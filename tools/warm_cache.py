"""Pre-compile the benchmark HLOs into the persistent cache.

Fresh TPU compiles on this backend are intermittently broken or take
minutes (CLAUDE.md); bench.py therefore prefers executables that are
already in the persistent compile cache.  Any change to the traced step
signature invalidates those entries, so run this right after such a
change — while compiles are healthy — to re-warm:

  1. the driver entry() flagship step,
  2. the top bench_tpu_batched candidates (k=48 and k=32 at
     frames=2048),
  3. the bounded-latency configuration,
  4. the TPU-parity gate step (tools/tpu_parity.py uses entry()'s HLO).

Each target compiles and executes once; timings are printed so compile
health is visible.  Safe to re-run any time (cache hits are seconds).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def _timed(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"warm {name}: ok in {time.time() - t0:.0f}s", flush=True)
    except Exception as e:  # keep warming the rest
        print(f"warm {name}: FAILED after {time.time() - t0:.0f}s: "
              f"{type(e).__name__}: {e}", flush=True)


def warm_entry():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def warm_batched(k_steps: int):
    import bench

    bench.bench_tpu_batched(
        k_steps=k_steps, dispatches=1, windows=1, blanker_rounds=8,
        target_fft1_frames_per_step=2048, max_pulses_per_block=512)


def warm_latency():
    from linrad_tpu.pipeline.latency import latency_params, measure_latency

    measure_latency(latency_params(second_fft=True), steps=3, warmup=1)


def warm_sharded_1dev():
    import bench

    bench.bench_sharded_1dev(dispatches=1, windows=1, blanker_rounds=8,
                             target_fft1_frames_per_step=2048,
                             max_pulses_per_block=512)


def main():
    _timed("entry", warm_entry)
    _timed("batched_k48_f2048", lambda: warm_batched(48))
    _timed("batched_k32_f2048", lambda: warm_batched(32))
    _timed("sharded_1dev", warm_sharded_1dev)
    _timed("latency", warm_latency)


if __name__ == "__main__":
    main()
