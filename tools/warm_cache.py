"""Pre-compile the benchmark HLOs into the persistent cache.

Fresh TPU compiles on this backend are intermittently broken or take
minutes (CLAUDE.md); bench.py therefore prefers executables that are
already in the persistent compile cache.  Any change to the traced step
signature invalidates those entries, so run this right after such a
change — while compiles are healthy — to re-warm:

  1. the driver entry() flagship step,
  2. the HEAD of bench.CANDIDATES — imported from bench.py itself so
     this warmer can never go stale against the committed ladder
     (VERDICT r4 weak #2),
  3. the bounded-latency configuration,
  4. the sharded 1-dev step,
  5. the slope-active production Receiver signature (afc_coherent
     tracking: per-frame tune bin/frac/slope arrays — the signature the
     AFC switches to after lock, do_mix1_afc mix1.c:648 analog), and
  6. the fetch-verified probe's reduce kernel.

Each target compiles and executes once; timings are printed so compile
health is visible.  Exits NONZERO if any ladder-head target failed —
a cold ladder head burns the bench's whole per-candidate alarm on a
hung fresh compile, so failure here must be loud.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LADDER_HEAD = 3     # how many leading bench candidates to warm

FAILED: list[str] = []


def _timed(name, fn, critical: bool = False):
    t0 = time.time()
    try:
        fn()
        print(f"warm {name}: ok in {time.time() - t0:.0f}s", flush=True)
    except Exception as e:  # keep warming the rest
        print(f"warm {name}: FAILED after {time.time() - t0:.0f}s: "
              f"{type(e).__name__}: {e}", flush=True)
        if critical:
            FAILED.append(name)


def warm_entry():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def warm_candidate(fn, overrides):
    kw = dict(overrides)
    if "dispatches" in kw:
        kw["dispatches"] = 1
    if "windows" in kw:
        kw["windows"] = 1
    if "steps" in kw:
        kw["steps"] = 2
    fn(**kw)


def warm_latency():
    from linrad_tpu.pipeline.latency import latency_params, measure_latency

    measure_latency(latency_params(second_fft=True), steps=3, warmup=1)


def warm_sharded_1dev():
    import bench

    bench.bench_sharded_1dev(dispatches=1, windows=1, blanker_rounds=8,
                             target_fft1_frames_per_step=2048,
                             max_pulses_per_block=512)


def warm_slope_active():
    """Compile + execute the production Receiver step with the AFC's
    slope-active traced signature (VERDICT r4 #3): after lock,
    WeakSignalControl.update switches tune_bin/frac/slope from scalars
    to per-frame arrays (control.py:70-76), which is a NEW jit
    signature the warm entry()/bench HLOs never exercise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from linrad_tpu.pipeline.receiver import Receiver

    rx = Receiver(ge._flagship_params())
    f = rx.geo.fftx_frames_per_step
    rx._tune_bin = jnp.full((f,), 256, jnp.int32)
    rx._tune_frac = jnp.zeros((f,), jnp.float32)
    rx._tune_slope = jnp.full((f,), 1e-4, jnp.float32)
    n = rx.geo.samples_per_step
    rng = np.random.default_rng(0)
    blk = (rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
           ).astype(np.complex64)
    out = rx.process_block(blk)
    jax.block_until_ready(out.audio)


def warm_fetch_verified():
    import bench

    bench.bench_fetch_verified(
        k_steps=4, dispatches=1, blanker_rounds=8,
        target_fft1_frames_per_step=2048, max_pulses_per_block=512)


def main():
    import bench

    _timed("entry", warm_entry, critical=True)
    for fn, overrides in bench.CANDIDATES[:N_LADDER_HEAD]:
        tag = "_".join(f"{k.split('_')[-1]}{v}" for k, v in
                       sorted(overrides.items())
                       if k in ("k_steps", "target_fft1_frames_per_step"))
        _timed(f"candidate[{fn.__name__} {tag}]",
               lambda f=fn, o=overrides: warm_candidate(f, o),
               critical=True)
    _timed("sharded_1dev", warm_sharded_1dev)
    _timed("latency", warm_latency)
    _timed("slope_active_receiver", warm_slope_active)
    _timed("fetch_verified", warm_fetch_verified)
    if FAILED:
        print(f"CRITICAL targets cold: {FAILED} — the bench ladder head "
              f"has no warm HLO; re-run when compiles are healthy",
              flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
