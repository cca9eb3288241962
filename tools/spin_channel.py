"""Transfer-free TPU evidence channel: encode a device-computed bit in
EXECUTION TIME.

The axon backend's device->host path dies in bursts precisely after a
chain executable has run (CLAUDE.md 2026-08-21), which has blocked the
numerics gate all round: uploads and execution keep working, fetches
don't.  This tool gets one bit (per field) off the device with no
transfer at all: a jitted `lax.while_loop` spins for N iterations iff
the on-device comparison FAILS, so the host reads the verdict from how
long `block_until_ready` takes.

The same mechanism settles the r5 timing-integrity question
(docs/PERF.md): if a forced-spin program returns instantly,
`block_until_ready` provably does NOT wait for execution on this
backend and every Tsps-class figure is an enqueue rate; if the forced
spin blocks for seconds, readiness is real and the throughput numbers
stand.

Usage (healthy-ish window: needs uploads + execution only):
  python tools/spin_channel.py calibrate   # timing channel sanity
  python tools/spin_channel.py parity      # full gate via spin channel
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPIN_N = 2_000_000_000   # ~seconds of scalar-loop work on any backend


def _spin_fn():
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def spin(n):
        # scalar count-up loop with a non-foldable float accumulator
        # (a bare `while s<n: s+=1` could in principle be
        # strength-reduced to `s=n` by the compiler); n=0 returns
        # immediately
        def body(c):
            s, a = c
            return s + 1, a * 1.0000001 + 1.0

        _, a = lax.while_loop(lambda c: c[0] < n, body,
                              (jnp.int32(0), jnp.float32(1.0)))
        return a
    return spin


def calibrate() -> dict:
    """Time spin(0) vs spin(SPIN_N): a usable channel needs a wide gap.
    ALSO the timing-integrity verdict: if spin(SPIN_N) returns in
    ~spin(0) time, block_until_ready does not wait for execution."""
    import jax

    spin = _spin_fn()
    jax.block_until_ready(spin(0))          # compile
    out = {}
    for name, n in (("zero", 0), ("spin", SPIN_N)):
        t0 = time.perf_counter()
        jax.block_until_ready(spin(n))
        out[f"{name}_s"] = round(time.perf_counter() - t0, 4)
    out["channel_ok"] = out["spin_s"] > 20 * max(out["zero_s"], 0.005)
    out["block_until_ready_waits"] = bool(out["channel_ok"])
    return out


def parity_spin(n_steps: int = 4, tol: float = 2e-3) -> dict:
    """The tpu_parity gate with the verdict read via the spin channel.

    CPU golden in a subprocess (always works), upload goldens + run the
    entry() chain on the accelerator, compare on device, then for each
    field run spin(SPIN_N if rel>tol else 0).  No device->host transfer
    anywhere after the chain runs."""
    import jax
    import jax.numpy as jnp

    from tools.tpu_parity import _make_inputs, _run_steps_on_device

    # 1. CPU golden
    with tempfile.TemporaryDirectory() as td:
        cpu_npz = os.path.join(td, "cpu.npz")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "import sys; sys.argv=['x','--dump',%r];"
                "sys.path.insert(0, %r);"
                "from tools.tpu_parity import main; main()"
                % (cpu_npz, root))
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=1200)
        with np.load(cpu_npz) as z:
            cpu = {k: z[k] for k in ("audio", "fft2_power", "liminfo")}

    # 2. calibrate the channel BEFORE the chain runs
    cal = calibrate()
    rep = {"method": "spin-channel", "calibration": cal,
           "n_steps": n_steps, "tol": tol}
    if not cal["channel_ok"]:
        rep["ok"] = None
        rep["note"] = ("channel dead: block_until_ready does not wait "
                       "for execution — ALL block_until_ready timing "
                       "on this backend is enqueue-rate only")
        return rep

    # 3. upload goldens (float32 — the working direction), run chain
    gold = {k: [jax.block_until_ready(jnp.asarray(
        np.ascontiguousarray(cpu[k][i]), jnp.float32))
        for i in range(n_steps)] for k in cpu}
    here = _run_steps_on_device(n_steps)

    # 4. per-field device compare -> spin
    spin = _spin_fn()

    @jax.jit
    def rel_bad(gs, hs, t):
        d = jnp.max(jnp.stack([jnp.max(jnp.abs(g - h.astype(jnp.float32)))
                               for g, h in zip(gs, hs)]))
        s = jnp.max(jnp.stack([jnp.maximum(jnp.max(jnp.abs(g)),
                                           jnp.max(jnp.abs(h)))
                               for g, h in zip(gs, hs)]))
        return (d / jnp.maximum(s, 1e-30)) > t

    for k in cpu:
        bad = rel_bad(gold[k], here[k], tol)
        n = jnp.where(bad, jnp.int32(SPIN_N), jnp.int32(0))
        t0 = time.perf_counter()
        jax.block_until_ready(spin(n))
        dt = time.perf_counter() - t0
        rep[f"{k}_spin_s"] = round(dt, 4)
        rep[f"{k}_ok"] = bool(dt < 0.5 * cal["spin_s"])
    rep["ok"] = all(rep[f"{k}_ok"] for k in cpu)
    rep["backend"] = jax.devices()[0].platform
    if rep["ok"] and rep["backend"] != "cpu":
        rep["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "TPU_PARITY.json"), "w") as f:
            json.dump(rep, f, indent=1)
    return rep


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if which == "calibrate":
        print(json.dumps(calibrate()))
    else:
        print(json.dumps(parity_spin()))


if __name__ == "__main__":
    main()
