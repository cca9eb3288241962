"""TPU-vs-CPU numerics parity gate.

Every correctness test in tests/ runs on the CPU backend (conftest
forces JAX_PLATFORMS=cpu) while the benchmark only ever *times* the TPU.
This tool closes that gap: it runs the SAME flagship chain steps
(__graft_entry__.entry() configuration — the exact HLO the benchmark's
single-step path uses) on the current backend and on a CPU subprocess,
with identical inputs and state threading, and compares the outputs
within float32 tolerance — the always-on self-check ethos of the
reference (modesub.c:1962) applied to the accelerator.

Usage:
  python tools/tpu_parity.py              # full gate: TPU here, CPU in a
                                          # subprocess, compare, print JSON
  python tools/tpu_parity.py --dump F     # run on current backend, save F
  python tools/tpu_parity.py --compare A B

The gate is cached-executable-safe: entry()'s HLO is the one bench.py
and the driver keep warm, so a compile outage does not block it.
bench.py embeds the resulting {max_rel_audio, max_rel_fft2,
max_rel_liminfo, ok} as the "tpu_parity" field of the bench JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STEPS = 4          # thread state across several steps, not just one
TOL_REL = 2e-3       # float32 accumulation across a 2^22-point chain


def _retry(fn, tries: int = 4, wait_s: float = 20.0):
    """The axon backend's transfer paths fail in bursts (CLAUDE.md
    2026-08-21 notes); retry a transfer a few times before giving up."""
    import time
    last = None
    for i in range(tries):
        try:
            return fn()
        except Exception as e:              # jax RuntimeError
            last = e
            if i + 1 < tries:
                time.sleep(wait_s)
    raise last


def run_steps(n_steps: int = N_STEPS) -> dict[str, np.ndarray]:
    """Run the entry() chain for n_steps with deterministic inputs,
    threading state; returns stacked per-step outputs."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    step, (tables, state, block0, tune) = ge.entry()
    stepj = jax.jit(step)
    n = block0.shape[0]
    rng = np.random.default_rng(7)
    sigs = []
    for i in range(n_steps):
        sig = (rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
               ).astype(np.complex64)
        sig[:: 9973 + i] += 25.0       # pulses: the blanker does work
        sigs.append(sig)
    from linrad_tpu.utils.xfer import device_complex
    blocks = [_retry(lambda s=s: jax.block_until_ready(device_complex(s)))
              for s in sigs]
    outs = {"audio": [], "fft2_power": [], "liminfo": [],
            "noise_floor": []}
    for i in range(n_steps):
        state, out = stepj(tables, state, blocks[i], tune)
        for k in outs:
            v = getattr(out, k)
            outs[k].append(_retry(lambda v=v: np.asarray(v)))
    return {k: np.stack(v) for k, v in outs.items()}


def compare(a: dict, b: dict) -> dict:
    """Relative max deviation per output, scale-normalised per field."""
    rep = {}
    for k in ("audio", "fft2_power", "liminfo"):
        x, y = np.asarray(a[k], np.float64), np.asarray(b[k], np.float64)
        scale = max(np.max(np.abs(x)), np.max(np.abs(y)), 1e-30)
        rep[f"max_rel_{k.split('_')[0] if k != 'fft2_power' else 'fft2'}"] \
            = float(np.max(np.abs(x - y)) / scale)
    rep["ok"] = all(v < TOL_REL for k, v in rep.items()
                    if k.startswith("max_rel"))
    return rep


def _dump(path: str) -> None:
    np.savez(path, **run_steps())


def main() -> dict:
    if "--dump" in sys.argv:
        _dump(sys.argv[sys.argv.index("--dump") + 1])
        return {}
    if "--compare" in sys.argv:
        i = sys.argv.index("--compare")
        with np.load(sys.argv[i + 1]) as za, np.load(sys.argv[i + 2]) as zb:
            rep = compare(dict(za), dict(zb))
        print(json.dumps(rep))
        return rep

    # full gate: current backend here, CPU in a subprocess
    here = run_steps()
    with tempfile.TemporaryDirectory() as td:
        cpu_npz = os.path.join(td, "cpu.npz")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        code = ("import jax; jax.config.update('jax_platforms','cpu');"
                "import sys; sys.argv=['x','--dump',%r];"
                "sys.path.insert(0, %r);"
                "from tools.tpu_parity import main; main()"
                % (cpu_npz, os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))))
        subprocess.run([sys.executable, "-c", code], env=env, check=True,
                       timeout=1200)
        with np.load(cpu_npz) as z:
            cpu = dict(z)
    import jax
    rep = compare(here, cpu)
    rep["backend"] = jax.devices()[0].platform
    rep["n_steps"] = N_STEPS
    print(json.dumps(rep))
    return rep


if __name__ == "__main__":
    main()
