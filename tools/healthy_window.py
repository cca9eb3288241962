"""Healthy-window playbook: when the axon backend recovers, run every
pending evidence step in order, each in a hard-killable subprocess.

  1. tools/op_bisect.py       — which primitives execute (diagnostic)
  2. tools/chain_verify.py    — fetch-verified flagship chain (honest
                                throughput; self-bisects on failure)
  3. tools/tpu_parity.py      — numerics gate (persists TPU_PARITY.json)
  4. tools/warm_cache.py      — re-warm the bench ladder + slope-active
  5. tools/fetch_bench.py     — MXU-vs-XLA variant race, fetch-verified
  6. BENCH rehearsal          — timeout-bounded bench.py run

Everything logs to stdout; run under nohup/background with a generous
outer timeout.  Exits 0 once steps 2 AND 3 have succeeded (the round's
two accountability artifacts); keeps retrying until then.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = ("import numpy as np, jax, jax.numpy as jnp;"
         "print(np.asarray(jax.jit(lambda: jnp.ones((8,)))()).sum())")


def _run(args, timeout_s, tag):
    t0 = time.time()
    try:
        r = subprocess.run(args, capture_output=True, text=True,
                           timeout=timeout_s, cwd=_HERE)
        body = (r.stdout + r.stderr)
        for line in body.splitlines():
            if line.startswith("@@") or line.startswith("{"):
                print(f"[{tag}] {line[:500]}", flush=True)
        print(f"[{tag}] rc={r.returncode} in {time.time() - t0:.0f}s",
              flush=True)
        return r.returncode, body
    except subprocess.TimeoutExpired:
        print(f"[{tag}] TIMEOUT after {timeout_s}s", flush=True)
        return -1, ""


def main(max_hours: float = 8.0) -> int:
    t_end = time.time() + max_hours * 3600
    chain_ok = parity_ok = extras_done = False
    attempt = 0
    while time.time() < t_end:
        attempt += 1
        stamp = time.strftime("%H:%M:%S")
        rc, _ = _run([sys.executable, "-c", PROBE], 240, "probe")
        if rc != 0:
            print(f"[{stamp}] attempt {attempt}: backend down; sleep",
                  flush=True)
            time.sleep(150)
            continue
        print(f"[{stamp}] attempt {attempt}: backend responsive",
              flush=True)
        if not chain_ok:
            _run([sys.executable, "tools/op_bisect.py"], 600, "bisect")
            rc, _ = _run([sys.executable, "tools/chain_verify.py"],
                         1200, "chain")
            chain_ok = rc == 0
        if chain_ok and not parity_ok:
            rc, _ = _run([sys.executable, "tools/tpu_parity.py"],
                         1500, "parity")
            p = os.path.join(_HERE, "TPU_PARITY.json")
            if rc == 0 and os.path.exists(p):
                try:
                    with open(p) as f:
                        parity_ok = bool(json.load(f).get("ok"))
                except Exception:  # noqa: BLE001
                    pass
        if chain_ok and parity_ok and not extras_done:
            _run([sys.executable, "tools/warm_cache.py"], 2400, "warm")
            _run([sys.executable, "tools/fetch_bench.py"], 1500,
                 "fetchbench")
            env = dict(os.environ, BENCH_BUDGET_S="420")
            try:
                r = subprocess.run([sys.executable, "bench.py"],
                                   capture_output=True, text=True,
                                   timeout=600, cwd=_HERE, env=env)
                for line in r.stdout.splitlines():
                    if line.startswith("{"):
                        print(f"[bench] {line[:600]}", flush=True)
                print(f"[bench] rc={r.returncode}", flush=True)
            except subprocess.TimeoutExpired:
                print("[bench] TIMEOUT", flush=True)
            extras_done = True
        if chain_ok and parity_ok:
            print("PLAYBOOK COMPLETE", flush=True)
            return 0
        time.sleep(120)
    print("window expired", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
