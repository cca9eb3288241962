"""Persistent TPU-parity watch loop (VERDICT r4 #2).

The axon backend's health oscillates minute-to-minute (CLAUDE.md
2026-08-21 notes): fresh compiles hang, device->host transfers fail in
bursts.  This tool keeps retrying the numerics gate until one healthy
window lets it through, then exits — run it in the background at
session start:

  nohup python tools/tpu_watch.py > /tmp/tpu_watch.log 2>&1 &

Per attempt: a cheap subprocess probe (compile + 8-float fetch) gates a
full tools/tpu_parity.py run (which persists TPU_PARITY.json on
success).  Every stage runs in a hard-killable subprocess so a hung
compile can never wedge the loop.  Exits 0 on first success.
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


def _run(args: list[str], timeout_s: float) -> tuple[int, str]:
    try:
        r = subprocess.run(args, capture_output=True, text=True,
                           timeout=timeout_s, cwd=_HERE)
        return r.returncode, (r.stdout + r.stderr)[-400:]
    except subprocess.TimeoutExpired:
        return -1, "timeout"
    except Exception as e:  # noqa: BLE001
        return -2, f"{type(e).__name__}: {e}"


def main(max_hours: float = 8.0, sleep_s: float = 180.0) -> int:
    out = os.path.join(_HERE, "TPU_PARITY.json")
    t_end = time.time() + max_hours * 3600
    attempt = 0
    while time.time() < t_end:
        attempt += 1
        rc, txt = _run([sys.executable, "-c", PROBE], 240)
        stamp = time.strftime("%H:%M:%S")
        if rc != 0:
            print(f"[{stamp}] attempt {attempt}: probe unhealthy "
                  f"(rc={rc}): {txt.strip()[-120:]}", flush=True)
            time.sleep(sleep_s)
            continue
        print(f"[{stamp}] attempt {attempt}: probe ok — running gate",
              flush=True)
        t_attempt = time.time()
        rc, txt = _run([sys.executable,
                        os.path.join(_HERE, "tools", "tpu_parity.py")],
                       1800)
        # success = a FRESH TPU_PARITY.json written by THIS attempt
        # with ok=true (a stale file from an earlier session must not
        # satisfy the gate — the parity tool exits 0 even on ok=false
        # and only rewrites the file on success)
        if rc == 0 and os.path.exists(out) \
                and os.path.getmtime(out) >= t_attempt:
            try:
                with open(out) as f:
                    rep = json.load(f)
                if rep.get("ok"):
                    print(f"[{stamp}] gate PASSED: {json.dumps(rep)}",
                          flush=True)
                    return 0
            except Exception:  # noqa: BLE001
                pass
        print(f"[{stamp}] gate attempt failed (rc={rc}): "
              f"{txt.strip()[-200:]}", flush=True)
        time.sleep(sleep_s)
    print("watch window expired without a healthy gate", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
