"""Multi-process multihost execution (VERDICT r2 item 6).

Actually runs jax.distributed across 2 spawned processes (2 virtual CPU
devices each -> a 4-device global mesh) and drives
multihost.scatter_step_block's make_array_from_process_local_data
branch plus the sharded rx step — the capability of the reference's
network input threads (thread_rx_raw_netinput network.c:810: the raw
stream distributed across machines, every machine computing its part).
"""

import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_equals_single(tmp_path):
    from linrad_tpu import RxParams, derive_geometry
    from linrad_tpu.io.siggen import Tone, tones_iq

    p = RxParams(fft1_n_override=9, agc_enable=False,
                 target_fft1_frames_per_step=8, shards=4)
    geo = derive_geometry(p)
    rng = np.random.default_rng(5)
    n = geo.samples_per_step * 3
    iq = (tones_iq(geo.rx_ad_speed, n,
                   [Tone(64 * geo.rx_ad_speed / geo.fftx_size + 250.0)])
          + 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n))
          ).astype(np.complex64)
    iq_path = tmp_path / "iq.npy"
    np.save(iq_path, iq)

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    outs = [tmp_path / f"audio_{i}.npy" for i in range(2)]
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
             str(i), "2", str(port), str(iq_path), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=600)
        logs.append(out.decode())
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"worker {i}:\n{logs[i][-3000:]}"

    # both processes hold the full (replicated) audio and they agree
    a0 = np.load(outs[0])
    a1 = np.load(outs[1])
    np.testing.assert_array_equal(a0, a1)

    # and the distributed run equals the plain single-process receiver
    from linrad_tpu.pipeline.chain import (RxState, RxTables,
                                           make_rx_step)
    import jax
    import jax.numpy as jnp
    tables = RxTables.create(geo, p)
    state = RxState.create(geo)
    step = jax.jit(make_rx_step(geo, p))
    ref = []
    s = geo.samples_per_step
    for k in range(len(iq) // s):
        blk = jnp.asarray(iq[k * s:(k + 1) * s][:, None])
        state, out = step(tables, state, blk, jnp.int32(64))
        ref.append(np.asarray(out.audio))
    ref = np.concatenate(ref)
    np.testing.assert_allclose(a0, ref, atol=2e-4)
