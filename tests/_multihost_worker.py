"""Worker for the 2-process multihost test (spawned by
test_multihost.py::test_two_process_sharded_equals_single).

Each process owns 2 virtual CPU devices of a 4-device global mesh,
reads ONLY its own rows of the recording (multihost.host_rows), builds
the global sharded block via jax.make_array_from_process_local_data
(the network.c:810 capability: the pipeline input distributed across
machines), runs the sharded rx step, and saves the (replicated) audio.

Usage: python _multihost_worker.py <proc_id> <nprocs> <port> <iq.npy> <out.npy>
"""

import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from linrad_tpu import RxParams, derive_geometry  # noqa: E402
from linrad_tpu.parallel import multihost  # noqa: E402
from linrad_tpu.parallel.sharded import make_sharded_rx_step  # noqa: E402
from linrad_tpu.pipeline.chain import RxState, RxTables  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs

p = RxParams(fft1_n_override=9, agc_enable=False,
             target_fft1_frames_per_step=8, shards=2 * nprocs)
geo = derive_geometry(p)
mesh = multihost.global_time_mesh()
tables = RxTables.create(geo, p)
state = RxState.create(geo)
step = jax.jit(make_sharded_rx_step(geo, p, mesh, tables=tables))

iq = np.load(sys.argv[4])          # full recording (shared fs)
lo, hi = multihost.host_rows(mesh, geo)
tune = jnp.asarray(64, jnp.int32)
audio = []
s = geo.samples_per_step
for i in range(len(iq) // s):
    blk = iq[i * s:(i + 1) * s][:, None]
    garr = multihost.scatter_step_block(mesh, geo, blk[lo:hi])
    state, out = step(tables, state, garr, tune)
    audio.append(np.asarray(out.audio))
np.save(sys.argv[5], np.concatenate(audio))
print(f"worker {proc_id}: ok rows [{lo},{hi})", flush=True)
