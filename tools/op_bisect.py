"""Execution-op bisect for the axon backend (r5).

Discovery (2026-08-21, tools/spin_channel.py + fetch probes):
`block_until_ready` on this backend does NOT wait for execution —
programs execute lazily when a device->host fetch demands the value,
so an executable can be "benchmarked" for a whole round while actually
failing to execute.  Fetch-verified probes showed every PRIMITIVE op
(matmul, complex arithmetic, XLA FFT, gather/scatter on float32, scan,
sort) executes fine, while the chain's `frame_stream` (a gather of a
2D index into a COMPLEX buffer) fails UNIMPLEMENTED at execution.

This tool pins down exactly which op breaks and whether a float-pair
gather (gather re/im separately, form complex after) fixes it.  Every
step is individually guarded; results print as '@@'+JSON so a watch
loop can retry through upload-outage bursts.
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
    from jax import lax

    res: dict[str, str] = {}

    def probe(name, fn):
        try:
            t0 = time.perf_counter()
            out = jax.jit(fn)()
            float(np.asarray(jnp.sum(jnp.abs(out)).astype(jnp.float32)))
            res[name] = f"OK {time.perf_counter() - t0:.1f}s"
        except Exception as e:  # noqa: BLE001
            res[name] = f"FAIL {type(e).__name__} {str(e)[:60]}"
        print("@@" + json.dumps({name: res[name]}), flush=True)

    rng = np.random.default_rng(0)
    try:
        xr = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32))
        float(np.asarray(jnp.sum(xr)))      # health: upload + fetch
    except Exception as e:  # noqa: BLE001
        print("@@" + json.dumps(
            {"health": f"FAIL {type(e).__name__} {str(e)[:60]}"}),
            flush=True)
        return 1

    idx = jnp.arange(16)[:, None] * 64 + jnp.arange(128)[None, :]
    probe("float_gather_2d", lambda: xr[idx])
    probe("complex_gather_2d",
          lambda: lax.complex(xr, xr)[idx])
    probe("complex_gather_1d",
          lambda: lax.complex(xr, xr)[jnp.arange(0, 4096, 3)])
    probe("complex_dynamic_slice",
          lambda: lax.dynamic_slice(lax.complex(xr, xr), (jnp.int32(5),),
                                    (128,)))
    probe("complex_take_along_axis",
          lambda: jnp.take_along_axis(
              lax.complex(xr, xr)[None, :].repeat(4, 0),
              idx[:4, :64] % 4096, axis=1))
    probe("pair_gather_then_complex",
          lambda: lax.complex(xr[idx], (xr * 2.0)[idx]))
    probe("complex_scatter_add",
          lambda: lax.complex(xr, xr).at[jnp.arange(0, 4096, 5)].add(1j))
    probe("complex_where_mask",
          lambda: jnp.where(xr > 0, lax.complex(xr, xr), 0.0))
    probe("complex_roll", lambda: jnp.roll(lax.complex(xr, xr), 7))
    # the actual frame_stream, complex vs float vs pair-workaround
    # (LARGE buffers — the small-complex-gather probes above passed in
    # the 13:18 window, so the decisive question is whether the
    # failure is size-dependent; guard the big uploads so a burst
    # cannot kill the whole script)
    from linrad_tpu.ops.framing import frame_stream
    try:
        tailc = jnp.zeros((1024, 1), jnp.complex64)
        blkf = jnp.asarray(rng.normal(size=(262144, 1)
                                      ).astype(np.float32))
        blkc = lax.complex(blkf, blkf)
        tailf = jnp.zeros((1024, 1), jnp.float32)
        float(np.asarray(jnp.sum(blkf)))
    except Exception as e:  # noqa: BLE001
        print("@@" + json.dumps(
            {"big_upload": f"FAIL {type(e).__name__} {str(e)[:60]}"}),
            flush=True)
        print("@@" + json.dumps({"summary": "partial: big upload died",
                                 "all": res}), flush=True)
        return 0
    # mid-size complex gather: localize the size threshold
    try:
        zm = lax.complex(blkf[:65536, 0], blkf[:65536, 0])
        im = jnp.arange(63)[:, None] * 1024 + jnp.arange(2048)[None, :]
        jax.block_until_ready(jax.jit(lambda: zm[im])())
        float(np.asarray(jnp.sum(jnp.abs(jax.jit(lambda: zm[im])()))
                         .astype(jnp.float32)))
        res["complex_gather_64k"] = "OK"
    except Exception as e:  # noqa: BLE001
        res["complex_gather_64k"] = f"FAIL {type(e).__name__}"
    print("@@" + json.dumps(
        {"complex_gather_64k": res["complex_gather_64k"]}), flush=True)
    probe("frame_stream_float",
          lambda: frame_stream(tailf, blkf, 2048, 1024)[0])
    probe("frame_stream_complex",
          lambda: frame_stream(tailc, blkc, 2048, 1024)[0])

    def fs_pair():
        buf = jnp.concatenate([tailc, blkc], axis=0)
        i = jnp.arange(256)[:, None] * 1024 + jnp.arange(2048)[None, :]
        return lax.complex(jnp.real(buf)[i], jnp.imag(buf)[i])
    probe("frame_stream_pair_workaround", fs_pair)
    # remaining complex patterns the chain uses
    probe("complex_concat",
          lambda: jnp.concatenate([tailc, blkc], axis=0)[:64])
    probe("complex_pad",
          lambda: jnp.pad(tailc, ((0, 7), (0, 0)))[:64])
    probe("complex_static_slice_update",
          lambda: blkc.at[5:69].add(tailc[:64] + 1j))
    probe("complex_dynamic_update_slice",
          lambda: lax.dynamic_update_slice(blkc, tailc,
                                           (jnp.int32(9), jnp.int32(0))))
    from linrad_tpu.ops.framing import overlap_add
    fr = jnp.broadcast_to(blkc[:2048, 0], (16, 2048))[..., None]
    probe("overlap_add_complex",
          lambda: overlap_add(fr, 1024, jnp.zeros((1024, 1),
                                                  jnp.complex64))[0])
    # mini-chain: frame (pair gather) -> window -> fft -> mask -> ifft
    # -> overlap-add — the wideband skeleton
    def mini_chain():
        fs_ = fs_pair()
        w = jnp.asarray(np.hanning(2048).astype(np.float32))
        spec = jnp.fft.fft(fs_ * w[None, :, None], axis=1)
        mask = (jnp.abs(spec) < 1e3).astype(jnp.float32)
        back = jnp.fft.ifft(spec * mask, axis=1)
        out, _ = overlap_add(back, 1024,
                             jnp.zeros((1024, 1), jnp.complex64))
        return out
    probe("mini_chain_wideband", mini_chain)
    ok = sum(1 for v in res.values() if v.startswith("OK"))
    print("@@" + json.dumps({"summary": f"{ok}/{len(res)} ok",
                             "all": res}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
