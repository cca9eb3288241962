"""FFT kernel variants — the TPU analog of Linrad's FFT version control.

Linrad ships 21 FFT kernel descriptors (C / MMX / SSE twin+quad / CUDA /
OpenCL / double, reference fft1var.c:43-65 ``fft_cntrl``) selected per
stage and channel mode.  On TPU the useful axis of variation collapses to
two implementations:

- ``XLA``: ``jnp.fft`` — XLA's native FFT, best for large transforms.
- ``MXU``: DFT-as-matmul — for small/medium batched transforms the
  128x128 systolic array does an (B,N)x(N,N) complex matmul faster than
  the generic FFT path, and it fuses with neighbouring elementwise ops.
  This is the structural descendant of the reference's SIMD "twin/quad
  parallel" kernels (simdasm.s:35-43): trade redundant FLOPs for full
  lane/MXU utilisation.

``fft_cntrl``-style selection is a plain size threshold overridable per
call, so every stage can pin its variant exactly like fft1_version[]
(reference fft1var.c:74-89).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Size at or below which variant=None selects the MXU matmul path.
# Default 0 = XLA's FFT everywhere: the r5 FETCH-VERIFIED race (real
# execution, tools/fetch_bench.py, 3072x2048 c64) measured XLA FFT
# 1.85 ms vs matmul-DFT 4.80 ms fp32-HIGHEST / 1.99 ms bf16 — the
# rounds-1-4 "MXU default" was an enqueue-rate artifact of the lazily
# executing backend (docs/PERF.md).  "mxu"/"mxu_bf16" remain explicit
# per-call variants (fft_cntrl-style), and raising this threshold
# restores the old behavior.
MXU_FFT_MAX_SIZE = 0


@functools.lru_cache(maxsize=32)
def _dft_matrices(n: int, inverse: bool, dtype: str):
    # cached as numpy so tracing contexts see fresh constants (device
    # arrays created inside a trace must not be cached across traces)
    sign = 2.0 if inverse else -2.0
    k = np.arange(n)
    ang = sign * np.pi * np.outer(k, k) / n
    scale = 1.0 / n if inverse else 1.0
    wr = np.cos(ang) * scale
    wi = np.sin(ang) * scale
    return (wr.astype(dtype), wi.astype(dtype))


def _matmul_fft(x: jax.Array, inverse: bool,
                bf16: bool = False) -> jax.Array:
    """Batched DFT via real matmuls on the MXU along the last axis.

    bf16=True feeds the MXU its native bfloat16 operand format (fp32
    accumulate): ~4x the fp32 matmul rate at a measured ~2e-3 relative
    transform error (the int16 MMX-path tradeoff of the reference,
    split.s/fft2mmx*.s, reborn for this hardware) — selectable per
    call/stage as variant "mxu_bf16", never the default."""
    n = x.shape[-1]
    wr, wi = _dft_matrices(n, inverse, "float32")
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    if bf16:
        wr = wr.astype(jnp.bfloat16)
        wi = wi.astype(jnp.bfloat16)
        xr = xr.astype(jnp.bfloat16)
        xi = xi.astype(jnp.bfloat16)
    # (…, n) @ (n, n): 4 real matmuls; XLA maps these onto the MXU.
    # precision=HIGHEST: the TPU's DEFAULT fp32 matmul precision is
    # bfloat16 passes (~2e-3 transform error), which the r5 numerics
    # gate caught compounding to 0.62 relative audio error through the
    # cascade; HIGHEST requests full-fp32-accuracy accumulation.  The
    # explicit bf16 variant remains the fast loose option.
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    yr = jnp.matmul(xr, wr, preferred_element_type=jnp.float32,
                    precision=prec) - \
         jnp.matmul(xi, wi, preferred_element_type=jnp.float32,
                    precision=prec)
    yi = jnp.matmul(xr, wi, preferred_element_type=jnp.float32,
                    precision=prec) + \
         jnp.matmul(xi, wr, preferred_element_type=jnp.float32,
                    precision=prec)
    return jax.lax.complex(yr, yi)


@functools.lru_cache(maxsize=16)
def _twiddle(n1: int, n2: int, inverse: bool) -> np.ndarray:
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / (n1 * n2)
    return np.exp(1j * ang).astype(np.complex64)


def _four_step_fft(x: jax.Array, inverse: bool,
                   bf16: bool = False) -> jax.Array:
    """Bailey four-step DFT: N = N1·N2 as two batched matmul DFTs.

    Keeps the MXU path viable far beyond the direct (N, N)-matrix size:
    cost drops from O(N²) to O(N·(N1+N2)) per transform while every
    FLOP stays a dense matmul.  With n = n1·N2 + n2 and k = k1 + N1·k2:

        X[k1 + N1·k2] = Σ_{n2} W_{N2}^{n2·k2} · W_N^{n2·k1}
                          · Σ_{n1} x[n1·N2 + n2] · W_{N1}^{n1·k1}
    """
    n = x.shape[-1]
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    lead = x.shape[:-1]
    a = x.reshape(lead + (n1, n2))                   # a[n1, n2]
    y = _matmul_fft(jnp.swapaxes(a, -1, -2), inverse, bf16)  # y[n2, k1]
    tw = jnp.asarray(_twiddle(n2, n1, inverse))
    y = y * tw                                       # W_N^{n2·k1}
    z = _matmul_fft(jnp.swapaxes(y, -1, -2), inverse, bf16)  # z[k1, k2]
    # ifft normalisation: the two stages each applied 1/N1, 1/N2 — the
    # product is the required 1/N, but the twiddle must stay unscaled.
    out = jnp.swapaxes(z, -1, -2).reshape(lead + (n,))  # X[k1 + N1·k2]
    return out


def fft(x: jax.Array, axis: int = -1, variant: str | None = None) -> jax.Array:
    """Forward FFT along ``axis`` with variant selection."""
    return _dispatch(x, axis, inverse=False, variant=variant)


def ifft(x: jax.Array, axis: int = -1, variant: str | None = None) -> jax.Array:
    """Inverse FFT along ``axis`` (1/N normalised, matching jnp.fft.ifft)."""
    return _dispatch(x, axis, inverse=True, variant=variant)


def _dispatch(x, axis, inverse, variant):
    n = x.shape[axis]
    if variant is None:
        variant = "mxu" if n <= MXU_FFT_MAX_SIZE else "xla"
    if variant == "xla":
        return (jnp.fft.ifft if inverse else jnp.fft.fft)(x, axis=axis)
    if variant not in ("mxu", "mxu_bf16"):
        raise ValueError(f"unknown fft variant {variant!r}")
    if n & (n - 1):
        raise ValueError(f"mxu variant requires power-of-two size, got {n}")
    x = jnp.moveaxis(x, axis, -1)
    bf16 = variant == "mxu_bf16"
    if n <= MXU_FFT_MAX_SIZE:
        y = _matmul_fft(x, inverse, bf16=bf16)
    else:
        y = _four_step_fft(x, inverse, bf16=bf16)
    return jnp.moveaxis(y, -1, axis)
