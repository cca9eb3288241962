"""Pallas TPU kernels for the wideband hot path.

``fused_fft1`` performs Linrad's fft1_b + fft1_c pair (windowed forward
transform, reference fft1.c:3302-4084, then calibration multiply and
power-spectrum accumulation, fft1.c:4085-4350) as ONE Pallas kernel:

    window multiply -> DFT-as-matmul on the MXU -> filtercorr complex
    multiply -> |X|^2 partial sums

all inside VMEM, so the intermediate windowed frames and uncalibrated
spectra never round-trip through HBM.  This is the TPU analog of the
reference's fused SIMD kernels (``simd1_16_win`` simdasm.s:35-43 fuses
int16->float conversion + window into the first FFT pass for exactly the
same reason: memory bandwidth, not FLOPs, bounds the wideband chain).

Grid layout: (output-bin tiles, frame-batch tiles) with the batch axis
innermost, so each output tile keeps its DFT weight block resident in
VMEM across the whole batch sweep while power partial sums accumulate
in-place (revisited output block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this transform size the (N, TN) weight tiles + (TB, N) frame
# tiles no longer fit comfortably in ~16 MB VMEM; callers fall back to
# the XLA FFT path (ops/fft.py) which is competitive for large N anyway.
PALLAS_FFT_MAX_SIZE = 4096

_LANE = 128     # TPU lane count: last-dim tile quantum
_SUBLANE = 8    # float32 sublane quantum


def is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _dft_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _fft1_kernel(xr_ref, xi_ref, win_ref, wr_ref, wi_ref, fcr_ref,
                 fci_ref, yr_ref, yi_ref, pwr_ref):
    i = pl.program_id(1)  # frame-batch tile (innermost grid axis)
    win = win_ref[...]
    xr = xr_ref[...] * win
    xi = xi_ref[...] * win
    wr = wr_ref[...]
    wi = wi_ref[...]
    # complex DFT = 4 real matmuls on the MXU
    ar = (jnp.dot(xr, wr, preferred_element_type=jnp.float32)
          - jnp.dot(xi, wi, preferred_element_type=jnp.float32))
    ai = (jnp.dot(xr, wi, preferred_element_type=jnp.float32)
          + jnp.dot(xi, wr, preferred_element_type=jnp.float32))
    # calibration multiply (fft1_filtercorr, fft1.c:4085-4350)
    fcr = fcr_ref[...]
    fci = fci_ref[...]
    yr = ar * fcr - ai * fci
    yi = ar * fci + ai * fcr
    yr_ref[...] = yr
    yi_ref[...] = yi
    psum = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        pwr_ref[...] = psum

    @pl.when(i > 0)
    def _():
        pwr_ref[...] = pwr_ref[...] + psum


def _fused_fft1_2d(xr: jax.Array, xi: jax.Array, window: jax.Array,
                   fcr: jax.Array, fci: jax.Array, interpret: bool
                   ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One channel: frames (B, N) float32 pair -> (yr, yi, power_sum)."""
    b, n = xr.shape
    tb = min(128, _round_up(b, _SUBLANE))
    tn = min(_LANE, n)
    bp = _round_up(b, tb)
    if bp != b:  # zero rows transform to zero: power sums unaffected
        pad = ((0, bp - b), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    wr, wi = _dft_weights(n)
    grid = (n // tn, bp // tb)
    flops = 8 * bp * n * n + 10 * bp * n
    yr, yi, pwr = pl.pallas_call(
        _fft1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=4 * (2 * bp * n * (1 + n // tn)
                                + 2 * n * n + 2 * bp * n)),
        interpret=interpret,
    )(xr, xi, window.reshape(1, n), jnp.asarray(wr), jnp.asarray(wi),
      fcr.reshape(1, n), fci.reshape(1, n))
    return yr[:b], yi[:b], pwr[0]


def fused_fft1(frames: jax.Array, window: jax.Array,
               filtercorr: jax.Array, interpret: bool | None = None
               ) -> tuple[jax.Array, jax.Array]:
    """Fused window + DFT + calibration + power accumulation.

    frames:     (B, N, C) complex64 overlapped input frames
    window:     (N,) float32 sin^N analysis window
    filtercorr: (N, C) complex64 calibration spectrum

    Returns (spec, power_sum): spec (B, N, C) complex64 calibrated
    transforms; power_sum (N, C) float32 = sum over B of |spec|^2
    (divide by B for the step mean that feeds the fft1_sumsq average).
    """
    if interpret is None:
        interpret = not is_tpu_backend()
    b, n, c = frames.shape
    if n > PALLAS_FFT_MAX_SIZE or n % _LANE != 0:
        raise ValueError(f"fused_fft1: unsupported transform size {n}")
    specs = []
    pows = []
    for ch in range(c):
        xr = jnp.real(frames[:, :, ch]).astype(jnp.float32)
        xi = jnp.imag(frames[:, :, ch]).astype(jnp.float32)
        fcr = jnp.real(filtercorr[:, ch]).astype(jnp.float32)
        fci = jnp.imag(filtercorr[:, ch]).astype(jnp.float32)
        yr, yi, pw = _fused_fft1_2d(xr, xi, window, fcr, fci, interpret)
        specs.append(jax.lax.complex(yr, yi))
        pows.append(pw)
    return jnp.stack(specs, axis=-1), jnp.stack(pows, axis=-1)
