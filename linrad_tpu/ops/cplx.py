"""Complex-safe indexing primitives for the axon TPU backend.

Proven r5 (tools/op_bisect.py, docs/PERF.md): this backend executes
programs lazily, and gather-family primitives with COMPLEX operands
fail at execution time with ``UNIMPLEMENTED`` while the identical data
movement on the float32 real/imag parts succeeds.  Every helper here
is bit-exact equivalent to the direct op (gathers/scatters move data,
they do not compute), and on healthy backends XLA fuses the real/imag
views so there is no extra traffic.

Used at every complex gather/scatter/dynamic-slice in the hot path
(framing, mix1 bin selection, blanker pulse windows, fft1 mirror,
spur templates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _is_c(a: jax.Array) -> bool:
    return jnp.iscomplexobj(a)


def czeros(shape, dtype=jnp.complex64) -> jax.Array:
    """Complex zeros built from float-pair fills: the axon backend's
    eager materialisation of a COMPLEX-CONSTANT broadcast
    (jnp.zeros(c64), jnp.full(c64)) fails UNIMPLEMENTED in modes where
    float fills and lax.complex of real arrays keep working (observed
    2026-08-21 13:43: tables built via device_complex fine, state's
    jnp.zeros(c64) died seconds later)."""
    f = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    return lax.complex(jnp.zeros(shape, f), jnp.zeros(shape, f))


def cfull(shape, value, dtype=jnp.complex64) -> jax.Array:
    f = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    c = complex(value)
    return lax.complex(jnp.full(shape, c.real, f),
                       jnp.full(shape, c.imag, f))


def cgather(buf: jax.Array, idx) -> jax.Array:
    """``buf[idx]`` via float-pair gathers for complex operands."""
    if _is_c(buf):
        return lax.complex(jnp.real(buf)[idx], jnp.imag(buf)[idx])
    return buf[idx]


def ctake_along_axis(a: jax.Array, idx: jax.Array, axis: int
                     ) -> jax.Array:
    if _is_c(a):
        return lax.complex(
            jnp.take_along_axis(jnp.real(a), idx, axis=axis),
            jnp.take_along_axis(jnp.imag(a), idx, axis=axis))
    return jnp.take_along_axis(a, idx, axis=axis)


def cdynamic_slice(a: jax.Array, starts, sizes) -> jax.Array:
    if _is_c(a):
        return lax.complex(
            lax.dynamic_slice(jnp.real(a), starts, sizes),
            lax.dynamic_slice(jnp.imag(a), starts, sizes))
    return lax.dynamic_slice(a, starts, sizes)


def cdynamic_update_slice(a: jax.Array, upd: jax.Array, starts
                          ) -> jax.Array:
    if _is_c(a):
        upd = jnp.asarray(upd, a.dtype)
        return lax.complex(
            lax.dynamic_update_slice(jnp.real(a), jnp.real(upd), starts),
            lax.dynamic_update_slice(jnp.imag(a), jnp.imag(upd), starts))
    return lax.dynamic_update_slice(a, upd, starts)


def cdynamic_slice_in_dim(a: jax.Array, start, size: int, axis: int = 0
                          ) -> jax.Array:
    if _is_c(a):
        return lax.complex(
            lax.dynamic_slice_in_dim(jnp.real(a), start, size, axis),
            lax.dynamic_slice_in_dim(jnp.imag(a), start, size, axis))
    return lax.dynamic_slice_in_dim(a, start, size, axis)


def cset(a: jax.Array, idx, vals: jax.Array, mode: str | None = None
         ) -> jax.Array:
    """``a.at[idx].set(vals)`` via float-pair scatters for complex."""
    kw = {"mode": mode} if mode else {}
    if _is_c(a):
        vals = jnp.asarray(vals, a.dtype)
        return lax.complex(
            jnp.real(a).at[idx].set(jnp.real(vals), **kw),
            jnp.imag(a).at[idx].set(jnp.imag(vals), **kw))
    return a.at[idx].set(vals, **kw)


def cadd(a: jax.Array, idx, vals: jax.Array, mode: str | None = None
         ) -> jax.Array:
    """``a.at[idx].add(vals)`` via float-pair scatters for complex."""
    kw = {"mode": mode} if mode else {}
    if _is_c(a):
        vals = jnp.asarray(vals, a.dtype)
        return lax.complex(
            jnp.real(a).at[idx].add(jnp.real(vals), **kw),
            jnp.imag(a).at[idx].add(jnp.imag(vals), **kw))
    return a.at[idx].add(vals, **kw)
