"""Pytree registration helper for pipeline state/table dataclasses."""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, frozen: bool = False):
    """@dataclass + jax pytree registration (all fields are children).

    State and table containers flow through jit as pytrees; geometry and
    params stay plain frozen dataclasses (static argnums)."""

    def wrap(c):
        dc = dataclasses.dataclass(c, frozen=frozen)
        return jax.tree_util.register_dataclass(dc)

    if cls is None:
        return wrap
    return wrap(cls)
