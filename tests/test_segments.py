"""Segmented-reduction utility tests (the sellim region machinery)."""

import numpy as np
import jax.numpy as jnp
import pytest

from linrad_tpu.utils.segments import (segment_max, segment_min,
                                       segment_starts, segment_sum)


def _ref_reduce(values, mask, op, init):
    """Direct per-region reference."""
    out = np.full(len(values), init, np.float64)
    i = 0
    n = len(values)
    while i < n:
        if mask[i]:
            j = i
            while j < n and mask[j]:
                j += 1
            seg = values[i:j]
            red = op(seg)
            out[i:j] = red
            i = j
        else:
            i += 1
    return out


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    v = rng.normal(size=200).astype(np.float32)
    m = rng.random(200) < 0.4
    # make a few longer runs
    m[50:70] = True
    m[100:103] = True
    m[0] = True
    m[-1] = True
    return v, m


def test_segment_starts(data):
    v, m = data
    s = np.asarray(segment_starts(jnp.asarray(m)))
    ref = m & ~np.concatenate([[False], m[:-1]])
    np.testing.assert_array_equal(s, ref)


def test_segment_max(data):
    v, m = data
    out = np.asarray(segment_max(jnp.asarray(v), jnp.asarray(m)))
    ref = _ref_reduce(v, m, np.max, -np.inf)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-6)
    assert np.all(out[~m] == -np.inf)


def test_segment_min(data):
    v, m = data
    out = np.asarray(segment_min(jnp.asarray(v), jnp.asarray(m)))
    ref = _ref_reduce(v, m, np.min, np.inf)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-6)


def test_segment_sum(data):
    v, m = data
    out = np.asarray(segment_sum(jnp.asarray(v), jnp.asarray(m)))
    ref = _ref_reduce(v, m, np.sum, 0.0)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-4, atol=1e-5)
    assert np.all(out[~m] == 0.0)


def test_all_true_single_segment():
    v = jnp.asarray(np.arange(16, dtype=np.float32))
    m = jnp.ones(16, bool)
    assert np.all(np.asarray(segment_max(v, m)) == 15.0)
    assert np.all(np.asarray(segment_sum(jnp.ones(16), m)) == 16.0)
