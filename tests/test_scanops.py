"""Associative-scan recurrence tests vs direct sequential reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from linrad_tpu.utils.scanops import decay_max, one_pole, sliding_max
from linrad_tpu.ops.resample import Resampler


class TestOnePole:
    def test_matches_sequential(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=200).astype(np.float32)
        a, y0 = 0.93, 0.5
        y, last = one_pole(jnp.asarray(x), a, jnp.float32(y0))
        ref = np.zeros_like(x)
        acc = y0
        for i in range(len(x)):
            acc = a * acc + (1 - a) * x[i]
            ref[i] = acc
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4,
                                   atol=1e-5)
        assert float(last) == pytest.approx(ref[-1], rel=1e-4)

    def test_streaming(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=128).astype(np.float32)
        a = 0.9
        full, _ = one_pole(jnp.asarray(x), a, jnp.float32(0.0))
        h1, c = one_pole(jnp.asarray(x[:64]), a, jnp.float32(0.0))
        h2, _ = one_pole(jnp.asarray(x[64:]), a, c)
        np.testing.assert_allclose(np.concatenate([h1, h2]),
                                   np.asarray(full), rtol=1e-4, atol=1e-5)

    def test_2d(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(50, 3)).astype(np.float32)
        y, last = one_pole(jnp.asarray(x), 0.8, jnp.zeros(3, jnp.float32))
        for c in range(3):
            ref, _ = one_pole(jnp.asarray(x[:, c]), 0.8, jnp.float32(0.0))
            np.testing.assert_allclose(np.asarray(y[:, c]),
                                       np.asarray(ref), rtol=1e-5)


class TestDecayMax:
    def test_matches_sequential(self):
        rng = np.random.default_rng(3)
        x = np.abs(rng.normal(size=300)).astype(np.float32) + 0.01
        d, y0 = 0.97, 2.0
        y, last = decay_max(jnp.asarray(x), d, jnp.float32(y0))
        ref = np.zeros_like(x)
        acc = y0
        for i in range(len(x)):
            acc = max(d * acc, x[i])
            ref[i] = acc
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4)

    def test_streaming(self):
        rng = np.random.default_rng(4)
        x = np.abs(rng.normal(size=100)).astype(np.float32) + 0.01
        full, _ = decay_max(jnp.asarray(x), 0.95, jnp.float32(0.01))
        h1, c = decay_max(jnp.asarray(x[:50]), 0.95, jnp.float32(0.01))
        h2, _ = decay_max(jnp.asarray(x[50:]), 0.95, c)
        np.testing.assert_allclose(np.concatenate([h1, h2]),
                                   np.asarray(full), rtol=1e-4)


class TestSlidingMax:
    @pytest.mark.parametrize("window", [2, 3, 4, 5, 7, 8, 16])
    def test_matches_direct(self, window):
        rng = np.random.default_rng(5)
        x = rng.normal(size=60).astype(np.float32)
        y = np.asarray(sliding_max(jnp.asarray(x), window))
        xp = np.concatenate([np.full(window - 1, x[0]), x])
        ref = np.array([xp[i: i + window].max() for i in range(60)])
        np.testing.assert_array_equal(y, ref)


class TestResampler:
    def test_2x_upsample_tone(self):
        fs_in, fs_out = 6000, 12000
        r = Resampler(fs_in, fs_out, block_in=600, channels=1)
        assert r.block_out == 1200
        t = np.arange(3000) / fs_in
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[:, None]
        st = r.init_state()
        outs = []
        for i in range(5):
            st, y = r(st, jnp.asarray(x[i * 600:(i + 1) * 600]))
            outs.append(np.asarray(y))
        y = np.concatenate(outs)[:, 0]
        t_out = np.arange(len(y)) / fs_out
        # compare against the delayed ideal (2-sample input delay)
        ref = np.sin(2 * np.pi * 440.0 * (t_out - 2 / fs_in))
        err = np.sqrt(np.mean((y[50:] - ref[50:]) ** 2))
        assert err < 2e-3, err

    def test_irrational_block_rejected(self):
        with pytest.raises(ValueError):
            Resampler(6000, 8000, block_in=601, channels=1)

    def test_downsample(self):
        r = Resampler(12000, 4000, block_in=1200, channels=1)
        assert r.block_out == 400
