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


class TestSincResampler:
    def test_downsample_rejects_aliases(self):
        import jax.numpy as jnp
        from linrad_tpu.ops.resample import Resampler
        fs_in, fs_out = 48_000.0, 12_000.0
        n = 48_000
        t = np.arange(n) / fs_in
        # in-band tone + out-of-band tone that would alias to 1000 Hz
        x = (np.sin(2 * np.pi * 2000.0 * t)
             + np.sin(2 * np.pi * (fs_out + 1000.0) * t)).astype(
                 np.float32)
        r = Resampler(fs_in, fs_out, block_in=n, channels=1, taps=32)
        _, y = r(r.init_state(), jnp.asarray(x[:, None]))
        y = np.asarray(y)[:, 0][1000:]
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y)))) ** 2
        fr = np.fft.rfftfreq(len(y), 1 / fs_out)
        k2 = np.argmin(np.abs(fr - 2000.0))
        k1 = np.argmin(np.abs(fr - 1000.0))
        # wanted tone survives; the alias is rejected > 60 dB
        assert spec[k2] > 1e6 * spec[k1]

    def test_sinc_upsample_images_rejected(self):
        import jax.numpy as jnp
        from linrad_tpu.ops.resample import Resampler
        fs_in, fs_out = 6_000.0, 48_000.0
        n = 6_000
        t = np.arange(n) / fs_in
        x = np.sin(2 * np.pi * 1600.0 * t).astype(np.float32)
        r = Resampler(fs_in, fs_out, block_in=n, channels=1, taps=32)
        _, y = r(r.init_state(), jnp.asarray(x[:, None]))
        y = np.asarray(y)[:, 0][2000:]
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y)))) ** 2
        fr = np.fft.rfftfreq(len(y), 1 / fs_out)
        k = np.argmin(np.abs(fr - 1600.0))
        worst = max(spec[np.argmin(np.abs(fr - f))]
                    for f in (4400.0, 7600.0, 10400.0))
        assert spec[k] > 1e7 * worst        # > 70 dB

    def test_sinc_block_split_invariance(self):
        import jax.numpy as jnp
        from linrad_tpu.ops.resample import Resampler
        rng = np.random.default_rng(0)
        x = rng.standard_normal(4096).astype(np.float32)
        r = Resampler(8000.0, 32_000.0, block_in=2048, channels=1,
                      taps=32)
        st = r.init_state()
        st, y1 = r(st, jnp.asarray(x[:2048, None]))
        st, y2 = r(st, jnp.asarray(x[2048:, None]))
        split = np.concatenate([np.asarray(y1), np.asarray(y2)])[:, 0]
        r2 = Resampler(8000.0, 32_000.0, block_in=4096, channels=1,
                       taps=32)
        _, yf = r2(r2.init_state(), jnp.asarray(x[:, None]))
        np.testing.assert_array_equal(split, np.asarray(yf)[:, 0])
