"""Pallas fused-fft1 kernel parity (runs in interpret mode on the CPU
test mesh; the same kernel compiles via Mosaic on a real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linrad_tpu import RxParams, derive_geometry
from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
from linrad_tpu.ops.pallas_fft import fused_fft1


def _ref(frames, window, fc):
    spec = np.fft.fft(frames * window[None, :, None], axis=1)
    spec = spec * fc[None, :, :]
    return spec, np.sum(np.abs(spec) ** 2, axis=0)


class TestFusedFFT1:
    @pytest.mark.parametrize("b,n,c", [(16, 256, 1), (40, 512, 2),
                                       (128, 1024, 1), (3, 128, 1)])
    def test_matches_numpy(self, b, n, c):
        rng = np.random.default_rng(7)
        frames = (rng.normal(size=(b, n, c))
                  + 1j * rng.normal(size=(b, n, c))).astype(np.complex64)
        window = np.sin(np.pi * (np.arange(n) + 0.5) / n).astype(
            np.float32) ** 2
        fc = (rng.normal(size=(n, c))
              + 1j * rng.normal(size=(n, c))).astype(np.complex64) * 0.1
        spec, psum = fused_fft1(jnp.asarray(frames), jnp.asarray(window),
                                jnp.asarray(fc), interpret=True)
        ref_spec, ref_psum = _ref(frames, window, fc)
        np.testing.assert_allclose(np.asarray(spec), ref_spec,
                                   rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(psum), ref_psum,
                                   rtol=2e-3, atol=2e-2)

    def test_rejects_unsupported_size(self):
        x = jnp.zeros((4, 96, 1), jnp.complex64)
        with pytest.raises(ValueError):
            fused_fft1(x, jnp.zeros(96), jnp.zeros((96, 1), jnp.complex64),
                       interpret=True)

    def test_fft1_step_variant_parity(self):
        """fft1_step(variant='pallas') == fft1_step(variant='xla')."""
        p = RxParams(rx_ad_speed=96_000, first_fft_bandwidth=200.0,
                     target_fft1_frames_per_step=16)
        geo = derive_geometry(p)
        assert geo.fft1_size <= 1024
        rng = np.random.default_rng(3)
        tables = FFT1Tables.create(
            geo, filtercorr=(rng.normal(size=geo.fft1_size)
                             + 1j * rng.normal(size=geo.fft1_size)))
        block = (rng.normal(size=(geo.samples_per_step, 1))
                 + 1j * rng.normal(size=(geo.samples_per_step, 1))
                 ).astype(np.complex64)
        s0 = FFT1State.create(geo)
        s_a, spec_a, pow_a = fft1_step(geo, tables, s0, jnp.asarray(block),
                                       8, variant="xla")
        s_b, spec_b, pow_b = fft1_step(geo, tables, s0, jnp.asarray(block),
                                       8, variant="pallas")
        np.testing.assert_allclose(np.asarray(spec_a), np.asarray(spec_b),
                                   rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(pow_a), np.asarray(pow_b),
                                   rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(s_a.sumsq_avg),
                                   np.asarray(s_b.sumsq_avg),
                                   rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(s_a.tail),
                                   np.asarray(s_b.tail), rtol=1e-6)
