"""fft1 stage tests: parity vs scipy STFT and variant equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from linrad_tpu import RxParams, derive_geometry
from linrad_tpu.ops import fft as fftlib
from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
from linrad_tpu.ops.windows import make_window
from linrad_tpu.io.siggen import Tone, tones_iq


def _geo(**kw):
    kw.setdefault("fft1_n_override", 9)
    return derive_geometry(RxParams(**kw))


class TestFFTVariants:
    def test_mxu_matches_xla(self):
        rng = np.random.default_rng(0)
        x = (rng.normal(size=(8, 256)) + 1j * rng.normal(size=(8, 256))
             ).astype(np.complex64)
        a = np.asarray(fftlib.fft(jnp.asarray(x), variant="xla"))
        b = np.asarray(fftlib.fft(jnp.asarray(x), variant="mxu"))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-2)

    @pytest.mark.parametrize("n", [4096, 16384])
    def test_four_step_large_n(self, n):
        """mxu variant above MXU_FFT_MAX_SIZE uses the Bailey four-step
        decomposition (two batched matmul DFT stages + twiddle)."""
        rng = np.random.default_rng(5)
        x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
             ).astype(np.complex64)
        y = np.asarray(fftlib.fft(jnp.asarray(x), variant="mxu"))
        ref = np.fft.fft(x, axis=-1)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(y / scale, ref / scale, atol=2e-5)
        z = np.asarray(fftlib.ifft(jnp.asarray(y), variant="mxu"))
        np.testing.assert_allclose(z, x, rtol=2e-4, atol=2e-4)

    def test_mxu_rejects_non_power_of_two(self):
        with pytest.raises(ValueError):
            fftlib.fft(jnp.zeros((2, 96), jnp.complex64), variant="mxu")

    def test_mxu_bf16_error_bound(self):
        """The bfloat16 MXU variant (the reference's int16-MMX-path
        tradeoff reborn, split.s) stays within ~3e-3 relative transform
        error at N=2048 (measured 2.2e-3) and round-trips within 2e-2;
        never selected by default."""
        rng = np.random.default_rng(2)
        x = (rng.normal(size=(16, 2048)) + 1j * rng.normal(size=(16, 2048))
             ).astype(np.complex64)
        ref = np.fft.fft(x, axis=-1)
        y = np.asarray(fftlib.fft(jnp.asarray(x), variant="mxu_bf16"))
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 3.5e-3
        z = np.asarray(fftlib.ifft(jnp.asarray(y), variant="mxu_bf16"))
        assert np.max(np.abs(z - x)) < 2.5e-2
        # default selection must NOT be bf16
        d = np.asarray(fftlib.fft(jnp.asarray(x)))
        assert np.max(np.abs(d - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_ifft_roundtrip(self):
        rng = np.random.default_rng(1)
        x = (rng.normal(size=(4, 128)) + 1j * rng.normal(size=(4, 128))
             ).astype(np.complex64)
        for v in ("xla", "mxu"):
            y = fftlib.ifft(fftlib.fft(jnp.asarray(x), variant=v), variant=v)
            np.testing.assert_allclose(np.asarray(y), x, rtol=1e-3,
                                       atol=1e-4)


class TestFFT1:
    def test_matches_scipy_stft(self):
        geo = _geo(first_fft_sinpow=2)
        tables = FFT1Tables.create(geo, edge_taper=False)
        state = FFT1State.create(geo)
        rng = np.random.default_rng(2)
        n = geo.samples_per_step
        x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(
            np.complex64)
        block = jnp.asarray(x[:, None])
        _, spec, _ = fft1_step(geo, tables, state, block, avg1num=8)
        spec = np.asarray(spec)[:, :, 0]
        # scipy STFT over the zero-padded stream (the tail carry prepends
        # interleave zeros, matching frame 0's coverage)
        pad = np.concatenate([np.zeros(geo.fft1_interleave_points,
                                       np.complex64), x])
        win = make_window(geo.fft1_size, 2)
        nfr = spec.shape[0]
        for b in range(nfr):
            seg = pad[b * geo.fft1_new_points:
                      b * geo.fft1_new_points + geo.fft1_size]
            ref = np.fft.fft(seg * win)
            np.testing.assert_allclose(spec[b], ref, rtol=1e-3, atol=1e-2)

    def test_tone_lands_in_correct_bin(self):
        geo = _geo(first_fft_sinpow=2)
        fs = geo.rx_ad_speed
        k = 37
        f = k * fs / geo.fft1_size
        x = tones_iq(fs, geo.samples_per_step, [Tone(f)])
        tables = FFT1Tables.create(geo)
        state = FFT1State.create(geo)
        _, spec, power = fft1_step(geo, tables, state,
                                   jnp.asarray(x[:, None]), avg1num=8)
        p = np.asarray(power)[:, 0]
        assert int(np.argmax(p)) == k

    def test_streaming_equals_batch(self):
        geo = _geo()
        tables = FFT1Tables.create(geo, edge_taper=False)
        rng = np.random.default_rng(3)
        n = geo.samples_per_step
        x = (rng.normal(size=2 * n) + 1j * rng.normal(size=2 * n)).astype(
            np.complex64)[:, None]
        s = FFT1State.create(geo)
        s1, spec1, _ = fft1_step(geo, tables, s, jnp.asarray(x[:n]), 8)
        _, spec2, _ = fft1_step(geo, tables, s1, jnp.asarray(x[n:]), 8)
        # one big virtual step: frame the whole stream
        big = np.concatenate([np.asarray(spec1), np.asarray(spec2)])
        from linrad_tpu.ops.framing import frame_stream, make_tail
        tail = make_tail(geo.fft1_size, geo.fft1_new_points, (1,))
        frames, _ = frame_stream(tail, jnp.asarray(x), geo.fft1_size,
                                 geo.fft1_new_points)
        ref = np.fft.fft(np.asarray(frames)
                         * np.asarray(tables.window)[None, :, None], axis=1)
        np.testing.assert_allclose(big, ref, rtol=1e-3, atol=1e-2)

    def test_calibration_multiply(self):
        geo = _geo()
        fc = np.exp(1j * np.linspace(0, np.pi, geo.fft1_size)).astype(
            np.complex64)
        t_id = FFT1Tables.create(geo, edge_taper=False)
        t_fc = FFT1Tables.create(geo, filtercorr=fc)
        rng = np.random.default_rng(4)
        n = geo.samples_per_step
        x = (rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
             ).astype(np.complex64)
        s = FFT1State.create(geo)
        _, a, _ = fft1_step(geo, t_id, s, jnp.asarray(x), 8)
        _, b, _ = fft1_step(geo, t_fc, s, jnp.asarray(x), 8)
        np.testing.assert_allclose(np.asarray(a) * fc[None, :, None],
                                   np.asarray(b), rtol=1e-4, atol=1e-3)
