"""WAV I/O and synthetic generator tests."""

import numpy as np
import pytest

from linrad_tpu.io.siggen import (IG_CF1, IG_CF2, InternalGenerator, Tone,
                                  gaussian_noise, impulse_noise, tones_iq)
from linrad_tpu.io.wav import AuxiChunk, RcvrChunk, read_wav, write_wav


class TestWav:
    def test_roundtrip_iq16(self, tmp_path):
        rng = np.random.default_rng(0)
        iq = (rng.integers(-2000, 2000, size=(1000, 1))
              + 1j * rng.integers(-2000, 2000, size=(1000, 1))
              ).astype(np.complex64)
        path = str(tmp_path / "t.wav")
        write_wav(path, iq, 96_000, bits=16)
        back, info = read_wav(path)
        assert info.sample_rate == 96_000
        assert info.channels == 2
        np.testing.assert_allclose(back, iq)

    def test_roundtrip_24bit(self, tmp_path):
        rng = np.random.default_rng(1)
        iq = (rng.integers(-(1 << 20), 1 << 20, size=(500, 1))
              + 1j * rng.integers(-(1 << 20), 1 << 20, size=(500, 1))
              ).astype(np.complex64)
        path = str(tmp_path / "t24.wav")
        write_wav(path, iq, 192_000, bits=24)
        back, info = read_wav(path)
        assert info.bits == 24
        np.testing.assert_allclose(back, iq)

    def test_float32_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        iq = (rng.normal(size=(256, 2)) + 1j * rng.normal(size=(256, 2))
              ).astype(np.complex64)
        path = str(tmp_path / "tf.wav")
        write_wav(path, iq, 48_000, bits=32)
        back, info = read_wav(path)
        assert info.is_float and info.channels == 4
        np.testing.assert_allclose(back, iq, rtol=1e-6)

    def test_rcvr_chunk(self, tmp_path):
        rc = RcvrChunk(center_frequency_hz=144_125_000,
                       sampling_rate_idx=1, time_start=1_700_000_000,
                       atten_id=2, adc_dither=1)
        path = str(tmp_path / "p.wav")
        write_wav(path, np.zeros((64, 1), np.complex64), 125_000, rcvr=rc)
        _, info = read_wav(path)
        assert info.rcvr == rc

    def test_auxi_chunk(self, tmp_path):
        au = AuxiChunk(center_freq=14_100_000, ad_frequency=66_666_667,
                       bandwidth=190_000)
        path = str(tmp_path / "s.wav")
        write_wav(path, np.zeros((64, 1), np.complex64), 196_078, auxi=au)
        _, info = read_wav(path)
        assert info.auxi.center_freq == 14_100_000
        assert info.auxi.ad_frequency == 66_666_667


class TestSiggen:
    def test_tone_frequency(self):
        fs = 96_000
        x = tones_iq(fs, 8192, [Tone(1500.0)])
        spec = np.abs(np.fft.fft(x))
        f = np.fft.fftfreq(8192, 1 / fs)
        assert abs(f[np.argmax(spec)] - 1500.0) < fs / 8192

    def test_streaming_phase_continuity(self):
        fs = 96_000
        a = tones_iq(fs, 1000, [Tone(700.0)], start=0)
        b = tones_iq(fs, 1000, [Tone(700.0)], start=1000)
        both = tones_iq(fs, 2000, [Tone(700.0)], start=0)
        np.testing.assert_allclose(np.concatenate([a, b]), both, atol=1e-5)

    def test_internal_generator_structure(self):
        fs = 96_000
        gen = InternalGenerator(fs=fs, channels=1)
        x = gen(1 << 15)[:, 0]
        spec = np.abs(np.fft.fft(x))
        # strong carrier at IG_CF1 rad/sample (rxin.c:50)
        k = int(round(IG_CF1 / (2 * np.pi) * (1 << 15)))
        assert abs(int(np.argmax(spec)) - k) <= 1
        # keyed sideband visible around IG_CF2, ~60 dB down
        k2 = int(round(IG_CF2 / (2 * np.pi) * (1 << 15)))
        s2 = spec[k2 - 8: k2 + 8].max()
        ratio_db = 20 * np.log10(spec.max() / s2)
        # -60 dB amplitude, partially keyed (duty 1/4) -> spread spectrum;
        # measured peak ratio lands near 40 dB
        assert 30 < ratio_db < 80

    def test_noise_sigma(self):
        rng = np.random.default_rng(5)
        x = gaussian_noise(rng, 100_000, level_bits=6)
        # sigma = 2^(level/2) = 8 per component (lxsys.c:449-460)
        assert np.std(x.real) == pytest.approx(8.0, rel=0.05)

    def test_impulse_noise_deterministic(self):
        a = impulse_noise(np.random.default_rng(7), 10_000, 100.0, 96_000,
                          1000.0)
        b = impulse_noise(np.random.default_rng(7), 10_000, 100.0, 96_000,
                          1000.0)
        np.testing.assert_array_equal(a, b)
        assert np.abs(a).max() > 0
