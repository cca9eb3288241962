"""TX chain and polarization tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from linrad_tpu.tx import (SSBProcessor, SSBProcParams, am_modulate,
                           ascii_keying, cw_envelope, fm_modulate,
                           pilot_tone, radar_pulse_train, ssb_modulate)
from linrad_tpu.tx.keying import range_gate
from linrad_tpu.weak.cw import decode_morse
from linrad_tpu.weak.pol import (PolState, pol_info, update_polarization)


class TestKeying:
    def test_ascii_keying_decodes(self):
        fs = 8000.0
        key = ascii_keying("TEST", fs, 20)
        env = cw_envelope(key, fs)
        # the shaped envelope, used as audio, must decode back
        res = decode_morse(env.astype(np.complex64), fs)
        assert res.text == "TEST"

    def test_rise_time_limits_clicks(self):
        fs = 48_000.0
        key = np.zeros(48_000, np.float32)
        key[10_000:20_000] = 1.0
        hard = key * np.sin(2 * np.pi * 600 * np.arange(len(key)) / fs)
        soft = cw_envelope(key, fs, rise_s=0.005) * np.sin(
            2 * np.pi * 600 * np.arange(len(key)) / fs)
        def sideband_level(x):
            spec = np.abs(np.fft.rfft(x))
            f = np.fft.rfftfreq(len(x), 1 / fs)
            return spec[(f > 1200) & (f < 2400)].max() / spec.max()
        assert sideband_level(soft) < 0.1 * sideband_level(hard)

    def test_radar_train_and_gating(self):
        fs = 96_000.0
        tx = radar_pulse_train(fs, prf_hz=100.0, pulse_s=0.001,
                               duration_s=1.0)
        # echo delayed by 2 ms
        delay = int(0.002 * fs)
        rx = np.roll(tx, delay).astype(np.complex64)
        gates = range_gate(rx, fs, 100.0, 48)
        # echo spans 2..3 ms of the 10 ms period -> gates ~9.6..14.4,
        # peak near the middle of the echo pulse
        peak_gate = int(np.argmax(gates))
        assert 9 <= peak_gate <= 15


class TestModulators:
    def test_ssb_single_sided(self):
        fs = 8000.0
        t = np.arange(8192) / fs
        audio = np.sin(2 * np.pi * 700 * t)
        z = ssb_modulate(audio, fs, usb=True)
        spec = np.abs(np.fft.fft(z))
        f = np.fft.fftfreq(len(z), 1 / fs)
        upper = spec[(f > 600) & (f < 800)].max()
        lower = spec[(f < -600) & (f > -800)].max()
        assert 20 * np.log10(upper / lower) > 40

    def test_fm_deviation(self):
        fs = 48_000.0
        t = np.arange(48_000) / fs
        audio = np.sin(2 * np.pi * 1000 * t)
        z = fm_modulate(audio, fs, deviation_hz=3000.0)
        inst = np.diff(np.unwrap(np.angle(z))) * fs / (2 * np.pi)
        assert np.max(inst) == pytest.approx(3000.0, rel=0.05)

    def test_am_envelope(self):
        audio = np.sin(np.linspace(0, 20 * np.pi, 4000))
        z = am_modulate(audio, depth=0.5)
        env = np.abs(z)
        assert env.max() == pytest.approx(1.5, rel=0.02)
        assert env.min() == pytest.approx(0.5, rel=0.05)


class TestSSBProcessor:
    def test_agc_levels_speech(self):
        fs = 8000.0
        proc = SSBProcessor(fs, SSBProcParams())
        t = np.arange(16_384) / fs
        quiet = 0.01 * np.sin(2 * np.pi * 800 * t[:8192])
        loud = 1.0 * np.sin(2 * np.pi * 800 * t[8192:])
        out = proc.process(np.concatenate([quiet, loud]))
        rms_q = np.sqrt(np.mean(out[2000:8000] ** 2))
        rms_l = np.sqrt(np.mean(out[10_000:] ** 2))
        assert abs(20 * np.log10(rms_l / rms_q)) < 6.0

    def test_bandpass(self):
        fs = 8000.0
        proc = SSBProcessor(fs, SSBProcParams(filter_low_hz=300.0,
                                              filter_high_hz=2700.0))
        rng = np.random.default_rng(0)
        out = proc.process(rng.normal(size=16_384))
        spec = np.abs(np.fft.rfft(out))
        f = np.fft.rfftfreq(len(out), 1 / fs)
        inband = spec[(f > 500) & (f < 2500)].mean()
        outband = spec[f > 3300].mean()
        assert inband / max(outband, 1e-12) > 30


class TestPolarization:
    def test_matched_combination_gains_3db(self):
        """A 45-degree linearly polarized signal split over two channels
        recombines to full amplitude; a single channel has half power."""
        rng = np.random.default_rng(0)
        s = 8192
        t = np.arange(s)
        sig = np.exp(2j * np.pi * 0.01 * t)
        x = (sig / np.sqrt(2)
             + 0.1 * (rng.normal(size=s) + 1j * rng.normal(size=s)))
        y = (sig / np.sqrt(2)
             + 0.1 * (rng.normal(size=s) + 1j * rng.normal(size=s)))
        bb = jnp.asarray(np.stack([x, y], axis=1).astype(np.complex64))
        st = PolState.create()
        for _ in range(5):
            st, combined, w = update_polarization(st, bb)
        p_comb = np.mean(np.abs(np.asarray(combined)) ** 2)
        p_single = np.mean(np.abs(x) ** 2)
        assert 10 * np.log10(p_comb / p_single) > 2.0

    def test_pol_info_tilt(self):
        t = np.arange(4096)
        sig = np.exp(2j * np.pi * 0.013 * t)
        # 30-degree linear polarization
        ang = np.radians(30.0)
        bb = jnp.asarray(np.stack([np.cos(ang) * sig, np.sin(ang) * sig],
                                  axis=1).astype(np.complex64))
        st = PolState.create()
        for _ in range(20):
            st, _, _ = update_polarization(st, bb, alpha=0.5)
        info = pol_info(st)
        assert info.tilt_deg == pytest.approx(30.0, abs=3.0)
        assert info.axial_ratio_db > 20.0   # linear
        assert info.coherence > 0.9

    def test_circular_polarization(self):
        t = np.arange(4096)
        sig = np.exp(2j * np.pi * 0.013 * t)
        bb = jnp.asarray(np.stack([sig, 1j * sig], axis=1
                                  ).astype(np.complex64) / np.sqrt(2))
        st = PolState.create()
        for _ in range(20):
            st, _, _ = update_polarization(st, bb, alpha=0.5)
        info = pol_info(st)
        assert info.axial_ratio_db < 3.0    # circular
