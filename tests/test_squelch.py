"""Squelch, notches, and expander tests (the mix2 full surface)."""

import numpy as np
import pytest

from linrad_tpu import RxParams
from linrad_tpu.io.siggen import Tone, tones_iq, gaussian_noise
from linrad_tpu.pipeline import Receiver


class TestSquelch:
    def test_gates_noise_opens_on_signal(self):
        p = RxParams(first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     squelch_enable=True, squelch_ratio=4.0,
                     squelch_tc_ms=5.0,
                     filter_low_hz=-300.0, filter_high_hz=300.0)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(12_000.0)
        rng = np.random.default_rng(0)
        n = g.samples_per_step * 8
        noise = gaussian_noise(rng, n, level_bits=-10)
        sig = tones_iq(g.rx_ad_speed, n, [Tone(12_100.0, amplitude=0.5)])
        # first half noise only, second half signal+noise
        iq = noise.copy()
        iq[n // 2:] += sig[n // 2:]
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])[:, 0]
        q = len(audio) // 4
        closed_rms = np.sqrt(np.mean(audio[q: 2 * q] ** 2))
        open_rms = np.sqrt(np.mean(audio[3 * q:] ** 2))
        assert open_rms > 20.0 * max(closed_rms, 1e-12)

    def test_notch_removes_tone(self):
        base = dict(first_fft_bandwidth=100.0,
                    mix1_bandwidth_reduction_n=4, agc_enable=False,
                    filter_low_hz=-1000.0, filter_high_hz=1000.0)
        rng = np.random.default_rng(1)
        results = {}
        for notch in ((), ((500.0, 80.0),)):
            rx = Receiver(RxParams(**base, notches=notch))
            g = rx.geo
            rx.tune(12_000.0)
            n = g.samples_per_step * 4
            iq = (tones_iq(g.rx_ad_speed, n, [Tone(12_200.0),
                                              Tone(12_500.0)]))
            z = np.concatenate(
                [np.asarray(o.baseb) for o in rx.run(iq)])[:, 0]
            zz = z[len(z) // 2:]
            t = np.arange(len(zz)) / g.baseband_sampling_speed
            pwr = lambda f: abs(np.vdot(np.exp(2j * np.pi * f * t), zz)
                                / len(zz)) ** 2
            results[bool(notch)] = (pwr(200.0), pwr(500.0))
        keep_ratio = results[True][0] / results[False][0]
        notch_ratio = results[True][1] / results[False][1]
        assert keep_ratio > 0.7                      # 200 Hz kept
        assert 10 * np.log10(notch_ratio) < -30.0    # 500 Hz notched

    def test_expander_suppresses_quiet(self):
        p = RxParams(first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=True,
                     expander_exponent=2.0)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(12_000.0)
        n = g.samples_per_step * 4
        rng = np.random.default_rng(2)
        # keyed carrier: strong half, silent half per step
        sig = tones_iq(g.rx_ad_speed, n, [Tone(12_400.0,
                                               key_period_s=0.4,
                                               key_duty=0.5)])
        iq = sig + gaussian_noise(rng, n, level_bits=-12)
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])[:, 0]
        env = np.abs(audio[len(audio) // 2:])
        hi = np.percentile(env, 90)
        lo = np.percentile(env, 30)
        # expansion pushes the quiet floor far below the peaks
        assert hi / max(lo, 1e-12) > 50.0
