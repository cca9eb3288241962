"""Real-input (non-IQ) mode tests: the soundcard / direct-sampling path
(rx_input_mode without IQ_DATA; real->complex fold, buf.c:47-51)."""

import numpy as np
import pytest

from linrad_tpu import InputMode, RxParams, derive_geometry
from linrad_tpu.pipeline import Receiver


class TestRealMode:
    def test_rate_halved(self):
        g = derive_geometry(RxParams(input_mode=InputMode.REAL))
        assert g.timf1_sampling_speed == g.rx_ad_speed / 2

    def test_tone_through_chain(self):
        p = RxParams(input_mode=InputMode.REAL,
                     first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     filter_low_hz=-1000.0, filter_high_hz=1000.0)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(12_000.0)
        n = 2 * g.samples_per_step * 4
        t = np.arange(n) / g.rx_ad_speed
        x = np.cos(2 * np.pi * 12_400.0 * t).astype(np.float32)
        z = np.concatenate(
            [np.asarray(o.baseb) for o in rx.run(x)])[:, 0]
        zz = z[len(z) // 2:]
        tt = np.arange(len(zz)) / g.baseband_sampling_speed
        ref = np.exp(2j * np.pi * 400.0 * tt)
        amp = np.vdot(ref, zz) / len(zz)
        resid = zz - amp * ref
        snr = 10 * np.log10(np.vdot(zz, zz).real
                            / max(np.vdot(resid, resid).real, 1e-30))
        assert abs(amp) == pytest.approx(1.0, rel=5e-3)
        assert snr > 45.0, snr

    def test_spectrum_one_sided(self):
        p = RxParams(input_mode=InputMode.REAL, fft1_n_override=10,
                     agc_enable=False)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(10_000.0)
        n = 2 * g.samples_per_step
        t = np.arange(n) / g.rx_ad_speed
        x = np.cos(2 * np.pi * 10_000.0 * t).astype(np.float32)
        out = rx.process_block(x[:, None])
        power = np.asarray(out.fft1_power)[:, 0]
        # bin width = (fs/2)/fft1_size; peak at the tone
        k = int(round(10_000.0 / (g.rx_ad_speed / 2) * g.fft1_size))
        assert abs(int(np.argmax(power)) - k) <= 1
