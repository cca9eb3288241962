"""Mode presets, coherent demod, and 2-channel coverage."""

import numpy as np
import pytest

from linrad_tpu import Demod, RxMode, RxParams, derive_geometry, preset
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.pipeline import Receiver


class TestPresets:
    @pytest.mark.parametrize("mode", list(RxMode))
    def test_geometry_derives(self, mode):
        g = derive_geometry(preset(mode))
        assert g.samples_per_step > 0
        assert g.baseband_samples_per_step > 0

    def test_wcw_is_full_chain(self):
        p = preset(RxMode.WCW)
        assert p.second_fft_enable and p.blanker_enable and p.afc_enable
        assert p.demod == Demod.COHERENT

    @pytest.mark.parametrize("mode", [RxMode.SSB, RxMode.NCW, RxMode.AM])
    def test_receiver_runs(self, mode):
        p = preset(mode, fft1_n_override=9,
                   target_fft1_frames_per_step=8, afc_enable=False)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(10_000.0)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step,
                      [Tone(10_200.0)])
        out = rx.process_block(iq[:, None])
        assert np.all(np.isfinite(np.asarray(out.audio)))


class TestCoherentDemod:
    def test_tone_detected(self):
        p = RxParams(first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     demod=Demod.COHERENT, bfo_hz=600.0,
                     filter_low_hz=-300.0, filter_high_hz=300.0)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(12_000.0)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 4,
                      [Tone(12_100.0)])
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])[:, 0]
        a = audio[len(audio) // 2:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        fr = np.fft.rfftfreq(len(a), 1 / g.baseband_sampling_speed)
        assert fr[np.argmax(spec)] == pytest.approx(700.0, abs=10.0)


class TestTwoChannel:
    def test_narrowband_preserves_channel_ratio(self):
        p = RxParams(rx_rf_channels=2, first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(12_000.0)
        one = tones_iq(g.rx_ad_speed, g.samples_per_step * 3,
                       [Tone(12_400.0)])
        iq = np.stack([one, 0.5 * one], axis=1)
        z = np.concatenate([np.asarray(o.baseb) for o in rx.run(iq)])
        tail = z[-1000:]
        ratio = np.abs(tail[:, 1]).mean() / np.abs(tail[:, 0]).mean()
        assert ratio == pytest.approx(0.5, rel=0.02)

    def test_wideband_runs_with_blanker(self):
        p = RxParams(rx_rf_channels=2, first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     second_fft_enable=True, blanker_enable=True,
                     clever_bln_limit=6.0, stupid_bln_limit=4.0,
                     target_fft1_frames_per_step=16)
        rx = Receiver(p)
        g = rx.geo
        rx.tune(12_000.0)
        rng = np.random.default_rng(0)
        one = tones_iq(g.rx_ad_speed, g.samples_per_step * 4,
                       [Tone(12_400.0)])
        noise = (0.02 * (rng.normal(size=(len(one), 2))
                         + 1j * rng.normal(size=(len(one), 2)))
                 ).astype(np.complex64)
        iq = np.stack([one, one], axis=1) + noise
        # strong pulses: the noise-floor tracker starts at the
        # reference's conservative 200 (buf.c:415-427) and needs ~1 s
        # to settle; keep the short test above threshold from step 2
        iq[::9973] += 80.0
        outs = list(rx.run(iq))
        assert np.all(np.isfinite(np.asarray(outs[-1].baseb)))
        assert sum(int(o.blanker_fitted) for o in outs) > 0
