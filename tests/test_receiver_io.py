"""Receiver integration: file streaming via native prefetcher, audio
output-rate resampling."""

import numpy as np
import pytest

from linrad_tpu import RxParams
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.io.wav import write_wav
from linrad_tpu.pipeline import Receiver


def _params(**kw):
    kw.setdefault("fft1_n_override", 9)
    kw.setdefault("agc_enable", False)
    kw.setdefault("target_fft1_frames_per_step", 8)
    kw.setdefault("mix1_bandwidth_reduction_n", 4)
    return RxParams(**kw)


class TestRunFile:
    def test_matches_inmemory(self, tmp_path):
        p = _params()
        rx_mem = Receiver(p)
        rx_file = Receiver(p)
        g = rx_mem.geo
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 3,
                      [Tone(10_200.0, amplitude=1000.0)])
        iq = np.round(iq.real) + 1j * np.round(iq.imag)
        iq = iq.astype(np.complex64)
        path = str(tmp_path / "rec.wav")
        write_wav(path, iq[:, None], g.rx_ad_speed, bits=16)
        rx_mem.tune(10_000.0)
        rx_file.tune(10_000.0)
        a_mem = np.concatenate(
            [np.asarray(o.audio) for o in rx_mem.run(iq)])
        a_file = np.concatenate(
            [np.asarray(o.audio) for o in rx_file.run_file(path)])
        np.testing.assert_allclose(a_file, a_mem, atol=1e-3)


class TestFrequencyControl:
    """RF-dial tuning (freq_control.c): centre frequency from capture
    metadata + converter offset + passband direction."""

    def test_tune_rf_mapping(self):
        rx = Receiver(_params(converter_offset_hz=116_000_000.0))
        rx.center_frequency_hz = 28_000_000.0
        rx.tune_rf(144_028_200.0)  # 2 m dial through a 116 MHz converter
        assert rx.tuned_hz == pytest.approx(28_200.0,
                                            abs=rx.geo.fftx_bin_hz
                                            if hasattr(rx.geo,
                                                       "fftx_bin_hz")
                                            else 200.0)
        assert rx.tuned_rf_hz == pytest.approx(144_028_200.0, abs=200.0)

    def test_inverting_converter(self):
        rx = Receiver(_params(passband_direction=-1))
        rx.center_frequency_hz = 10_000_000.0
        rx.tune_rf(9_990_000.0)  # 10 kHz below centre, inverted
        assert rx.tuned_hz == pytest.approx(10_000.0, abs=200.0)
        assert rx.tuned_rf_hz == pytest.approx(9_990_000.0, abs=200.0)

    def test_center_from_rcvr_chunk(self, tmp_path):
        from linrad_tpu.io.wav import RcvrChunk
        p = _params()
        rx = Receiver(p)
        g = rx.geo
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step,
                      [Tone(1_000.0, amplitude=1000.0)])
        path = str(tmp_path / "tagged.wav")
        write_wav(path, iq.astype(np.complex64)[:, None], g.rx_ad_speed,
                  bits=16,
                  rcvr=RcvrChunk(center_frequency_hz=14_100_000))
        for _ in rx.run_file(path):
            pass
        assert rx.center_frequency_hz == 14_100_000.0


class TestAudioResample:
    def test_output_rate(self):
        p = _params()
        # baseband rate derived; pick 2x
        base = Receiver(p)
        fs_bb = base.geo.baseband_sampling_speed
        rx = Receiver(p, audio_out_rate=2 * fs_bb)
        g = rx.geo
        rx.tune(10_000.0)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 4,
                      [Tone(10_200.0)])
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])[:, 0]
        assert len(audio) == 2 * 4 * g.baseband_samples_per_step
        # the tone lands at the same absolute frequency at the new rate
        a = audio[len(audio) // 2:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / (2 * fs_bb))
        # fractional-bin tuning is exact: the LO sits at 10 kHz
        tuned = rx.tuned_hz
        assert tuned == pytest.approx(10_000.0, abs=1e-3)
        peak = freqs[np.argmax(spec)]
        assert peak == pytest.approx((10_200.0 - tuned) + p.bfo_hz,
                                     abs=5.0)
