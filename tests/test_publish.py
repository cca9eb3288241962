"""Tap publishing + format export tests (master/slave distributed op)."""

import numpy as np
import pytest

from linrad_tpu import RxParams
from linrad_tpu.io import taps
from linrad_tpu.io.publish import (TapPublisher, export_perseus_wav,
                                   export_powersdr_wav, export_qs1r_wav,
                                   export_spectravue_wav)
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.io.wav import read_wav
from linrad_tpu.pipeline import Receiver


class TestPublisher:
    def test_receiver_publishes_audio_tap(self):
        try:
            rx_net = taps.TapReceiver(taps.TAP_BASEB, timeout=2.0)
            pub = TapPublisher({taps.TAP_BASEB: "audio"})
        except OSError:
            pytest.skip("multicast unavailable")
        p = RxParams(fft1_n_override=9, agc_enable=False,
                     target_fft1_frames_per_step=16)
        rx = Receiver(p)
        pub.attach(rx)
        g = rx.geo
        rx.tune(10_000.0)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 2,
                      [Tone(10_200.0)])
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])
        # only whole PAYLOAD_BYTES packets are emitted; partial data
        # stays pending in the sender (do_network_send pacing semantics)
        n_payloads = audio.size * 4 // taps.PAYLOAD_BYTES
        assert n_payloads >= 1
        per = taps.PAYLOAD_BYTES // 4
        got = rx_net.recv_array(n_payloads * taps.PAYLOAD_BYTES,
                                np.float32)
        if not np.any(got):
            pytest.skip("multicast loopback not routed")
        flat = audio.reshape(-1).astype(np.float32)
        n = n_payloads * per
        np.testing.assert_array_equal(got[:n], flat[:n])
        pub.close()
        rx_net.close()


class TestExports:
    def test_spectravue(self, tmp_path):
        iq = (np.ones((512, 1)) * (0.2 - 0.1j)).astype(np.complex64) * 1000
        path = str(tmp_path / "sv.wav")
        export_spectravue_wav(path, iq, 196_078, 14_100_000)
        back, info = read_wav(path)
        assert info.auxi.center_freq == 14_100_000
        assert info.auxi.ad_frequency == 196_078

    def test_perseus(self, tmp_path):
        iq = (np.ones((512, 1)) * (0.1 + 0.3j)).astype(np.complex64) * 1e5
        path = str(tmp_path / "p.wav")
        export_perseus_wav(path, iq, 250_000, 144_125_000)
        back, info = read_wav(path)
        assert info.rcvr.center_frequency_hz == 144_125_000
        assert info.rcvr.sampling_rate_idx == 1
        assert info.bits == 24

    def test_powersdr(self, tmp_path):
        # sim2powersdr.c: float32 WAV normalized to +-1
        iq = (np.full((256, 1), 16384 + 8192j)).astype(np.complex64)
        path = str(tmp_path / "ps.wav")
        export_powersdr_wav(path, iq, 96_000)
        back, info = read_wav(path)
        assert info.bits == 32
        np.testing.assert_allclose(back[:, 0].real, 0.5, rtol=1e-6)
        np.testing.assert_allclose(back[:, 0].imag, 0.25, rtol=1e-6)

    def test_qs1r(self, tmp_path):
        # sim2qs1r.c: 32-bit int PCM, rcvr chunk preserved
        iq = (np.full((256, 1), 16384 - 16384j)).astype(np.complex64)
        path = str(tmp_path / "qs.wav")
        export_qs1r_wav(path, iq, 250_000, center_freq_hz=7_050_000)
        back, info = read_wav(path)
        assert info.bits == 32
        assert info.rcvr.center_frequency_hz == 7_050_000
        # int32 full scale maps back to +-0.5 of int32 range
        np.testing.assert_allclose(back[:, 0].real / 2147483647.0, 0.5,
                                   rtol=1e-6)
