"""Checkpoint/resume: mid-stream state save restores bit-exactly."""

import numpy as np

from linrad_tpu import RxParams
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.pipeline import Receiver
from linrad_tpu.pipeline.checkpoint import load_receiver, save_receiver


def test_resume_is_exact(tmp_path):
    p = RxParams(first_fft_bandwidth=100.0, mix1_bandwidth_reduction_n=4,
                 second_fft_enable=True, blanker_enable=True,
                 clever_bln_limit=6.0, agc_enable=True,
                 target_fft1_frames_per_step=16)
    iq = None
    rx = Receiver(p)
    g = rx.geo
    rx.tune(12_000.0)
    iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 4, [Tone(12_400.0)])
    s = g.samples_per_step
    # run 2 steps, checkpoint, run 2 more
    for i in range(2):
        rx.process_block(iq[i * s:(i + 1) * s, None])
    path = str(tmp_path / "ckpt.npz")
    save_receiver(path, rx)
    rx2 = load_receiver(path)
    a1 = [np.asarray(rx.process_block(iq[i * s:(i + 1) * s, None]).audio)
          for i in range(2, 4)]
    a2 = [np.asarray(rx2.process_block(iq[i * s:(i + 1) * s, None]).audio)
          for i in range(2, 4)]
    np.testing.assert_array_equal(np.concatenate(a1),
                                  np.concatenate(a2))


def test_afc_state_survives(tmp_path):
    p = RxParams(first_fft_bandwidth=30.0, mix1_bandwidth_reduction_n=4,
                 afc_enable=True, agc_enable=False,
                 target_fft1_frames_per_step=16)
    rx = Receiver(p)
    g = rx.geo
    rx.tune(10_000.0)
    n = g.samples_per_step * 8
    t = np.arange(n) / g.rx_ad_speed
    iq = (0.3 * np.exp(2j * np.pi * 10_000.0 * t)).astype(np.complex64)
    for o in rx.run(iq):
        pass
    path = str(tmp_path / "afc.npz")
    save_receiver(path, rx)
    rx2 = load_receiver(path)
    assert rx2.afc.status == rx.afc.status
    assert rx2.afc.freq_hz == rx.afc.freq_hz
