"""BatchRunner: scan-rolled steps equal streamed steps exactly."""

import numpy as np

from linrad_tpu import RxParams
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.pipeline import Receiver
from linrad_tpu.pipeline.batch import BatchRunner


def test_batch_equals_streamed():
    p = RxParams(first_fft_bandwidth=100.0, mix1_bandwidth_reduction_n=4,
                 second_fft_enable=True, blanker_enable=True,
                 clever_bln_limit=6.0, agc_enable=True,
                 target_fft1_frames_per_step=16)
    br = BatchRunner(p, k_steps=4)
    rx = Receiver(p)
    g = rx.geo
    br.tune(12_000.0)
    rx.tune(12_000.0)
    rng = np.random.default_rng(0)
    n = br.samples_per_call
    iq = (tones_iq(g.rx_ad_speed, n, [Tone(12_400.0)])
          + 0.02 * (rng.normal(size=n) + 1j * rng.normal(size=n)
                    ).astype(np.complex64))
    iq[::5001] += 40.0
    got = br.process(iq)
    streamed_audio = np.concatenate(
        [np.asarray(o.audio) for o in rx.run(iq)])
    np.testing.assert_allclose(got["audio"], streamed_audio, atol=1e-3)
    # (small float differences: XLA fuses the scan body differently)


def test_batch_narrowband():
    p = RxParams(fft1_n_override=9, agc_enable=False,
                 target_fft1_frames_per_step=8)
    br = BatchRunner(p, k_steps=3, outputs=("baseb",))
    g = br.geo
    br.tune(10_000.0)
    iq = tones_iq(g.rx_ad_speed, br.samples_per_call * 2,
                  [Tone(10_200.0)])
    got = br.process(iq)
    z = got["baseb"][:, 0]
    zz = z[len(z) // 2:]
    # true baseband offset accounts for the tune-bin quantisation
    tuned = (int(np.asarray(br._tune_bin)) * g.timf1_sampling_speed
             / g.fftx_size)
    f_bb = 10_200.0 - tuned
    t = np.arange(len(zz)) / g.baseband_sampling_speed
    amp = abs(np.vdot(np.exp(2j * np.pi * f_bb * t), zz) / len(zz))
    assert abs(amp - 1.0) < 0.01
