"""Calibration tests: filtercorr measurement and I/Q balance (config 2
of BASELINE.json: 'caliq I/Q balance calibration + fft1 windowing')."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from linrad_tpu import RxParams, derive_geometry
from linrad_tpu.calibration import (apply_iq_correction,
                                    estimate_iq_balance, iq_imbalance,
                                    load_calibration, make_filtercorr,
                                    measure_response, save_calibration)
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.pipeline import Receiver


def _geo(**kw):
    kw.setdefault("fft1_n_override", 9)
    return derive_geometry(RxParams(**kw))


class TestFiltercorr:
    def _pulse_train(self, geo, h=None, n_pulses=24, seed=0):
        """Pulse generator recording, optionally through a channel h."""
        rng = np.random.default_rng(seed)
        n = geo.fft1_size * 2 * (n_pulses + 1)
        x = np.zeros(n, np.complex64)
        for k in range(1, n_pulses + 1):
            x[k * geo.fft1_size * 2] = 1000.0
        if h is not None:
            x = sps.lfilter(h, [1.0], x).astype(np.complex64)
        x += 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n)
                     ).astype(np.complex64)
        return x

    def test_flat_system_measures_flat(self):
        geo = _geo()
        x = self._pulse_train(geo)
        resp = measure_response(x, geo)
        mag = np.abs(resp[:, 0])
        assert mag.std() / mag.mean() < 0.1

    def test_corrects_channel_ripple(self):
        geo = _geo()
        # a deliberately rippled channel (poor analog filter)
        h = np.array([1.0, 0.0, 0.45, 0.0, -0.2])
        x = self._pulse_train(geo, h=h)
        resp = measure_response(x, geo)
        corr = make_filtercorr(resp)
        # corrected response = resp * corr should be flat
        total = np.abs(resp[:, 0] * corr[:, 0])
        ref = np.median(total)
        good = total > 0
        ripple_db = 20 * np.log10(total[good].max()
                                  / max(total[good].min(), 1e-12))
        raw = np.abs(resp[:, 0])
        raw_ripple_db = 20 * np.log10(raw.max() / raw.min())
        assert raw_ripple_db > 6.0       # channel really was rippled
        assert ripple_db < 1.0, ripple_db  # corrected flat within 1 dB

    def test_receiver_applies_filtercorr(self):
        p = RxParams(fft1_n_override=10, agc_enable=False)
        geo = derive_geometry(p)
        from linrad_tpu.ops.fft1 import edge_taper_response
        # half the default (tapered) response, so power is exactly 1/4
        fc = (0.5 * edge_taper_response(geo)).astype(np.complex64)
        rx_cal = Receiver(p, calibration={"filtercorr": fc})
        rx_ref = Receiver(p)
        iq = tones_iq(geo.rx_ad_speed, geo.samples_per_step,
                      [Tone(12_000.0)])
        rx_cal.tune(12_000.0)
        rx_ref.tune(12_000.0)
        a = rx_cal.process_block(iq[:, None])
        b = rx_ref.process_block(iq[:, None])
        np.testing.assert_allclose(np.asarray(a.fft1_power),
                                   0.25 * np.asarray(b.fft1_power),
                                   rtol=1e-4)


class TestIQBalance:
    def test_imbalance_creates_image(self):
        geo = _geo()
        fs = geo.rx_ad_speed
        x = tones_iq(fs, geo.fft1_size * 64, [Tone(10_000.0)])
        bad = iq_imbalance(x, gain=1.05, phase_rad=0.03)
        spec = np.abs(np.fft.fft(bad[: geo.fft1_size]))
        k = int(round(10_000.0 / fs * geo.fft1_size))
        image = spec[(-k) % geo.fft1_size]
        carrier = spec[k]
        assert 20 * np.log10(carrier / image) < 40  # visible image

    def test_calibration_suppresses_image(self):
        geo = _geo()
        fs = geo.rx_ad_speed
        rng = np.random.default_rng(1)
        # wideband training signal (noise covers all bins)
        n = geo.fft1_size * 1024
        train = (rng.normal(size=n) + 1j * rng.normal(size=n)
                 ).astype(np.complex64)
        bad_train = iq_imbalance(train, gain=1.05, phase_rad=0.03)
        c = estimate_iq_balance(bad_train, geo)
        # test on a tone
        tone = tones_iq(fs, geo.fft1_size * 4, [Tone(10_000.0)])
        bad = iq_imbalance(tone, gain=1.05, phase_rad=0.03)
        frames = bad[: geo.fft1_size * 4].reshape(4, geo.fft1_size, 1)
        spec = np.fft.fft(frames, axis=1)
        fixed = apply_iq_correction(spec, c)
        k = int(round(10_000.0 / fs * geo.fft1_size))
        mk = (-k) % geo.fft1_size
        before = np.abs(spec[:, mk, 0]).mean() / np.abs(
            spec[:, k, 0]).mean()
        after = np.abs(fixed[:, mk, 0]).mean() / np.abs(
            fixed[:, k, 0]).mean()
        improvement_db = 20 * np.log10(before / after)
        # limited by estimator statistics (~19 dB at this training size)
        assert improvement_db > 15.0, improvement_db

    def test_receiver_end_to_end_image_rejection(self):
        p = RxParams(fft1_n_override=10, agc_enable=False,
                     mix1_bandwidth_reduction_n=4)
        geo = derive_geometry(p)
        fs = geo.rx_ad_speed
        rng = np.random.default_rng(2)
        n = geo.fft1_size * 1024
        train = (rng.normal(size=n) + 1j * rng.normal(size=n)
                 ).astype(np.complex64)
        c = estimate_iq_balance(iq_imbalance(train, 1.06, 0.04), geo)
        rx = Receiver(p, calibration={"iq_corr": c})
        rx0 = Receiver(p)
        tone = tones_iq(fs, geo.samples_per_step * 2, [Tone(10_000.0)])
        bad = iq_imbalance(tone, 1.06, 0.04)
        k = int(round(10_000.0 / fs * geo.fft1_size))
        mk = (-k) % geo.fft1_size
        for r in (rx, rx0):
            r.tune(10_000.0)
        outs = [list(r.run(bad))[-1] for r in (rx, rx0)]
        p_cal = np.asarray(outs[0].fft1_power)[:, 0]
        p_ref = np.asarray(outs[1].fft1_power)[:, 0]
        rej_cal = 10 * np.log10(p_cal[k] / p_cal[mk])
        rej_ref = 10 * np.log10(p_ref[k] / p_ref[mk])
        assert rej_cal > rej_ref + 15.0

    def test_persistence_roundtrip(self, tmp_path):
        geo = _geo()
        fc = (np.ones(geo.fft1_size) * 1.5).astype(np.complex64)
        iqc = (0.01j * np.ones((geo.fft1_size, 1))).astype(np.complex64)
        path = str(tmp_path / "dsp_ssb_corr.npz")
        save_calibration(path, filtercorr=fc, iq_corr=iqc)
        back = load_calibration(path)
        np.testing.assert_array_equal(back["filtercorr"], fc)
        np.testing.assert_array_equal(back["iq_corr"], iqc)


class TestIntervalCalibration:
    """Iterative interval calibration (calsub2.c cal_update_ram +
    the live accumulation workflow of z_CALIBRATE.txt)."""

    def _pulse_train(self, geo, h=None, n_pulses=12, seed=0, noise=0.05,
                     channels=1, ch1_phase=0.0):
        rng = np.random.default_rng(seed)
        n = geo.fft1_size * 2 * (n_pulses + 1)
        x = np.zeros((n, channels), np.complex64)
        for k in range(1, n_pulses + 1):
            x[k * geo.fft1_size * 2, :] = 1000.0
        if h is not None:
            from scipy import signal as sps2
            x = sps2.lfilter(h, [1.0], x, axis=0).astype(np.complex64)
        if channels > 1:
            x[:, 1] *= np.exp(1j * ch1_phase)
        x += noise * (rng.normal(size=x.shape)
                      + 1j * rng.normal(size=x.shape)
                      ).astype(np.complex64)
        return x

    def test_averager_converges_and_flattens(self):
        from linrad_tpu.calibration import CalAverager
        geo = _geo()
        h = np.array([1.0, 0.0, 0.45, 0.0, -0.2])
        avgr = CalAverager(geo)
        deltas = []
        for seed in range(4):
            avgr.feed(self._pulse_train(geo, h=h, seed=seed))
            deltas.append(avgr.delta)
        assert avgr.pulse_count >= 40
        # successive intervals change the correction less and less
        assert deltas[-1] < deltas[1]
        assert avgr.converged(tol=0.05)
        total = np.abs(avgr.response[:, 0] * avgr.filtercorr[:, 0])
        good = total > 0
        ripple_db = 20 * np.log10(total[good].max()
                                  / max(total[good].min(), 1e-12))
        assert ripple_db < 1.5, ripple_db

    def test_channel_phase_alignment(self):
        from linrad_tpu.calibration import align_channel_phases
        geo = _geo()
        x = self._pulse_train(geo, channels=2, ch1_phase=0.6, noise=0.001)
        resp = measure_response(x, geo)
        aligned = align_channel_phases(resp)
        # per calsub2.c:391-397 the offset splits symmetrically: the two
        # channels' pulse phases now agree
        from linrad_tpu.calibration import _band_limited_pulse
        p0 = _band_limited_pulse(aligned[:, 0])
        p1 = _band_limited_pulse(aligned[:, 1])
        d = np.angle(p1[0]) - np.angle(p0[0])
        d = (d + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 0.02
        # and the correction really was needed
        q0 = _band_limited_pulse(resp[:, 0])
        q1 = _band_limited_pulse(resp[:, 1])
        d0 = np.angle(q1[0]) - np.angle(q0[0])
        assert abs(d0) > 0.5

    def test_mode_calibration_files(self, tmp_path):
        from linrad_tpu.calibration import (copy_mode_calibration,
                                            load_mode_calibration,
                                            mode_cal_path,
                                            save_mode_calibration)
        d = str(tmp_path)
        fc = (np.ones(64) + 0.1j).astype(np.complex64)
        save_mode_calibration(d, "ssb", filtercorr=fc)
        got = load_mode_calibration(d, "ssb")
        np.testing.assert_array_equal(got["filtercorr"], fc)
        # the documented copy-to-other-modes workflow
        copy_mode_calibration(d, "ssb", ["wcw", "cw"])
        for m in ("wcw", "cw"):
            got = load_mode_calibration(d, m)
            np.testing.assert_array_equal(got["filtercorr"], fc)
        assert load_mode_calibration(d, "fm") == {}
        with pytest.raises(ValueError):
            mode_cal_path(d, "nosuchmode")
