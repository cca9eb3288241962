"""Observability, test modes, error system, and hook tests."""

import numpy as np
import pytest

from linrad_tpu import RxParams
from linrad_tpu.errors import LirError, lirerr
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.modes import adtest, measure_sample_rate, powtim, txtest
from linrad_tpu.pipeline import Receiver
from linrad_tpu.tx import ssb_modulate
from linrad_tpu.viz import (Waterfall, allan_deviation,
                            correlation_spectrum, oscilloscope_capture,
                            s_meter_dbm, save_gif, save_pgm, spectrum_db)


class TestWaterfall:
    def test_lines_and_scaling(self):
        wf = Waterfall(n_bins=128, depth=4, avg_steps=2)
        for i in range(10):
            p = np.full(128, 10.0 ** (i / 2))
            wf.add(p)
        db = wf.array_db
        assert db.shape == (4, 128)   # depth-limited, newest kept
        img = wf.image()
        assert img.dtype == np.uint8 and img.shape == db.shape

    def test_spectrum_db(self):
        p = np.array([1.0, 100.0])
        db = spectrum_db(p)
        assert db[1] - db[0] == pytest.approx(20.0)


class TestMeters:
    def test_s9(self):
        # S9 = -73 dBm
        dbm, label = s_meter_dbm(10 ** (-73 / 10))
        assert dbm == pytest.approx(-73.0)
        assert label.startswith("S9")

    def test_s_units(self):
        dbm, label = s_meter_dbm(10 ** (-97 / 10))
        assert label == "S5"  # 4 S-units below S9


class TestAllan:
    def test_white_fm_slope(self):
        """White frequency noise: adev ~ tau^-0.5 (the Allan graph's
        diagnostic slope, allan_graph.c)."""
        rng = np.random.default_rng(0)
        y = rng.normal(size=1 << 14)
        taus, adev = allan_deviation(y, tau0_s=1.0)
        ratio = adev[3] / adev[1]
        expect = (taus[1] / taus[3]) ** 0.5
        assert ratio == pytest.approx(expect, rel=0.2)


class TestCorrelation:
    def test_common_signal_correlates(self):
        rng = np.random.default_rng(1)
        n, size = 32, 256
        common = (rng.normal(size=(n, size))
                  + 1j * rng.normal(size=(n, size)))
        s = np.stack([common, common], axis=-1)
        s[..., 1] += 0.1 * (rng.normal(size=(n, size))
                            + 1j * rng.normal(size=(n, size)))
        c = correlation_spectrum(s)
        coh = np.abs(c) / np.mean(np.abs(common) ** 2, axis=0)
        assert coh.mean() > 0.9


class TestModes:
    def test_adtest(self):
        rng = np.random.default_rng(2)
        x = (0.25 * (rng.normal(size=8192) + 1j * rng.normal(size=8192))
             ).astype(np.complex64) + (0.01 + 0.02j)
        r = adtest(x, full_scale=4.0)
        assert r.dc_i == pytest.approx(0.01, abs=0.01)
        assert r.dc_q == pytest.approx(0.02, abs=0.01)
        assert r.clip_fraction == 0.0
        assert r.rms == pytest.approx(0.25 * np.sqrt(2), rel=0.05)

    def test_txtest_two_tone(self):
        fs = 48_000.0
        t = np.arange(1 << 15) / fs
        audio = np.sin(2 * np.pi * 700 * t) + np.sin(2 * np.pi * 1900 * t)
        z = ssb_modulate(audio, fs)
        # mild cubic nonlinearity -> IMD
        z_nl = z + 0.02 * z * np.abs(z) ** 2
        r = txtest(z_nl.astype(np.complex64), fs)
        assert r.occupied_bw_hz < 4000
        clean = txtest(z.astype(np.complex64), fs)
        assert clean.imd3_db < r.imd3_db  # nonlinearity raises IMD

    def test_powtim(self):
        fs = 96_000.0
        x = np.zeros(96_000, np.complex64)
        x[48_000:58_000] = 1.0
        t, p = powtim(x, fs, window_s=0.01)
        on = p > 0.5
        assert on.sum() == pytest.approx(10, abs=1)

    def test_measure_rate(self):
        assert measure_sample_rate(96_000, 1.0) == 96_000


class TestOsc:
    def test_capture(self):
        pwr = np.ones(1000)
        pwr[700] = 100.0
        weak = np.arange(1000) + 0j
        cap = oscilloscope_capture(weak, pwr, window=64)
        assert cap["maxpoint"] == 700
        assert len(cap["trace"]) == 64


class TestErrors:
    def test_lirerr(self):
        with pytest.raises(LirError) as e:
            lirerr(1450)
        assert e.value.code == 1450
        assert "input" in str(e.value)


class TestHooks:
    def test_user_hooks_fire(self):
        p = RxParams(fft1_n_override=9, agc_enable=False,
                     target_fft1_frames_per_step=8)
        rx = Receiver(p)
        calls = {"extra_fast": 0, "block": 0, "tune": 0}
        rx.add_hook("extra_fast",
                    lambda r, o: calls.__setitem__(
                        "extra_fast", calls["extra_fast"] + 1))
        rx.add_hook("block",
                    lambda r, o: calls.__setitem__(
                        "block", calls["block"] + 1))
        rx.add_hook("tune",
                    lambda r, f: calls.__setitem__(
                        "tune", calls["tune"] + 1))
        rx.tune(10_000.0)
        iq = tones_iq(rx.geo.rx_ad_speed, rx.geo.samples_per_step * 2,
                      [Tone(10_000.0)])
        for _ in rx.run(iq):
            pass
        assert calls == {"extra_fast": 2, "block": 2, "tune": 1}


class TestTransport:
    def test_pause_seek_pace(self):
        """Transport pause/resume/seek between steps + real-time pacing
        (the reference file input's diskread_pause_flag + rate pacing,
        menu.c:888, SURVEY.md §3.5)."""
        import threading
        import time

        from linrad_tpu.pipeline import Transport

        p = RxParams(fft1_n_override=9, agc_enable=False,
                     target_fft1_frames_per_step=8)
        rx = Receiver(p)
        s = rx.geo.samples_per_step
        iq = tones_iq(rx.geo.rx_ad_speed, s * 6, [Tone(10_000.0)])
        tr = Transport()
        tr.pause()
        got = []
        done = threading.Event()

        def consume():
            for k, _ in enumerate(rx.run(iq, transport=tr)):
                got.append(k)
            done.set()

        t = threading.Thread(target=consume)
        t.start()
        time.sleep(0.2)
        assert got == []                 # paused before the first step
        tr.seek(4 * s / rx.geo.timf1_sampling_speed)  # skip to step 4
        tr.resume()
        assert done.wait(30.0)
        t.join()
        assert len(got) == 2             # steps 4 and 5 only

        # pacing: 3 steps must take >= 2 step times
        t0 = time.monotonic()
        n = sum(1 for _ in rx.run(iq[: 3 * s], pace=True))
        dt = time.monotonic() - t0
        assert n == 3
        assert dt >= 2 * rx._step_seconds


class TestPGM:
    def test_save(self, tmp_path):
        img = np.arange(0, 100, dtype=np.uint8).reshape(10, 10)
        path = str(tmp_path / "w.pgm")
        save_pgm(path, img)
        with open(path, "rb") as f:
            assert f.readline().strip() == b"P5"


class TestSMeterLog:
    def test_averaged_lines(self, tmp_path):
        from linrad_tpu.viz import SMeterLogger
        path = str(tmp_path / "meter.txt")
        log = SMeterLogger(path, step_seconds=0.5, avg_steps=4)
        for _ in range(10):
            log.add(1e-7)     # -70 dBm per step
        lines = open(path).read().splitlines()
        assert len(lines) == 2            # 10 steps // 4
        t, dbm, label = lines[0].split()
        assert float(t) == 2.0
        assert float(dbm) == pytest.approx(-70.0, abs=0.1)
        assert label.startswith("S9")     # -70 dBm is above S9


class TestGIF:
    def test_roundtrip(self, tmp_path):
        """save_gif output must decode pixel-exact (via an independent
        decoder) — the gifsave.c:960 screen-dump analog."""
        PIL_Image = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(3)
        # waterfall-like content: smooth rows + noise, exercises LZW
        # runs and dictionary growth past one code width
        img = (np.cumsum(rng.integers(-3, 4, size=(90, 257)), axis=1)
               % 256).astype(np.uint8)
        path = str(tmp_path / "w.gif")
        save_gif(path, img)
        with open(path, "rb") as f:
            assert f.read(6) == b"GIF87a"
        decoded = np.asarray(PIL_Image.open(path))
        np.testing.assert_array_equal(decoded, img)

    def test_palette(self, tmp_path):
        PIL_Image = pytest.importorskip("PIL.Image")
        pal = np.zeros((256, 3), np.uint8)
        pal[:, 0] = np.arange(256)          # red ramp
        img = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
        path = str(tmp_path / "c.gif")
        save_gif(path, img, palette=pal)
        rgb = np.asarray(PIL_Image.open(path).convert("RGB"))
        np.testing.assert_array_equal(rgb[..., 0], img)
        assert rgb[..., 1:].max() == 0
