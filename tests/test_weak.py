"""Weak-signal layer tests: AFC, spur cancellation, CW/Morse, EME."""

import numpy as np
import pytest

from linrad_tpu import RxParams
from linrad_tpu.io.siggen import Tone, tones_iq
from linrad_tpu.pipeline import Receiver
from linrad_tpu.utils.llsq import (llsq_fit, mask_tophat_filter,
                                   parabolic_peak, polyfit_drift)
from linrad_tpu.weak import eme
from linrad_tpu.weak.cw import (decode_morse, detect_cw_speed, keyed_cw,
                                keying_spectrum)


class TestLLSQ:
    def test_polyfit(self):
        t = np.linspace(0, 10, 50)
        f = 3.0 + 2.0 * t - 0.1 * t ** 2
        c = polyfit_drift(t, f, 2)
        np.testing.assert_allclose(c, [3.0, 2.0, -0.1], atol=1e-8)

    def test_parabolic_peak(self):
        # samples of y = 5 - (x-0.3)^2 at x = -1, 0, 1
        y = lambda x: 5 - (x - 0.3) ** 2
        off, peak = parabolic_peak(y(-1), y(0), y(1))
        assert off == pytest.approx(0.3, abs=1e-9)
        assert peak == pytest.approx(5.0, abs=1e-9)

    def test_tophat(self):
        x = np.zeros(21)
        x[10] = 7.0
        s = mask_tophat_filter(7, x)
        assert s[10] == pytest.approx(1.0)
        assert s.sum() == pytest.approx(7.0, rel=1e-6)


class TestAFC:
    def _drifting(self, g, fc, drift, steps, amp=0.2, nl=0.05, seed=0):
        fs = g.rx_ad_speed
        n = g.samples_per_step * steps
        t = np.arange(n) / fs
        rng = np.random.default_rng(seed)
        return (amp * np.exp(2j * np.pi * (fc * t + 0.5 * drift * t ** 2))
                + nl * (rng.normal(size=n) + 1j * rng.normal(size=n))
                ).astype(np.complex64)

    def test_tracks_drifting_carrier(self):
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     afc_enable=True, filter_low_hz=-150.0,
                     filter_high_hz=150.0)
        rx = Receiver(p)
        g = rx.geo
        fc, drift = 10_000.0, 2.0
        rx.tune(fc)
        iq = self._drifting(g, fc, drift, 20)
        for _ in rx.run(iq):
            pass
        dur = len(iq) / g.rx_ad_speed
        assert rx.afc.status == 3  # tracking ok (afc_graph.c:374-378)
        expected = fc + drift * dur
        assert abs(rx.afc.freq_hz - expected) < 4 * g.fftx_bandwidth
        assert rx.afc.ston > 8.0

    def test_signal_lost_holds_frequency(self):
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     afc_enable=True)
        rx = Receiver(p)
        g = rx.geo
        fc = 10_000.0
        rx.tune(fc)
        iq = self._drifting(g, fc, 0.0, 8)
        for _ in rx.run(iq):
            pass
        assert rx.afc.status == 3
        freq_locked = rx.afc.freq_hz
        # now pure noise
        rng = np.random.default_rng(9)
        n = g.samples_per_step * 8
        noise = (0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                 ).astype(np.complex64)
        for _ in rx.run(noise):
            pass
        assert rx.afc.status == 4  # lost, constant frequency
        assert abs(rx.afc.freq_hz - freq_locked) < 2 * g.fftx_bandwidth

    def test_audio_stays_on_pitch_while_drifting(self):
        """The point of AFC: the demodulated tone stays at the BFO pitch
        while the RF drifts by many bins."""
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     afc_enable=True, bfo_hz=600.0,
                     filter_low_hz=-150.0, filter_high_hz=150.0)
        rx = Receiver(p)
        g = rx.geo
        fc, drift = 10_000.0, 2.0
        rx.tune(fc)
        iq = self._drifting(g, fc, drift, 24, nl=0.02)
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])[:, 0]
        # last quarter: drift ~ many bins, AFC locked
        a = audio[3 * len(audio) // 4:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / g.baseband_sampling_speed)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 600.0) < 3 * g.fftx_bandwidth, peak

    def _tone_purity_db(self, coherent: bool):
        """Demodulate a drifting carrier; return (rx, in-band SNR of the
        600 Hz audio tone over the last quarter)."""
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     afc_enable=True, afc_coherent=coherent,
                     bfo_hz=600.0,
                     filter_low_hz=-150.0, filter_high_hz=150.0)
        rx = Receiver(p)
        g = rx.geo
        fc, drift = 10_000.0, 2.0
        rx.tune(fc)
        iq = self._drifting(g, fc, drift, 24, nl=0.0)
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])[:, 0]
        a = audio[3 * len(audio) // 4:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
        freqs = np.fft.rfftfreq(len(a), 1 / g.baseband_sampling_speed)
        m = np.abs(freqs - 600.0) < 5.0
        sig = spec[m].sum()
        rest = spec.sum() - sig
        return rx, 10 * np.log10(sig / max(rest, 1e-30))

    def test_coherent_tracking_engages_and_cleans_the_line(self):
        """afc_coherent feeds (base bin, frac, slope) into the jitted
        step while locked (do_mix1_afc mix1.c:648) — the demodulated
        line is spectrally cleaner than stepped integer-bin retuning,
        and the Receiver really runs the slope signature."""
        rx_c, snr_c = self._tone_purity_db(True)
        rx_s, snr_s = self._tone_purity_db(False)
        assert rx_c.afc.status == 3 and rx_s.afc.status == 3
        # the production step consumed per-frame frac+slope arrays
        assert rx_c._tune_slope is not None
        assert np.asarray(rx_c._tune_slope).shape \
            == (rx_c.geo.fftx_frames_per_step,)
        assert np.asarray(rx_c._tune_frac).shape \
            == (rx_c.geo.fftx_frames_per_step,)
        # the stepped path must NOT engage the slope signature
        assert rx_s._tune_slope is None
        # coherent: no inter-frame phase jumps -> purer line
        assert snr_c > snr_s + 10.0, (snr_c, snr_s)
        assert snr_c > 10.0, snr_c


class TestSpur:
    def test_cancels_offchannel_carrier(self):
        base = dict(first_fft_bandwidth=100.0,
                    mix1_bandwidth_reduction_n=4, agc_enable=False,
                    filter_low_hz=-1500.0, filter_high_hz=1500.0)
        results = {}
        for spur_on in (False, True):
            rx = Receiver(RxParams(**base, spur_enable=spur_on))
            g = rx.geo
            fs = g.rx_ad_speed
            rx.tune(12_400.0)  # tuned ON the desired signal
            f_sig = 12_400.0 - rx.tuned_hz   # true baseband offsets
            f_spur = 12_900.0 - rx.tuned_hz
            n = g.samples_per_step * 10
            rng = np.random.default_rng(0)
            iq = (tones_iq(fs, n, [Tone(12_400.0, amplitude=0.1)])
                  + tones_iq(fs, n, [Tone(12_900.0, amplitude=20.0)])
                  + 0.01 * (rng.normal(size=n) + 1j * rng.normal(size=n)
                            ).astype(np.complex64))
            z = np.concatenate(
                [np.asarray(o.baseb) for o in rx.run(iq)])[:, 0]
            zz = z[2 * len(z) // 3:]
            t = np.arange(len(zz)) / g.baseband_sampling_speed
            pwr = lambda f: abs(np.vdot(np.exp(2j * np.pi * f * t), zz)
                                / len(zz)) ** 2
            results[spur_on] = (pwr(f_sig), pwr(f_spur))
        sig_off, spur_off = results[False]
        sig_on, spur_on_p = results[True]
        # spur suppressed by > 20 dB, signal within 3 dB
        assert 10 * np.log10(spur_off / spur_on_p) > 20.0
        assert abs(10 * np.log10(sig_on / sig_off)) < 3.0


class TestMorse:
    def test_speed_detection(self):
        fs = 6000.0
        for wpm in (12, 20, 35):
            cw = keyed_cw("PARIS PARIS PARIS PARIS", fs, wpm, 600.0)
            est = detect_cw_speed(np.abs(cw), fs)
            assert est == pytest.approx(wpm, rel=0.25), (wpm, est)

    def test_decode_clean(self):
        fs = 6000.0
        msg = "CQ TEST DE SM5BSZ K"
        cw = keyed_cw(msg, fs, 22, 600.0)
        res = decode_morse(cw, fs)
        assert res.text == msg

    def test_decode_noisy(self):
        fs = 6000.0
        rng = np.random.default_rng(3)
        msg = "CQ DX"
        cw = keyed_cw(msg, fs, 18, 600.0)
        cw = cw + 0.15 * (rng.normal(size=len(cw))
                          + 1j * rng.normal(size=len(cw)))
        res = decode_morse(cw, fs)
        assert res.text == msg

    def test_decode_ml_clean(self):
        from linrad_tpu.weak.cw import decode_morse_ml
        fs = 6000.0
        msg = "CQ TEST DE SM5BSZ K"
        cw = keyed_cw(msg, fs, 22, 600.0)
        assert decode_morse_ml(cw, fs).text == msg

    def test_decode_ml_beats_threshold_at_the_edge(self):
        """The Viterbi element-grammar decoder must not lose to the
        thresholded path at its failure point (-3 dB wideband SNR) —
        measured ~25% fewer character errors over seeds."""
        from linrad_tpu.weak.cw import decode_morse_ml

        def edist(a, b):
            m, n = len(a), len(b)
            d = np.arange(n + 1, dtype=int)
            for i in range(1, m + 1):
                prev = d.copy()
                d[0] = i
                for j in range(1, n + 1):
                    d[j] = min(prev[j] + 1, d[j - 1] + 1,
                               prev[j - 1] + (a[i - 1] != b[j - 1]))
            return int(d[n])

        fs = 4000.0
        msg = "CQ CQ DE SM5BSZ"
        z = keyed_cw(msg, fs, 20.0, 0.0)
        amp = 10 ** (3 / 20) / np.sqrt(2)
        e_thr = e_ml = 0
        for seed in range(6):
            rng = np.random.default_rng(100 + seed)
            noisy = z + amp * (rng.normal(size=len(z))
                               + 1j * rng.normal(size=len(z)))
            e_thr += edist(decode_morse(noisy, fs).text, msg)
            e_ml += edist(decode_morse_ml(noisy, fs).text, msg)
        assert e_ml <= e_thr, (e_ml, e_thr)
        assert e_ml <= 0.15 * 6 * len(msg), e_ml

    def test_learn_keying_ramp_and_ideal_waveform(self):
        """Edge-shape learning (collect_ramp) recovers the TX rise time
        and the synthesized ideal waveform (make_ideal_waveform)
        correlates >0.99 with the true envelope."""
        from linrad_tpu.weak.cw import (learn_keying_ramp,
                                        make_ideal_waveform)
        fs = 6000.0
        rng = np.random.default_rng(0)
        cw = keyed_cw("CQ CQ DE SM5BSZ", fs, 18, 0.0, rise_s=0.008)
        noisy = cw + 0.05 * (rng.normal(size=len(cw))
                             + 1j * rng.normal(size=len(cw)))
        res = decode_morse(noisy, fs)
        ramp = learn_keying_ramp(np.abs(noisy), fs, 1.2 / res.wpm,
                                 res.marks)
        assert ramp[0] < 0.1 and ramp[-1] > 0.9
        assert np.all(np.diff(ramp) >= 0)
        # the learned 10-90% rise time matches the TX rise time
        t10 = np.argmax(ramp > 0.1) / fs
        t90 = np.argmax(ramp > 0.9) / fs
        assert 0.002 < (t90 - t10) < 0.02, (t10, t90)
        # ideal waveform vs the true clean envelope
        sym = ".-.- "   # arbitrary symbol string
        ideal = make_ideal_waveform(sym, fs, 18, ramp)
        ref = make_ideal_waveform(sym, fs, 18, None)
        # correlation between shaped and hard keying still ~1 (the
        # shaping only softens edges)
        c = np.dot(ideal, ref) / max(np.linalg.norm(ideal)
                                     * np.linalg.norm(ref), 1e-12)
        assert c > 0.98, c

    def test_weak_signal_decode(self):
        """Matched-filter decode at +4 dB in-filter SNR: mostly correct
        (cwdetect.c-style matched filtering; a plain envelope threshold
        fails completely here)."""
        import difflib
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     bfo_hz=600.0, filter_low_hz=-150.0,
                     filter_high_hz=150.0)
        rx = Receiver(p)
        g = rx.geo
        msg = "CQ DX DE SM5BSZ"
        cw = keyed_cw(msg, g.rx_ad_speed, 15, 12_000.0, amplitude=0.05)
        pad = (-len(cw)) % g.samples_per_step
        rng = np.random.default_rng(1)
        cw = np.concatenate([cw, np.zeros(pad, np.complex64)])
        cw = cw + 0.4 * (rng.normal(size=len(cw))
                         + 1j * rng.normal(size=len(cw))
                         ).astype(np.complex64)
        rx.tune(12_000.0)
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(cw)])[:, 0]
        res = decode_morse(audio, g.baseband_sampling_speed)
        sim = difflib.SequenceMatcher(None, res.text, msg).ratio()
        assert sim > 0.8, (res.text, sim)
        assert res.wpm == pytest.approx(15, rel=0.15)

    def test_full_chain_decode(self):
        """RF keyed CW -> fft1 -> mix1 -> fft3 -> mix2 -> SSB audio ->
        Morse text (the config-5 weak-signal CW validation path)."""
        p = RxParams(first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     bfo_hz=700.0, filter_low_hz=-400.0,
                     filter_high_hz=400.0)
        rx = Receiver(p)
        g = rx.geo
        msg = "CQ CQ DE SM5BSZ"
        cw = keyed_cw(msg, g.rx_ad_speed, 20, 12_000.0)
        pad = ((len(cw) // g.samples_per_step + 1) * g.samples_per_step
               - len(cw))
        cw = np.concatenate([cw, np.zeros(pad, np.complex64)])
        rng = np.random.default_rng(1)
        cw = cw + 0.02 * (rng.normal(size=len(cw))
                          + 1j * rng.normal(size=len(cw))
                          ).astype(np.complex64)
        rx.tune(12_000.0)
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(cw)])[:, 0]
        res = decode_morse(audio, g.baseband_sampling_speed)
        assert res.text == msg
        assert res.wpm == pytest.approx(20, rel=0.2)


class TestEME:
    def test_locator_roundtrip(self):
        for loc in ("JO89XI", "FN20QR", "RE78IR"):
            lat, lon = eme.locator_to_latlon(loc)
            assert eme.latlon_to_locator(lat, lon) == loc

    def test_dist_az(self):
        # Stockholm JO89 to New York FN30 ~ 6300 km, az ~ 290-300
        d, az = eme.dist_az(59.3, 17.9, 40.7, -74.0)
        assert d == pytest.approx(6300, rel=0.05)
        assert 280 < az < 310

    def test_moon_position_sane(self):
        # 2026-01-01 00:00 UTC from Stockholm: sanity (ephemeris bounds)
        t = 1_767_225_600.0
        md = eme.moon_data(t, 59.3, 17.9)
        assert 0 <= md.azimuth < 360
        assert -90 < md.elevation < 90
        assert 356_000 < md.distance_km < 407_000
        # EME self doppler at 144 MHz is within +-450 Hz
        assert abs(md.doppler_hz) < 450

    def test_moon_motion(self):
        # the Moon moves ~13 deg/day eastward in RA
        t = 1_767_225_600.0
        a = eme.moon_data(t, 0.0, 0.0)
        b = eme.moon_data(t + 86400.0, 0.0, 0.0)
        dra = (b.ra_deg - a.ra_deg) % 360
        assert 10 < dra < 17.5  # 11-17 deg/day over the anomalistic month

    def test_dx_database(self, tmp_path):
        # DXDATA analog (globdef.h:849-855, wildcard search eme.c:262)
        db = eme.DxDatabase()
        db.add("SM5BSZ", locator="JO89IP")
        db.add("W5UN", lat=33.2, lon=-95.6)
        db.add("SM5FRH", locator="JO89XX")
        assert [s.call for s in db.match("SM5???")] == ["SM5BSZ",
                                                       "SM5FRH"]
        assert [s.call for s in db.match("?5")] == ["W5UN"]
        assert db.match("SM5BSZX") == []
        # text-file persistence, both entry syntaxes
        p = tmp_path / "dxdata"
        db.save(str(p))
        with open(p, "a") as f:
            f.write("K1JT FN20QI  # comment\n")
        db2 = eme.DxDatabase.load(str(p))
        assert db2.lookup("k1jt").locator == "FN20QI"
        assert db2.lookup("SM5BSZ").locator == "JO89IP"

    def test_dx_report_mutual(self):
        # both-end geometry consistent: mutual doppler of a station
        # with itself equals the self-echo doppler
        db = eme.DxDatabase()
        db.add("SELF", lat=59.3, lon=18.0)
        t = 1_767_225_600.0
        r = db.report("SELF", t, 59.3, 18.0)
        own = r["own_moon"]
        assert r["dx_moon"].elevation == pytest.approx(own.elevation)
        assert r["mutual_doppler_hz"] == pytest.approx(own.doppler_hz,
                                                       rel=0.05)
        assert r["distance_km"] == pytest.approx(0.0, abs=1.0)
        assert r["window_open"] == (own.elevation > 0)

    def test_keying_spectrum_peak(self):
        fs = 6000.0
        cw = keyed_cw("EEEEEEEEEE", fs, 24, 600.0)  # regular dots
        freqs, spec = keying_spectrum(np.abs(cw), fs)
        dot = 1.2 / 24
        f0 = freqs[np.argmax(spec[1:]) + 1]
        # 'E' stream = 1 dot on + 3 dots gap -> 4-dot period fundamental
        assert f0 == pytest.approx(1 / (4 * dot), rel=0.2)


class TestSiganal:
    """AM/PM noise separation (do_siganal, siganal_graph.c:112-266)."""

    def _mod_carrier(self, n, m_am, f_am, m_pm, f_pm, phase=0.3):
        t = np.arange(n)
        am = 1.0 + m_am * np.cos(2 * np.pi * f_am * t)
        pm = m_pm * np.sin(2 * np.pi * f_pm * t)
        return (am * np.exp(1j * (pm + phase))).astype(np.complex64)

    def test_separates_am_from_pm(self):
        from linrad_tpu.weak.siganal import signal_analysis
        size = 512
        x = self._mod_carrier(16 * size, 0.02, 20 / size, 0.04, 40 / size)
        r = signal_analysis(x, fft_n=9, sinpow=0)
        assert r.segments_used > 10
        # AM line in the AN spectrum at bin 20, amplitude m/2
        assert r.an_power[20, 0] == pytest.approx(0.01 ** 2, rel=0.05)
        # PM line in the PN spectrum at bin 40
        assert r.pn_power[40, 0] == pytest.approx(0.02 ** 2, rel=0.05)
        # and the cross-terms are far down
        assert r.pn_power[20, 0] < 1e-3 * r.an_power[20, 0]
        assert r.an_power[40, 0] < 1e-3 * r.pn_power[40, 0]
        assert r.carrier_power[0] == pytest.approx(1.0, rel=0.01)

    def test_incoherent_segments_skipped(self):
        from linrad_tpu.weak.siganal import signal_analysis
        rng = np.random.default_rng(0)
        x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
             ).astype(np.complex64)  # noise only: no coherent carrier
        r = signal_analysis(x, fft_n=9, sinpow=0)
        assert r.segments_used == 0
        assert r.segments_skipped > 0

    def test_two_channel_common_noise_correlates(self):
        from linrad_tpu.weak.siganal import signal_analysis
        size = 512
        rng = np.random.default_rng(1)
        n = 16 * size
        common_pm = 0.02 * rng.normal(size=n).cumsum() * 1e-2
        t = np.arange(n)
        base = np.exp(1j * (2 * np.pi * 0.0 * t + common_pm))
        ch0 = base * (1 + 0.001 * rng.normal(size=n))
        ch1 = base * (1 + 0.001 * rng.normal(size=n))
        x = np.stack([ch0, ch1], axis=1).astype(np.complex64)
        r = signal_analysis(x, fft_n=9, sinpow=2)
        assert r.segments_used > 0
        # common oscillator phase noise -> high PN correlation at low bins
        assert np.mean(r.pn_corr[1:8]) > 0.8


class TestCoherentModesWithAFC:
    """VERDICT r2 item 5 'done' criterion: a drifting keyed carrier
    demodulated in all three coherent modes (bg_coherent 0/1/2,
    mix2.c:1774-1900) with AFC engaged."""

    def _keyed_drifting(self, g, fc, drift, steps, seed=3):
        fs = g.rx_ad_speed
        n = g.samples_per_step * steps
        t = np.arange(n) / fs
        rng = np.random.default_rng(seed)
        # 2 Hz keying, 75% duty: AFC eval points mostly see carrier
        key = (np.mod(t * 2.0, 1.0) < 0.75).astype(np.float32)
        iq = (key * np.exp(2j * np.pi * (fc * t + 0.5 * drift * t ** 2))
              + 0.02 * (rng.normal(size=n) + 1j * rng.normal(size=n))
              ).astype(np.complex64)
        return iq, key

    def _run(self, demod, coherent_mode=2):
        from linrad_tpu.params import Demod
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     afc_enable=True, bfo_hz=600.0, demod=demod,
                     coherent_mode=coherent_mode,
                     filter_low_hz=-150.0, filter_high_hz=150.0)
        rx = Receiver(p)
        g = rx.geo
        fc, drift = 10_000.0, 1.5
        rx.tune(fc)
        iq, key = self._keyed_drifting(g, fc, drift, 24)
        audio = np.concatenate(
            [np.asarray(o.audio) for o in rx.run(iq)])
        assert rx.afc.status == 3          # tracking through the keying
        dur = len(iq) / g.rx_ad_speed
        assert abs(rx.afc.freq_hz - (fc + drift * dur)) \
            < 4 * g.fftx_bandwidth
        return g, audio, key

    def _tone_at(self, a, fs_bb, f_expect, tol):
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / fs_bb)
        return abs(freqs[np.argmax(spec)] - f_expect) < tol

    def test_mode0_plain_bfo(self):
        from linrad_tpu.params import Demod
        g, audio, _key = self._run(Demod.SSB)
        a = audio[3 * len(audio) // 4:, 0]
        assert self._tone_at(a, g.baseband_sampling_speed, 600.0,
                             3 * g.fftx_bandwidth)

    def test_mode1_signal_and_carrier_ears(self):
        from linrad_tpu.params import Demod
        g, audio, key = self._run(Demod.COHERENT, coherent_mode=1)
        assert audio.shape[1] == 2         # signal ear + carrier ear
        fs_bb = g.baseband_sampling_speed
        a_sig = audio[3 * len(audio) // 4:, 0]
        a_car = audio[3 * len(audio) // 4:, 1]
        assert self._tone_at(a_sig, fs_bb, 600.0, 3 * g.fftx_bandwidth)
        assert self._tone_at(a_car, fs_bb, 600.0, 3 * g.fftx_bandwidth)
        # the carrier ear's envelope follows the 75%-duty keying
        # (alignment-free: the chain delays audio by several frames, so
        # compare power quantiles instead of the absolute key timeline:
        # the key-up fifth of samples must be far below the key-down
        # half)
        env2 = np.abs(audio[len(audio) // 2:, 1]) ** 2
        q = np.sort(env2)
        p_up = q[: len(q) // 5].mean()
        p_dn = q[len(q) // 2:].mean()
        assert p_dn > 10.0 * p_up, (p_dn, p_up)

    def test_mode2_carrier_locked_iq(self):
        from linrad_tpu.params import Demod
        g, audio, _key = self._run(Demod.COHERENT, coherent_mode=2)
        a = audio[3 * len(audio) // 4:, 0]
        assert self._tone_at(a, g.baseband_sampling_speed, 600.0,
                             3 * g.fftx_bandwidth)


class TestWeakSignalQualification:
    """BASELINE config 5 qualification (VERDICT r2 item 8): the decode
    threshold of the FULL chain (fft1 -> mix1 -> fft3 -> mix2 + AFC +
    Morse decode) on a drifting keyed carrier, SNR referred to a
    2500 Hz bandwidth (the weak-signal convention).

    The full sweep (docs/WEAK_SIGNAL.md) measures error-free decode
    down to -4 dB; this regression test pins -2 dB (one notch of
    margin) exactly and +0 dB across a second seed."""

    MSG = "CQ DX DE SM5BSZ"

    def _run_chain_decode(self, snr_db, seed):
        from linrad_tpu.params import Demod
        from linrad_tpu.weak.cw import decode_morse_ml, keyed_cw

        fs = 96000.0
        fc = 10_000.0
        p = RxParams(first_fft_bandwidth=30.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     afc_enable=True, demod=Demod.COHERENT,
                     bfo_hz=600.0, filter_low_hz=-100.0,
                     filter_high_hz=100.0)
        rx = Receiver(p)
        g = rx.geo
        key = keyed_cw(self.MSG, fs, 20.0, 0.0)
        n = (len(key) // g.samples_per_step + 2) * g.samples_per_step
        sig = np.zeros(n, np.complex64)
        sig[:len(key)] = key
        t = np.arange(n) / fs
        clean = sig * np.exp(2j * np.pi * (fc * t + 0.25 * t ** 2))
        sigma = np.sqrt(1.0 / (2 * (2500 / fs) * 10 ** (snr_db / 10)))
        rng = np.random.default_rng(seed)
        iq = (clean + sigma * (rng.normal(size=n)
                               + 1j * rng.normal(size=n))
              ).astype(np.complex64)
        rx.tune(fc)
        bb = np.concatenate(
            [np.asarray(o.baseb) for o in rx.run(iq)])[:, 0]
        return decode_morse_ml(bb, g.baseband_sampling_speed).text

    def test_decodes_at_minus_2db_in_2500hz(self):
        assert self._run_chain_decode(-2.0, 1000) == self.MSG

    def test_decodes_at_0db_second_seed(self):
        assert self._run_chain_decode(0.0, 1001) == self.MSG

    def test_decodes_at_minus_6db_coherent(self):
        """The coherent Viterbi scorer (|sum z|^2 prefix-sum matched
        filtering of every candidate element) pushes the single-pass
        threshold to -6 dB/2500 Hz — the former collapse point
        (50-72 char errors with envelope statistics alone,
        docs/WEAK_SIGNAL.md)."""
        assert self._run_chain_decode(-6.0, 1001) == self.MSG
        import difflib
        got = self._run_chain_decode(-6.0, 1000)
        assert difflib.SequenceMatcher(None, got, self.MSG).ratio() \
            > 0.9, got

    def test_minus8_readable(self):
        """r5 (VERDICT r4 #5): fine speed-candidate grid + sixth-dot
        Viterbi cells + space emission keep the single-pass decode
        READABLE at -8 dB/2500 Hz (measured 4-5 errors of 49,
        docs/WEAK_SIGNAL.md r5 table; full-chain sweep 3-9/49).
        Decode-level pin on the 49-char crosscheck message: the
        Receiver-chain equivalent at -6 dB is pinned above, and the
        chain adds <=3 errors at -8 (measured)."""
        from linrad_tpu.weak.cw import decode_morse_ml, keyed_cw

        fs = 6000.0
        msg = "CQ CQ DE SM5BSZ SM5BSZ K"
        expect = ((msg + " ") * 2).strip()
        sig = keyed_cw((msg + " ") * 2, fs, 20.0, 0.0)
        n = len(sig)
        sigma = np.sqrt(1.0 / (2 * (2500 / fs) * 10 ** (-8.0 / 10)))
        for seed in (0, 1, 2):
            rng = np.random.default_rng(seed)
            z = sig + sigma * (rng.standard_normal(n)
                               + 1j * rng.standard_normal(n))
            spec = np.fft.fft(z)
            f = np.fft.fftfreq(n, 1 / fs)
            spec[np.abs(f) > 100.0] = 0       # the baseband filter
            bb = np.fft.ifft(spec).astype(np.complex64)
            got = decode_morse_ml(bb, fs).text
            # character error rate via edit distance
            m, k = len(got), len(expect)
            d = list(range(k + 1))
            for i in range(1, m + 1):
                prev, d[0] = d[0], i
                for j in range(1, k + 1):
                    cur = d[j]
                    d[j] = min(d[j] + 1, d[j - 1] + 1,
                               prev + (got[i - 1] != expect[j - 1]))
                    prev = cur
            assert d[k] <= 9, (seed, d[k], got)


class TestStackedDecode:
    """Repeated-message stacking (the QRSS/EME deep-integration regime,
    z_MORSE_DECODING.txt): decoding BELOW the -6 dB single-pass
    collapse by averaging message repeats (docs/WEAK_SIGNAL.md)."""

    FS = 4000.0
    TEXT = "CQ DE SM5BSZ"

    def _recording(self, reps, snr_db, seed=4):
        from linrad_tpu.weak.cw import keyed_cw
        sig = keyed_cw(self.TEXT, self.FS, 15.0, tone_hz=0.0)
        period = int(len(sig) + 2.0 * self.FS)
        one = np.zeros(period, np.complex64)
        one[:len(sig)] = sig
        z = np.tile(one, reps)
        rng = np.random.default_rng(seed)
        sigma = np.sqrt(10 ** (-snr_db / 10) / 2500.0 * self.FS / 2)
        return (z + sigma * (rng.standard_normal(len(z))
                             + 1j * rng.standard_normal(len(z))),
                period / self.FS)

    def test_blind_coherent_stack_at_minus_12db(self):
        """8 dB below the single-pass threshold, period found blind."""
        from linrad_tpu.weak.cw import (decode_stacked,
                                        estimate_repeat_period,
                                        refine_repeat_period,
                                        smooth_envelope)
        z, true_p = self._recording(24, -12)
        p = estimate_repeat_period(
            smooth_envelope(np.abs(z), self.FS, 30.0), self.FS,
            min_s=3.0)
        p = refine_repeat_period(z, self.FS, p)
        assert abs(p - true_p) < 0.002
        r = decode_stacked(z, self.FS, p, wpm_hint=15.0, coherent=True)
        assert self.TEXT in r.text

    def test_known_period_coherent_stack_at_minus_14db(self):
        """The operator-knows-the-cadence regime (standard EME)."""
        from linrad_tpu.weak.cw import decode_stacked, refine_repeat_period
        z, true_p = self._recording(32, -14)
        p = refine_repeat_period(z, self.FS, true_p, search=30)
        r = decode_stacked(z, self.FS, p, wpm_hint=15.0, coherent=True)
        assert self.TEXT in r.text

    def test_known_period_coherent_stack_at_minus_20db(self):
        """Coherent stack + the coherent Viterbi scorer compose:
        10·log10(64) ≈ 18 dB of stack gain over the −6 dB single-pass
        threshold.  (Measured clean to −28 dB at 192 repeats,
        docs/WEAK_SIGNAL.md; −20 dB/64 reps pinned with margin.)"""
        from linrad_tpu.weak.cw import decode_stacked, refine_repeat_period
        z, true_p = self._recording(64, -20)
        p = refine_repeat_period(z, self.FS, true_p, search=30)
        r = decode_stacked(z, self.FS, p, wpm_hint=15.0, coherent=True)
        assert self.TEXT in r.text

    def test_incoherent_stack_helps_without_phase(self):
        """No phase available at all (envelope-only input, e.g. a
        post-detection recording): the incoherent power stack lifts a
        -8 dB signal to a mostly readable decode while the single
        envelope pass is garbled.  (The single COMPLEX pass now
        decodes -8 dB by itself via the coherent in-repeat Viterbi
        scorer — so the fair stacking comparison is envelope vs
        stacked envelope.)"""
        from linrad_tpu.weak.cw import (decode_morse_ml, decode_stacked,
                                        refine_repeat_period)
        z, true_p = self._recording(16, -8)
        # scramble the phase per repeat
        per = int(true_p * self.FS)
        rng = np.random.default_rng(7)
        blocks = z[: 16 * per].reshape(16, per).copy()
        blocks *= np.exp(2j * np.pi * rng.random(16))[:, None]
        z = blocks.reshape(-1)
        single = decode_morse_ml(np.abs(z), self.FS, wpm_hint=15.0)
        stacked = decode_stacked(z, self.FS,
                                 refine_repeat_period(z, self.FS, true_p,
                                                      search=30),
                                 wpm_hint=15.0)

        def edit(a, b):
            import difflib
            return 1.0 - difflib.SequenceMatcher(None, a, b).ratio()

        # decode the best-aligned half of the doubled output
        best = min(edit(self.TEXT, stacked.text[i:i + len(self.TEXT)])
                   for i in range(max(len(stacked.text)
                                      - len(self.TEXT) + 1, 1)))
        worst_single = edit(self.TEXT,
                            single.text[:len(self.TEXT)])
        assert best < 0.35, (stacked.text, best)
        assert best < worst_single, (single.text, stacked.text)
