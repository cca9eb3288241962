"""End-to-end chain tests: fft1 -> mix1 -> fft3 -> mix2 -> demod.

The parity metric follows the reference's validation model (SURVEY.md §4:
recorded/synthetic replay, audio SNR): a pure tone through the whole
chain must come out amplitude-true and spectrally clean.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from linrad_tpu import Demod, RxParams
from linrad_tpu.pipeline import Receiver
from linrad_tpu.io.siggen import Tone, tones_iq


def _fit_tone_snr(z: np.ndarray, freq_hz: float, fs: float) -> float:
    """SNR (dB) of a complex stream against the best-fit tone at freq."""
    t = np.arange(len(z)) / fs
    ref = np.exp(2j * np.pi * freq_hz * t)
    amp = np.vdot(ref, z) / len(z)
    resid = z - amp * ref
    return 10 * np.log10(np.vdot(z, z).real / max(np.vdot(resid,
                                                          resid).real,
                                                  1e-30))


def _rx(**kw):
    kw.setdefault("first_fft_bandwidth", 100.0)
    kw.setdefault("mix1_bandwidth_reduction_n", 4)
    kw.setdefault("agc_enable", False)
    return Receiver(RxParams(**kw))


class TestSSBChain:
    def test_tone_amplitude_and_purity(self):
        rx = _rx()
        g = rx.geo
        fc, delta = 12_000.0, 400.0
        rx.tune(fc)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 10,
                      [Tone(fc + delta)])
        out = rx.process(iq)
        z = out["baseb"][len(out["baseb"]) // 3:, 0]
        snr = _fit_tone_snr(z, delta, g.baseband_sampling_speed)
        assert snr > 70.0, snr
        # amplitude-true within 0.1%
        assert np.abs(z).mean() == pytest.approx(1.0, rel=1e-3)

    def test_audio_frequency(self):
        rx = _rx(bfo_hz=800.0)
        g = rx.geo
        rx.tune(12_000.0)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 8,
                      [Tone(12_400.0)])
        audio = rx.process(iq)["audio"][:, 0]
        a = audio[len(audio) // 3:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / g.baseband_sampling_speed)
        assert freqs[np.argmax(spec)] == pytest.approx(1200.0, abs=2.0)

    def test_out_of_band_rejection(self):
        rx = _rx(filter_low_hz=-1000.0, filter_high_hz=1000.0)
        g = rx.geo
        rx.tune(12_000.0)
        # in-band + far out-of-band tone (outside mix1 selection)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 6,
                      [Tone(12_300.0), Tone(30_000.0, amplitude=100.0)])
        z = rx.process(iq)["baseb"][:, 0]
        zz = z[len(z) // 3:]
        snr = _fit_tone_snr(zz, 300.0, g.baseband_sampling_speed)
        assert snr > 60.0, snr

    def test_mixer_mode2_fir_amplitude_and_purity(self):
        # time-domain FIR decimator path (mix2.c:217-245), with real
        # decimation (mix2_reduction_n=2 -> stride 4)
        rx = _rx(mixer_mode=2, mix2_reduction_n=2, demod=Demod.NONE)
        g = rx.geo
        fc, delta = 12_000.0, 150.0
        rx.tune(fc)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 10,
                      [Tone(fc + delta)])
        z = rx.process(iq)["baseb"][:, 0]
        zz = z[len(z) // 3:]
        snr = _fit_tone_snr(zz, delta, g.baseband_sampling_speed)
        assert snr > 60.0, snr
        assert np.abs(zz).mean() == pytest.approx(1.0, rel=2e-2)

    def test_mixer_mode2_matches_frequency_domain_path(self):
        # both mixer modes realise the same filter: equal tone gain in
        # the passband, and the FIR must reject a tone the
        # frequency-domain filter rejects
        common = dict(mix2_reduction_n=2, demod=Demod.NONE,
                      filter_low_hz=-400.0, filter_high_hz=400.0)
        amps = {}
        for mode in (1, 2):
            rx = _rx(mixer_mode=mode, **common)
            g = rx.geo
            rx.tune(12_000.0)
            iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 8,
                          [Tone(12_150.0),
                           Tone(12_000.0 + 0.45
                                * g.baseband_sampling_speed,
                                amplitude=10.0)])
            z = rx.process(iq)["baseb"][:, 0]
            zz = z[len(z) // 3:]
            t = np.arange(len(zz)) / g.baseband_sampling_speed
            amps[mode] = np.abs(np.vdot(np.exp(2j * np.pi * 150.0 * t),
                                        zz) / len(zz))
            snr = _fit_tone_snr(zz, 150.0, g.baseband_sampling_speed)
            assert snr > 40.0, (mode, snr)
        assert amps[2] == pytest.approx(amps[1], rel=2e-2)

    def test_multi_subreceiver(self):
        # one wideband front end, K independently tuned sub-receivers
        # (MIX1_NO_OF_CHANNELS analog) — each must match a single
        # receiver tuned to the same frequency exactly
        import jax
        import jax.numpy as jnp
        from linrad_tpu import derive_geometry
        from linrad_tpu.pipeline.chain import (NBState, RxState,
                                               RxTables,
                                               make_multi_rx_step,
                                               make_rx_step)

        p = RxParams(first_fft_bandwidth=100.0,
                     mix1_bandwidth_reduction_n=4, agc_enable=False,
                     demod=Demod.NONE)
        geo = derive_geometry(p)
        tables = RxTables.create(geo, p)
        freqs = [10_000.0, 12_000.0, 15_500.0]
        n = geo.fftx_size
        fs = geo.timf1_sampling_speed
        bins = jnp.asarray([int(round(f / fs * n)) % n for f in freqs],
                           jnp.int32)
        centers = [int(b) * fs / n for b in bins]  # quantised tuning
        iq = tones_iq(geo.rx_ad_speed, geo.samples_per_step * 4,
                      [Tone(c + 300.0) for c in centers])[:, None]
        mstep = jax.jit(make_multi_rx_step(geo, p))
        sstep = jax.jit(make_rx_step(geo, p))
        state = RxState.create(geo)
        nbs = NBState.create_stacked(geo, len(freqs))
        multi = []
        for i in range(4):
            blk = jnp.asarray(iq[i * geo.samples_per_step:
                                 (i + 1) * geo.samples_per_step])
            (state, nbs), out = mstep(tables, state, nbs, blk, bins)
            multi.append(np.asarray(out.baseb))
        multi = np.concatenate(multi, axis=1)  # (K, S, C)
        for k in range(len(freqs)):
            sstate = RxState.create(geo)
            single = []
            for i in range(4):
                blk = jnp.asarray(iq[i * geo.samples_per_step:
                                     (i + 1) * geo.samples_per_step])
                sstate, out = sstep(tables, sstate, blk, bins[k])
                single.append(np.asarray(out.baseb))
            single = np.concatenate(single, axis=0)
            np.testing.assert_allclose(multi[k], single, atol=1e-5)
            z = multi[k][multi.shape[1] // 3:, 0]
            snr = _fit_tone_snr(z, 300.0, geo.baseband_sampling_speed)
            assert snr > 60.0, (k, snr)

    def test_retune_without_recompile(self):
        rx = _rx()
        g = rx.geo
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step,
                      [Tone(10_000.0)])
        rx.tune(10_000.0)
        rx.process_block(iq[:, None] if iq.ndim == 1 else iq)
        compiles_before = rx._step._cache_size()
        rx.tune(20_000.0)
        rx.process_block(iq[:, None] if iq.ndim == 1 else iq)
        assert rx._step._cache_size() == compiles_before

    def test_negative_frequency_tuning(self):
        rx = _rx()
        g = rx.geo
        fc = -15_000.0
        rx.tune(fc)
        assert rx.tuned_hz == pytest.approx(fc, abs=g.fftx_bandwidth)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 6,
                      [Tone(fc + 500.0)])
        z = rx.process(iq)["baseb"][:, 0]
        zz = z[len(z) // 3:]
        snr = _fit_tone_snr(zz, 500.0, g.baseband_sampling_speed)
        assert snr > 70.0, snr

    def test_streaming_block_invariance(self):
        """Block boundaries must be inaudible: same input split into
        different step sequences gives identical audio (the circular
        buffer contract of z_BUFFERS.txt as a functional invariant)."""
        g = _rx().geo
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 4,
                      [Tone(12_350.0)])
        rx1 = _rx()
        rx1.tune(12_000.0)
        full = np.concatenate(
            [np.asarray(o.audio) for o in rx1.run(iq)])
        rx2 = _rx()
        rx2.tune(12_000.0)
        half = np.concatenate(
            [np.asarray(o.audio) for o in rx2.run(iq[: 2 * g.samples_per_step])]
            + [np.asarray(o.audio) for o in rx2.run(iq[2 * g.samples_per_step:])])
        np.testing.assert_allclose(half, full, atol=1e-5)

    def test_step_size_invariance(self):
        """The per-step frame count is a pure batching knob (the analog
        of the reference's user-set DMA interrupt rate, globdef.h:519):
        the same recording processed with different
        target_fft1_frames_per_step gives identical audio.  This is
        what licenses the throughput bench to scale the step size."""
        small = _rx(target_fft1_frames_per_step=8)
        big = _rx(target_fft1_frames_per_step=32)
        g = small.geo
        assert big.geo.samples_per_step == 4 * g.samples_per_step
        iq = tones_iq(g.rx_ad_speed, big.geo.samples_per_step * 2,
                      [Tone(12_350.0)])
        small.tune(12_000.0)
        big.tune(12_000.0)
        a_small = np.concatenate(
            [np.asarray(o.audio) for o in small.run(iq)])
        a_big = np.concatenate(
            [np.asarray(o.audio) for o in big.run(iq)])
        # differences are XLA reduction-order float noise (different
        # batch shapes fuse differently); 2e-4 on a unit tone = -74 dB
        np.testing.assert_allclose(a_small, a_big, atol=2e-4)

    def test_step_size_invariance_wideband(self):
        """Same invariance through the full second-FFT path (sellim +
        back-FFT + blankers + fft2) on pulse-contaminated input, with
        matched noise-floor state: audio equal to float tolerance and
        the same pulses fitted."""
        kw = dict(second_fft_enable=True, blanker_enable=True,
                  clever_bln_limit=6.0, stupid_bln_limit=4.0,
                  max_pulses_per_block=64, blanker_rounds=8)
        small = _rx(target_fft1_frames_per_step=8, **kw)
        big = _rx(target_fft1_frames_per_step=32, **kw)
        g = small.geo
        rng = np.random.default_rng(2)
        n = big.geo.samples_per_step * 2
        iq = tones_iq(g.rx_ad_speed, n, [Tone(12_350.0)])
        iq = iq + (0.02 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                   ).astype(np.complex64)
        # strong enough to clear even the cold-start noise floor (200,
        # buf.c:415-427 analog) — these short runs never warm the EMA
        iq[1000::9973] += 300.0
        small.tune(12_000.0)
        big.tune(12_000.0)
        outs_s = list(small.run(iq))
        outs_b = list(big.run(iq))
        fit_s = sum(int(o.blanker_fitted) for o in outs_s)
        fit_b = sum(int(o.blanker_fitted) for o in outs_b)
        assert fit_s > 0
        # the noise-floor EMA updates once per step, so its trajectory
        # differs during warm-up; pulse counts must still agree closely
        assert abs(fit_s - fit_b) <= max(2, fit_s // 10), (fit_s, fit_b)


class TestPolAdapt:
    def test_chain_polarization_gain(self):
        """pol_adapt_enable combines the 2 RF channels on the dominant
        coherency eigenvector before demod (the pol_graph.c channel
        combination applied mix2-side): a 45-degree linearly polarized
        tone with independent channel noise gains ~3 dB SNR over a
        single channel, and the audio collapses to 1 channel."""
        rng = np.random.default_rng(6)
        snrs = {}
        iq2 = None
        for adapt in (False, True):
            rx = _rx(rx_rf_channels=2, pol_adapt_enable=adapt)
            g = rx.geo
            if iq2 is None:
                n = g.samples_per_step * 6
                tone = tones_iq(g.rx_ad_speed, n, [Tone(12_400.0)])
                noise = (0.3 * (rng.normal(size=(n, 2))
                                + 1j * rng.normal(size=(n, 2)))
                         ).astype(np.complex64)
                iq2 = np.stack([tone, tone], 1) / np.sqrt(2) + noise
            rx.tune(12_000.0)
            z = np.concatenate(
                [np.asarray(o.baseb) for o in rx.run(iq2)])
            assert z.shape[1] == (1 if adapt else 2)
            zz = z[len(z) // 2:, 0]
            snrs[adapt] = _fit_tone_snr(zz, 400.0,
                                        g.baseband_sampling_speed)
        # matched combining of equal-SNR channels buys 3 dB over one
        assert snrs[True] > snrs[False] + 2.0, snrs


class TestWFMStereo:
    def test_pilot_locked_channel_separation(self):
        """WFM stereo decode (the fm.c wideband-stereo pilot path):
        distinct L/R tones come out on their own channels with >25 dB
        separation, and the pilot is detected."""
        from linrad_tpu.ops.demod import (wfm_stereo_decode,
                                          wfm_stereo_encode)
        fs = 192_000.0
        t = np.arange(int(0.25 * fs)) / fs
        left = np.sin(2 * np.pi * 700.0 * t)
        right = np.sin(2 * np.pi * 2500.0 * t)
        comp = wfm_stereo_encode(left, right, fs)
        l, r, pil = wfm_stereo_decode(jnp.asarray(comp), fs)
        l, r = np.asarray(l), np.asarray(r)

        def tone_pwr(x, f):
            ref = np.exp(2j * np.pi * f * t)
            return abs(np.vdot(ref, x) / len(x)) ** 2

        sep_l = 10 * np.log10(tone_pwr(l, 700.0) / tone_pwr(l, 2500.0))
        sep_r = 10 * np.log10(tone_pwr(r, 2500.0) / tone_pwr(r, 700.0))
        assert sep_l > 25.0, sep_l
        assert sep_r > 25.0, sep_r
        assert float(pil) > 1e-3

    def test_mono_fallback(self):
        """Without a pilot the decoder degrades to mono (L == R)."""
        from linrad_tpu.ops.demod import wfm_stereo_decode
        fs = 192_000.0
        t = np.arange(int(0.1 * fs)) / fs
        mono = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        l, r, pil = wfm_stereo_decode(jnp.asarray(mono), fs)
        # no 38 kHz content -> L-R is ~0 and both channels equal mono/2
        np.testing.assert_allclose(np.asarray(l), np.asarray(r),
                                   atol=1e-3)


class TestUserFilterShape:
    def test_drawn_curve_shapes_passband(self):
        """filter_shape (the freehand bg_filterfunc curve drawn on the
        baseband graph, baseb_graph.c make_bg_filter): dB breakpoints
        are applied on top of the passband — a -20 dB region at one tone
        attenuates it by 20 dB relative to an untouched tone."""
        shape = ((200.0, 0.0), (500.0, 0.0), (700.0, -20.0),
                 (900.0, -20.0), (1100.0, 0.0))
        amps = {}
        for shaped in (False, True):
            rx = _rx(filter_shape=shape if shaped else ())
            g = rx.geo
            rx.tune(12_000.0)
            iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 6,
                          [Tone(12_300.0), Tone(12_800.0)])
            z = np.concatenate(
                [np.asarray(o.baseb) for o in rx.run(iq)])[:, 0]
            zz = z[len(z) // 2:]
            t = np.arange(len(zz)) / g.baseband_sampling_speed
            amps[shaped] = [
                abs(np.vdot(np.exp(2j * np.pi * f * t), zz) / len(zz))
                for f in (300.0, 800.0)]
        keep_db = 20 * np.log10(amps[True][0] / amps[False][0])
        cut_db = 20 * np.log10(amps[True][1] / amps[False][1])
        assert abs(keep_db) < 1.0, keep_db
        assert cut_db == pytest.approx(-20.0, abs=1.5), cut_db


class TestOtherDemods:
    def test_am(self):
        rx = _rx(demod=Demod.AM, filter_low_hz=-3000.0,
                 filter_high_hz=3000.0)
        g = rx.geo
        rx.tune(12_000.0)
        fs = g.rx_ad_speed
        n = g.samples_per_step * 8
        t = np.arange(n) / fs
        mod = 1.0 + 0.5 * np.sin(2 * np.pi * 700.0 * t)
        iq = (mod * np.exp(2j * np.pi * 12_000.0 * t)).astype(np.complex64)
        audio = rx.process(iq)["audio"][:, 0]
        a = audio[len(audio) // 2:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / g.baseband_sampling_speed)
        assert freqs[np.argmax(spec[5:]) + 5] == pytest.approx(700.0,
                                                               abs=5.0)

    def test_fm(self):
        rx = _rx(demod=Demod.FM, filter_low_hz=-2500.0,
                 filter_high_hz=2500.0, mix1_bandwidth_reduction_n=3)
        g = rx.geo
        rx.tune(12_000.0)
        fs = g.rx_ad_speed
        n = g.samples_per_step * 8
        t = np.arange(n) / fs
        dev, fmod = 1000.0, 400.0
        phase = 2 * np.pi * 12_000.0 * t + (dev / fmod) * np.sin(
            2 * np.pi * fmod * t)
        iq = np.exp(1j * phase).astype(np.complex64)
        audio = rx.process(iq)["audio"][:, 0]
        a = audio[len(audio) // 2:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        freqs = np.fft.rfftfreq(len(a), 1 / g.baseband_sampling_speed)
        assert freqs[np.argmax(spec[5:]) + 5] == pytest.approx(fmod,
                                                               abs=5.0)

    def test_agc_levels_strong_and_weak(self):
        rx = _rx(agc_enable=True, agc_release_ms=100.0)
        g = rx.geo
        rx.tune(12_000.0)
        fs = g.rx_ad_speed
        n = g.samples_per_step * 10
        # strong tone then 40 dB weaker tone
        half = n // 2
        a1 = tones_iq(fs, half, [Tone(12_400.0, amplitude=100.0)])
        a2 = tones_iq(fs, half, [Tone(12_400.0, amplitude=1.0)],
                      start=half)
        audio = rx.process(np.concatenate([a1, a2]))["audio"][:, 0]
        s_bb = len(audio) // 10
        strong = np.sqrt(np.mean(audio[3 * s_bb: 5 * s_bb] ** 2))
        weak = np.sqrt(np.mean(audio[8 * s_bb:] ** 2))
        # AGC holds both within a few dB of each other
        assert abs(20 * np.log10(strong / weak)) < 6.0
