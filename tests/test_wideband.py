"""Wideband chain tests: sellim, timf2 split/back-FFT, blankers, fft2."""

import numpy as np
import jax.numpy as jnp
import pytest

from linrad_tpu import RxParams, derive_geometry
from linrad_tpu.io.siggen import Tone, impulse_noise, tones_iq
from linrad_tpu.ops import sellim as sellim_ops
from linrad_tpu.ops.blanker import (BlankerTables, clever_blanker,
                                    make_refpulse_bank, stupid_blanker)
from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
from linrad_tpu.ops.fft2 import FFT2State, FFT2Tables, fft2_step
from linrad_tpu.ops.timf2 import Timf2State, make_timf2_syn, timf2_step
from linrad_tpu.pipeline import Receiver


def _geo(**kw):
    kw.setdefault("second_fft_enable", True)
    kw.setdefault("fft1_n_override", 9)
    return derive_geometry(RxParams(**kw))


class TestSellim:
    def test_strong_carrier_classified(self):
        geo = _geo()
        st = sellim_ops.SellimState.create(geo)
        p = np.full(geo.fft1_size, 1.0, np.float32)
        # a carrier 40 dB above the maxlevel threshold at bin 100
        limit = sellim_ops.sellim_limit(geo, maxlevel=8.0)
        p[100] = limit * 1e4
        p[99] = p[101] = limit * 1e3
        st = sellim_ops.update_liminfo(geo, st, jnp.asarray(p), 8.0)
        li = np.asarray(st.liminfo)
        # carrier bins strong with gain sqrt(limit/maxval)
        assert li[100] > 0
        assert li[100] == pytest.approx(np.sqrt(limit / p[100]), rel=0.3)
        # noise bins weak
        assert li[400] == 0.0

    def test_region_gets_common_gain(self):
        geo = _geo()
        st = sellim_ops.SellimState.create(geo)
        limit = sellim_ops.sellim_limit(geo, 8.0)
        p = np.full(geo.fft1_size, 1.0, np.float32)
        p[200:210] = limit * np.array([10, 100, 1e4, 1e4, 1e5, 1e4, 1e3,
                                       100, 10, 10])
        st = sellim_ops.update_liminfo(geo, st, jnp.asarray(p), 8.0)
        li = np.asarray(st.liminfo)
        core = li[201:207]
        assert np.all(core > 0)
        assert np.allclose(core, core[0])  # equal gain over the signal

    def test_carrier_near_floor_goes_strong_unit(self):
        geo = _geo()
        st = sellim_ops.SellimState.create(geo)
        p = np.full(geo.fft1_size, 1.0, np.float32)
        p[300] = 200.0  # 23 dB over floor, below maxlevel limit
        st = sellim_ops.update_liminfo(geo, st, jnp.asarray(p), 8.0,
                                       ston=30.0)
        assert np.asarray(st.liminfo)[300] == -1.0

    def test_protected_passband(self):
        geo = _geo()
        st = sellim_ops.SellimState.create(geo)
        limit = sellim_ops.sellim_limit(geo, 8.0)
        p = np.full(geo.fft1_size, 1.0, np.float32)
        p[128] = limit * 1e4
        st = sellim_ops.update_liminfo(geo, st, jnp.asarray(p), 8.0,
                                       sel_lo=jnp.int32(120),
                                       sel_hi=jnp.int32(136))
        assert np.asarray(st.liminfo)[128] == 0.0  # sellim.c:38-116

    def test_strong_holds_one_second(self):
        geo = _geo()
        st = sellim_ops.SellimState.create(geo)
        limit = sellim_ops.sellim_limit(geo, 8.0)
        p = np.full(geo.fft1_size, 1.0, np.float32)
        p[50] = limit * 100
        st = sellim_ops.update_liminfo(geo, st, jnp.asarray(p), 8.0)
        assert np.asarray(st.liminfo)[50] != 0
        # signal vanishes -> bin stays strong (-1) while wait counts down
        p[50] = 1.0
        st = sellim_ops.update_liminfo(geo, st, jnp.asarray(p), 8.0)
        assert np.asarray(st.liminfo)[50] == -1.0


class TestTimf2:
    def test_weak_strong_reconstruction(self):
        """weak + strong == original signal when gains are unit
        (timf2.c:39-126: the split is a partition of the spectrum)."""
        geo = _geo()
        # identity response: the default band-edge taper
        # (clear_fft1_filtercorr fft1.c:5196) breaks exact reconstruction
        tables = FFT1Tables.create(geo, edge_taper=False)
        syn = make_timf2_syn(geo)
        rng = np.random.default_rng(0)
        n = geo.samples_per_step
        x = (rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
             ).astype(np.complex64)
        s1 = FFT1State.create(geo)
        _, spec, _ = fft1_step(geo, tables, s1, jnp.asarray(x), 8)
        # split: low half weak, high half strong (unit gain)
        wg = np.zeros(geo.fft1_size, np.float32)
        wg[: geo.fft1_size // 2] = 1.0
        sg = 1.0 - wg
        st = Timf2State.create(geo)
        _, weak, strong, pwr = timf2_step(geo, syn, st, spec,
                                          jnp.asarray(wg), jnp.asarray(sg))
        total = np.asarray(weak + strong)[:, 0]
        # the reconstructed stream is delayed by the interleave tail;
        # compare the interior against the input
        ov = geo.fft1_interleave_points
        lo, hi = geo.fft1_size, n - geo.fft1_size
        np.testing.assert_allclose(total[lo:hi], x[lo - ov:hi - ov, 0],
                                   rtol=2e-3, atol=2e-3)

    def test_strong_bin_removed_from_weak(self):
        geo = _geo()
        tables = FFT1Tables.create(geo)
        syn = make_timf2_syn(geo)
        fs = geo.rx_ad_speed
        k = 64
        f = k * fs / geo.fft1_size
        n = geo.samples_per_step
        x = tones_iq(fs, n, [Tone(f, amplitude=100.0),
                             Tone(f * 2.11, amplitude=0.1)])[:, None]
        s1 = FFT1State.create(geo)
        _, spec, _ = fft1_step(geo, tables, s1, jnp.asarray(x), 8)
        wg = np.ones(geo.fft1_size, np.float32)
        wg[k - 4: k + 5] = 0.0
        sg = 1.0 - wg
        st = Timf2State.create(geo)
        _, weak, strong, _ = timf2_step(geo, syn, st, spec,
                                        jnp.asarray(wg), jnp.asarray(sg))
        w = np.asarray(weak)[geo.fft1_size: -geo.fft1_size, 0]
        s = np.asarray(strong)[geo.fft1_size: -geo.fft1_size, 0]
        # the strong carrier is >40 dB down in the weak stream
        assert np.abs(w).max() < 1.0
        assert np.abs(s).max() > 50.0


class TestBlankers:
    def _pulse(self, rng, length, frac, amp):
        k = np.fft.fftfreq(length) * length
        p = np.roll(np.fft.ifft(np.exp(-2j * np.pi * k * frac / length)),
                    length // 2)
        return (amp * np.exp(1j * rng.uniform(0, 2 * np.pi)) * p)

    def test_clever_suppression(self):
        geo = _geo()
        tables, pw = BlankerTables.create(geo)
        rng = np.random.default_rng(1)
        s = 4096
        weak = ((rng.normal(size=(s, 1)) + 1j * rng.normal(size=(s, 1)))
                * 0.1).astype(np.complex64)
        sites = [(500, 0.0, 20.0), (1500, 0.3, 35.0), (2500, -0.45, 15.0)]
        for pos, frac, amp in sites:
            pul = self._pulse(rng, 64, frac, amp)
            weak[pos - 32: pos + 32, 0] += pul.astype(np.complex64)
        pwr = np.sum(np.abs(weak) ** 2, 1).astype(np.float32)
        w2, p2, nfit = clever_blanker(jnp.asarray(weak), jnp.asarray(pwr),
                                      tables, jnp.float32(0.02), 6.0, pw,
                                      16)
        assert int(nfit) == 3
        w2 = np.asarray(w2)
        for pos, _f, amp in sites:
            residual = np.abs(w2[pos, 0])
            # >25 dB suppression at the pulse peak
            assert residual < amp * 0.056, (pos, residual, amp)

    def test_blocked_matches_flat_scan(self):
        """The hierarchical block-maxima search must reproduce the flat
        global-argmax scan exactly (same candidates, same subtractions),
        including 2-channel data and pulses near the edges."""
        geo = _geo(rx_rf_channels=2)
        tables, pw = BlankerTables.create(geo)
        rng = np.random.default_rng(7)
        s = 3000  # deliberately not a multiple of the block size
        weak = ((rng.normal(size=(s, 2)) + 1j * rng.normal(size=(s, 2)))
                * 0.1).astype(np.complex64)
        for pos, frac, amp in [(40, 0.1, 25.0), (700, -0.2, 18.0),
                               (701 + 256, 0.4, 30.0), (2980, 0.0, 22.0),
                               (1500, 0.25, 12.0), (1530, -0.1, 40.0)]:
            pul = self._pulse(rng, 64, frac, amp)
            lo, hi = max(0, pos - 32), min(s, pos + 32)
            weak[lo:hi, 0] += pul[lo - (pos - 32): 64 - (pos + 32 - hi)
                                  ].astype(np.complex64)
        pwr = np.sum(np.abs(weak) ** 2, 1).astype(np.float32)
        args = (jnp.asarray(weak), jnp.asarray(pwr), tables,
                jnp.float32(0.04), 6.0, pw, 16)
        wf, pf, nf = clever_blanker(*args, block_size=0)
        wb, pb, nb = clever_blanker(*args, block_size=256)
        assert int(nf) == int(nb)
        np.testing.assert_array_equal(np.asarray(wf), np.asarray(wb))
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pb))

    def test_parallel_matches_flat_scan(self):
        """The round-parallel variant must equal the flat scan exactly
        when fitted pulses' windows are disjoint (the subtractions
        commute), including pulses inside the same block."""
        geo = _geo(rx_rf_channels=2)
        tables, pw = BlankerTables.create(geo)
        rng = np.random.default_rng(11)
        s = 3000
        weak = ((rng.normal(size=(s, 2)) + 1j * rng.normal(size=(s, 2)))
                * 0.1).astype(np.complex64)
        # all pairs ≥ pul + 2·pw apart → disjoint fit windows
        for pos, frac, amp in [(60, 0.1, 25.0), (300, -0.2, 18.0),
                               (500, 0.4, 30.0), (900, 0.0, 22.0),
                               (1500, 0.25, 12.0), (2980, -0.1, 40.0)]:
            pul = self._pulse(rng, 64, frac, amp)
            lo, hi = max(0, pos - 32), min(s, pos + 32)
            weak[lo:hi, 0] += pul[lo - (pos - 32): 64 - (pos + 32 - hi)
                                  ].astype(np.complex64)
        pwr = np.sum(np.abs(weak) ** 2, 1).astype(np.float32)
        args = (jnp.asarray(weak), jnp.asarray(pwr), tables,
                jnp.float32(0.04), 6.0, pw, 16)
        wf, pf, nf = clever_blanker(*args, block_size=0)
        wp, pp, np_ = clever_blanker(*args, rounds=6)
        assert int(nf) == int(np_), (int(nf), int(np_))
        np.testing.assert_array_equal(np.asarray(wf), np.asarray(wp))
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pp))

    def test_parallel_dense_cluster_suppression(self):
        """Interacting pulses (windows overlap, possibly straddling
        block boundaries) may be selected in a different order than the
        strongest-first scan, but suppression must match the sequential
        path to within 1 dB."""
        geo = _geo()
        tables, pw = BlankerTables.create(geo)
        rng = np.random.default_rng(5)
        s = 2048
        weak = ((rng.normal(size=(s, 1)) + 1j * rng.normal(size=(s, 1)))
                * 0.1).astype(np.complex64)
        # cluster around the block-256 boundary: 230..280 every ~25
        for pos, frac, amp in [(230, 0.1, 25.0), (255, -0.3, 35.0),
                               (280, 0.2, 20.0), (1020, 0.0, 30.0),
                               (1045, 0.4, 28.0)]:
            pul = self._pulse(rng, 64, frac, amp)
            weak[pos - 32: pos + 32, 0] += pul.astype(np.complex64)
        pwr = np.sum(np.abs(weak) ** 2, 1).astype(np.float32)
        args = (jnp.asarray(weak), jnp.asarray(pwr), tables,
                jnp.float32(0.04), 6.0, pw, 16)
        _, pf, nf = clever_blanker(*args, block_size=0)
        _, pp, np_ = clever_blanker(*args, rounds=8)
        # same pulses found, residual power within 1 dB
        assert int(np_) >= int(nf) - 1
        rf, rp = float(jnp.sum(pf)), float(jnp.sum(pp))
        assert abs(10 * np.log10(rp / rf)) < 1.0, (rf, rp)

    def test_clever_leaves_clean_signal_alone(self):
        geo = _geo()
        tables, pw = BlankerTables.create(geo)
        s = 4096
        t = np.arange(s)
        weak = (0.5 * np.exp(2j * np.pi * 0.01 * t)[:, None]
                ).astype(np.complex64)
        pwr = np.sum(np.abs(weak) ** 2, 1).astype(np.float32)
        w2, _, nfit = clever_blanker(jnp.asarray(weak), jnp.asarray(pwr),
                                     tables, jnp.float32(0.25), 6.0, pw,
                                     16)
        # a steady carrier fails the pulse shape test -> untouched
        np.testing.assert_allclose(np.asarray(w2), weak, atol=1e-5)

    def test_stupid_clears_and_widens(self):
        geo = _geo()
        rng = np.random.default_rng(2)
        s = 2048
        weak = ((rng.normal(size=(s, 1)) + 1j * rng.normal(size=(s, 1)))
                * 0.1).astype(np.complex64)
        weak[1000:1003, 0] += 50.0
        pwr = np.sum(np.abs(weak) ** 2, 1).astype(np.float32)
        w2, p2, ncl = stupid_blanker(jnp.asarray(weak), jnp.asarray(pwr),
                                     jnp.float32(0.02), 4.0, 2)
        w2 = np.asarray(w2)
        assert np.all(w2[1000:1003] == 0)
        # widened by the capped-at-40dB rule (blank1.c:1057-1060):
        # t = sqrt(min(peak/noise, 1e4))/100 = 1.0 -> 1-2 before, 3 after
        assert int(ncl) >= 3 + 1 + 3
        assert w2[999] == 0
        assert np.all(w2[1003:1006] == 0)

    def test_refpulse_bank_fractional_peaks(self):
        bank, pf, pw = make_refpulse_bank(np.ones(512, np.complex128), 64)
        # every pulse normalised: peak sample amplitude 1, phase 0
        half = bank.shape[1] // 2
        np.testing.assert_allclose(bank[:, half], 1.0, atol=1e-9)
        assert pw >= 2


class TestWidebandPipeline:
    def _iq(self, g, steps=6, pulse_amp=30.0):
        rng = np.random.default_rng(0)
        fs = g.rx_ad_speed
        n = g.samples_per_step * steps
        sig = tones_iq(fs, n, [Tone(12_400.0)])
        noise = ((rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.02
                 ).astype(np.complex64)
        pulses = impulse_noise(rng, n, 50.0, fs, pulse_amp)
        return sig + noise + pulses

    def _snr(self, z, f, fs):
        t = np.arange(len(z)) / fs
        ref = np.exp(2j * np.pi * f * t)
        amp = np.vdot(ref, z) / len(z)
        r = z - amp * ref
        return 10 * np.log10(np.vdot(z, z).real / np.vdot(r, r).real)

    @pytest.mark.parametrize("search", [
        dict(blanker_block_size=256),                     # sequential blocked
        dict(blanker_block_size=256, blanker_rounds=8),   # round-parallel
    ])
    def test_blanker_improves_snr(self, search):
        base = dict(first_fft_bandwidth=100.0,
                    mix1_bandwidth_reduction_n=4, second_fft_enable=True,
                    agc_enable=False, clever_bln_limit=6.0,
                    stupid_bln_limit=4.0, max_pulses_per_block=64,
                    **search)
        snrs = {}
        fits = {}
        iq = None
        for bl in (True, False):
            rx = Receiver(RxParams(**base, blanker_enable=bl))
            g = rx.geo
            if iq is None:
                iq = self._iq(g)
            rx.tune(12_000.0)
            outs = list(rx.run(iq))
            z = np.concatenate([np.asarray(o.baseb) for o in outs])[:, 0]
            zz = z[len(z) // 2:]
            snrs[bl] = self._snr(zz, 400.0, g.baseband_sampling_speed)
            fits[bl] = sum(int(o.blanker_fitted) for o in outs)
        assert fits[True] > 50
        assert fits[False] == 0
        # blanker buys >= 10 dB on pulse noise (measured ~21 dB)
        assert snrs[True] > snrs[False] + 10.0, snrs

    def test_fft2_resolution(self):
        rx = Receiver(RxParams(first_fft_bandwidth=100.0,
                               second_fft_enable=True, second_fft_ninc=2,
                               agc_enable=False))
        g = rx.geo
        assert g.fft2_size >= g.fft1_size
        rx.tune(10_000.0)
        iq = tones_iq(g.rx_ad_speed, g.samples_per_step * 3,
                      [Tone(10_000.0)])
        out = None
        for out in rx.run(iq):
            pass
        p2 = np.asarray(out.fft2_power)[:, 0]
        k = int(round(10_000.0 / g.rx_ad_speed * g.fft2_size))
        assert abs(int(np.argmax(p2)) - k) <= 1


def test_refpulse_bank_subsample_error():
    """Measured bound for the fractional-shift bank depth (VERDICT r2
    item 10): subtract a band-limited pulse placed at the WORST
    inter-entry fractional offset using the nearest bank entry; the
    residual must be tiny relative to the pulse.  At the reference's
    256 entries (blnkdef.h:13) the worst-case residual measures
    -45.6 dB (the old 64-entry bank: ~-34 dB — the error scales with
    the entry spacing)."""
    import numpy as np

    from linrad_tpu.ops.blanker import MAX_REFPULSES, make_refpulse_bank

    n = 1024
    pul = 64
    freq_response = np.ones(n, np.complex128)
    bank, _pf, _pw = make_refpulse_bank(freq_response, pul,
                                        MAX_REFPULSES)
    half = pul // 2
    k = np.fft.fftfreq(n) * n
    worst = 0.0
    # worst case: halfway between adjacent bank entries
    for j in (0, MAX_REFPULSES // 3, MAX_REFPULSES - 2):
        d = (j + 0.5) / MAX_REFPULSES - 0.5
        ramp = np.exp(-2j * np.pi * k * d / n)
        pulse = np.roll(np.fft.ifft(freq_response * ramp), half)[:pul]
        pulse = pulse / pulse[half]
        nearest = bank[j] if abs(d - ((j / MAX_REFPULSES) - 0.5)) < \
            abs(d - (((j + 1) / MAX_REFPULSES) - 0.5)) else bank[j + 1]
        resid = pulse - nearest
        ratio = (np.abs(resid) ** 2).sum() / (np.abs(pulse) ** 2).sum()
        worst = max(worst, ratio)
    assert 10 * np.log10(worst) < -44.0, 10 * np.log10(worst)
