"""Golden parity for the wideband branch (second_fft=1) against the
compiled reference — BASELINE configs 3/4 (VERDICT r2 item 1).

Covers the chain's hardest kernels, never before compared to reference
output: the liminfo split + back transform (make_timf2 timf2.c:31-208 +
fft1back_fp_finish timf2.c:970-1160), the stupid blanker
(blank1.c:1013-1083) and the second FFT (make_fft2 fft2.c:52-1848).

Conventions established empirically on broadband noise (see the
timf2/fft2 mapping fits below; both are float32-exact):

* timf2:  ``ref_weak[t] = s * (-1)^t * conj(ours_weak[t])`` at lag 0 —
  the fft1 store is DC-centred + conjugated (test_ref_parity.py), and
  the inherited fftshift becomes the (-1)^t alternation after the back
  transform.  s is real: fft size x ampfac (1/2^FIRST_BCKFFT_ATT_N,
  timf2.c:976) x the window/filtercorr normalisation constants.
* The reference's *uncalibrated default* fft1_filtercorr tapers 4 bins
  on each side of the IQ band edge (clear_fft1_filtercorr
  fft1.c:5196-5222); ours reproduces it (ops/fft1.edge_taper_response),
  without which timf2 agreement stalls at ~4 % broadband residual.
* fft2:  ``ref2[r] = s2 * conj(fftshift(ours2[r+1]))`` — same
  DC-centred + conjugated store as fft1; our frame r+1 matches the
  reference's frame r because our framer zero-primes one interleave.
"""

import ctypes
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from refharness import RefChain, available  # noqa: E402

pytestmark = pytest.mark.skipif(not available(),
                                reason="reference tree not mounted")

FS = 96000.0


@pytest.fixture(scope="module")
def jnp():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    return jnp


def _wide_ref(**kw):
    rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2, **kw)
    rc.set_liminfo_auto(False)       # static all-weak liminfo
    rc.set_hg("clever_bln_mode", 0)
    rc.set_hg("stupid_bln_mode", 0)
    return rc


def _wide_geo(rc, frames_per_step=16):
    from linrad_tpu.geometry import derive_geometry
    from linrad_tpu.params import RxParams
    n = rc.geo("fft1_size")
    n2 = rc.geo("fft2_size")
    params = RxParams(
        rx_ad_speed=96000, fft1_n_override=int(math.log2(n)),
        first_fft_sinpow=2, second_fft_enable=True,
        second_fft_sinpow=2, second_fft_ninc=2,
        mix1_bandwidth_reduction_n=int(
            math.log2(n2 // rc.geo("mix1_size"))),
        fft3_n=int(math.log2(rc.geo("fft3_size"))),
        mix2_reduction_n=int(math.log2(rc.geo("fft3_size")
                                       // rc.geo("mix2_size"))),
        target_fft1_frames_per_step=frames_per_step,
        agc_enable=False)
    geo = derive_geometry(params)
    assert geo.fft1_size == n
    assert geo.fft2_size == n2
    assert geo.fft2_new_points == rc.geo("fft2_new_points")
    assert geo.fft1_new_points == rc.geo("fft1_new_points")
    return geo, params


def _run_ours_wideband(geo, iq, jnp, blanker=None):
    """fft1 -> (all-weak) timf2 [-> blanker] -> fft2 on the raw stream.

    blanker: None, or (noise_floor, stupid_limit_amp, pulsewidth).
    Returns (weak, weak_pwr, fft2_frames)."""
    from linrad_tpu.ops import blanker as blanker_ops
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.fft2 import FFT2State, FFT2Tables, fft2_step
    from linrad_tpu.ops.timf2 import (Timf2State, make_timf2_syn,
                                      timf2_step)
    n = geo.fft1_size
    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    syn = make_timf2_syn(geo)
    st2 = Timf2State.create(geo)
    tf2, sf2 = FFT2Tables.create(geo), FFT2State.create(geo)
    wg = jnp.ones(n, jnp.float32)
    sg = jnp.zeros(n, jnp.float32)
    spp = geo.fft1_frames_per_step * geo.fft1_new_points
    weak_all, pwr_all, f2_all = [], [], []
    for s in range(len(iq) // spp):
        blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
        s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        st2, weak, strong, wpwr = timf2_step(geo, syn, st2, spec, wg, sg)
        if blanker is not None:
            nf, lim, pw = blanker
            weak, wpwr, _ = blanker_ops.stupid_blanker(
                weak, wpwr, jnp.float32(nf), lim, pw)
        sf2, spec2, _ = fft2_step(geo, tf2, sf2, weak, strong)
        weak_all.append(np.asarray(weak[:, 0]))
        pwr_all.append(np.asarray(wpwr))
        f2_all.append(np.asarray(spec2[:, :, 0]))
    return (np.concatenate(weak_all), np.concatenate(pwr_all),
            np.concatenate(f2_all, axis=0))


def _fit_altconj(ours, ref, skip, mask=None):
    """Fit ref[t] ~ s*(-1)^t*conj(ours[t]); returns (s, maxrel)."""
    t = np.arange(len(ours))
    a = ((-1.0) ** t) * np.conj(ours)
    a, b = a[skip:], ref[skip:len(ours)]
    if mask is not None:
        m = mask[skip:len(ours)]
        a, b = a[m], b[m]
    s = np.vdot(a, b) / np.vdot(a, a)
    err = np.abs(b - s * a)
    return s, float(err.max() / np.abs(b).max())


def test_timf2_exact_vs_reference_all_weak(jnp):
    """All-weak back transform + OLA reproduces the reference's timf2
    weak stream float32-exactly (make_timf2 + fft1back_fp_finish)."""
    rc = _wide_ref()
    geo, _p = _wide_geo(rc)
    newp = geo.fft1_new_points
    rng = np.random.default_rng(3)
    nsamp = newp * 64
    iq = np.round(3000 * (rng.standard_normal(nsamp)
                          + 1j * rng.standard_normal(nsamp)))
    rc.feed_iq(iq)
    rc.run_wideband()
    pts = rc.geo("timf2_pa") // 4
    ref = rc.timf2_stream(pts)
    ours_w, _pwr, _f2 = _run_ours_wideband(geo, iq, jnp)
    m = min(len(ours_w), pts) - geo.fft1_size   # drop the partial tail
    s, maxrel = _fit_altconj(ours_w[:m], ref[:m, 0, 0], skip=3000)
    assert abs(s.imag) < 1e-3 * abs(s.real)
    assert maxrel < 1e-5, (s, maxrel)
    # everything weak: the strong stream is exactly zero in both
    assert np.abs(ref[:m, 1, 0]).max() == 0.0


def test_fft2_exact_vs_reference_all_weak(jnp):
    """The second FFT reproduces the reference's fft2_float transforms
    float32-exactly (make_fft2 big-FFT path, fft2.c:90-141)."""
    rc = _wide_ref()
    geo, _p = _wide_geo(rc)
    newp = geo.fft1_new_points
    n2 = geo.fft2_size
    rng = np.random.default_rng(5)
    nsamp = newp * 64
    iq = np.round(3000 * (rng.standard_normal(nsamp)
                          + 1j * rng.standard_normal(nsamp)))
    rc.feed_iq(iq)
    rc.run_wideband()
    nfft2 = rc.geo("fft2_na")
    assert nfft2 >= 8
    raw2 = rc.array("fft2_float", nfft2 * 2 * n2).copy()
    _w, _p2, ours2 = _run_ours_wideband(geo, iq, jnp)
    ss = []
    for r in range(2, nfft2):
        ref_fr = raw2[r * 2 * n2:(r + 1) * 2 * n2]
        ref_fr = ref_fr[0::2] + 1j * ref_fr[1::2]
        a = np.conj(np.fft.fftshift(ours2[r + 1]))
        s = np.vdot(a, ref_fr) / np.vdot(a, a)
        err = np.abs(ref_fr - s * a)
        maxrel = err.max() / np.abs(ref_fr).max()
        assert maxrel < 1e-5, (r, s, maxrel)
        ss.append(s)
    # one constant scale across frames
    ss = np.array(ss)
    assert np.abs(ss - ss.mean()).max() < 1e-3 * abs(ss.mean())


def test_liminfo_classification_vs_reference(jnp):
    """Selective-limiter classification parity (fft1_update_liminfo
    sellim.c:738-867, the strong-signal limloop).

    Deterministic protocol: wg.fft_avg1num larger than the feed, so the
    reference's fft1_sumsq slot accumulates exactly k spectra and never
    advances; ref_update_liminfo() then reads a known sum.  Our limit is
    scaled to the equivalent threshold on our mean spectrum (the
    reference's spectra carry the fft1_filtercorr_start constant =
    0.137449, fft1.c:5196; sumsq is a k-sum of channel-power pairs).
    The noise-floor branch is gated off on both sides (wg.spek_avgnum
    huge / ston huge) — it is covered by the full-chain test below."""
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.sellim import (SellimState, sellim_limit,
                                       update_liminfo)

    rc = _wide_ref()
    geo, _p = _wide_geo(rc)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    k = 16
    rc.set_wg("fft_avg1num", 1000)     # no slot wrap within the feed
    rc.set_wg("spek_avgnum", 1e9)      # noise-floor branch never runs
    m_ref = 10000.0
    rc.set_genparm(10, int(m_ref))     # SELLIM_MAXLEVEL

    rng = np.random.default_rng(21)
    t = np.arange(k * newp) / FS
    iq = (6000.0 * np.exp(2j * np.pi * 12000.0 * t)
          + 2500.0 * np.exp(2j * np.pi * 31171.875 * t)   # off-bin
          + 30.0 * (rng.standard_normal(len(t))
                    + 1j * rng.standard_normal(len(t))))
    iq = np.round(iq)
    rc.feed_iq(iq)
    assert rc.run_wideband() == k
    rc.update_liminfo()
    lim_ref = rc.array("liminfo", 2 * n)[:n].copy()

    # ours: same k spectra, equivalent threshold on the mean spectrum
    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    blk = iq.astype(np.complex64)[:, None]
    _, spec, _ = fft1_step(geo, t1, s1, jnp.asarray(blk), avg1num=8)
    avg_p = np.mean(np.abs(np.asarray(spec)[:, :, 0]) ** 2, axis=0)
    # ref spectra = c_win * fcs * conj(fftshift(ours)): the reference
    # window carries the normalisation constant c_win (fft1_window sums
    # pairwise to 1.63193, make_window fft0.c) and do_fft1_c multiplies
    # the default filtercorr constant fcs (fft1.c:5196)
    fcs = 0.137449
    c_win = 1.6319311
    l_ref = m_ref ** 2 * 1000.0 * 1 * n / geo.fft2_size
    l_ours = l_ref / (k * (fcs * c_win) ** 2)
    m_ours = math.sqrt(l_ours / sellim_limit(geo, 1.0))
    st = update_liminfo(geo, SellimState.create(geo),
                        jnp.asarray(avg_p, jnp.float32), m_ours,
                        ston=1e12)
    lim_ours = np.roll(np.asarray(st.liminfo), n // 2)  # ref bin order

    strong_ref = lim_ref != 0
    strong_ours = lim_ours != 0
    agree = np.mean(strong_ref == strong_ours)
    assert agree > 0.98, agree
    # both flag the two carriers (ref bin = our bin + n/2)
    for f in (12000.0, 31171.875):
        b = (int(round(f / FS * n)) + n // 2) % n
        assert strong_ref[b] and strong_ours[b], (f, b)
    # matched gains where both scale (t2 = sqrt(limit/maxval))
    both = (lim_ref > 0) & (lim_ours > 0)
    assert both.sum() >= 2
    ratio = lim_ours[both] / lim_ref[both]
    assert np.all((ratio > 1 / 1.5) & (ratio < 1.5)), ratio


def test_liminfo_full_chain_vs_reference(jnp):
    """Classification agreement with the live update cadence and the
    noise-floor branch engaged (sellim.c:867-1100): strong carrier in
    noise, both chains running their own averaging/hysteresis.  The
    estimators legitimately differ (slowsum+waterf_yfac vs EMA;
    3-smallest groups vs top-k) so the assertion is behavioural: the
    carrier region is strong in both, and weak/strong maps agree over
    nearly all bins."""
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.sellim import SellimState, update_liminfo

    rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2)
    rc.set_hg("clever_bln_mode", 0)
    rc.set_hg("stupid_bln_mode", 0)
    geo, _p = _wide_geo(rc)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    rng = np.random.default_rng(31)
    nsamp = newp * 96
    t = np.arange(nsamp) / FS
    iq = np.round(8000.0 * np.exp(2j * np.pi * 24000.0 * t)
                  + 50.0 * (rng.standard_normal(nsamp)
                            + 1j * rng.standard_normal(nsamp)))
    ch = newp * 3                     # liminfo updates on feed cadence
    for i in range(len(iq) // ch):
        rc.feed_iq(iq[i * ch:(i + 1) * ch])
        rc.run_wideband()
    lim_ref = rc.array("liminfo", 2 * n)[:n].copy()

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    st = SellimState.create(geo)
    spp = geo.fft1_frames_per_step * newp
    for s in range(len(iq) // spp):
        blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
        s1, _spec, _ = fft1_step(geo, t1, s1, jnp.asarray(blk),
                                 avg1num=5)
        avg_p = np.sum(np.asarray(s1.sumsq_avg), axis=-1)
        st = update_liminfo(geo, st, jnp.asarray(avg_p), 8.0, ston=30.0)
    lim_ours = np.roll(np.asarray(st.liminfo), n // 2)

    b = (int(round(24000.0 / FS * n)) + n // 2) % n
    assert lim_ref[b] != 0 and lim_ours[b] != 0
    agree = np.mean((lim_ref != 0) == (lim_ours != 0))
    assert agree > 0.9, agree


def test_stupid_blanker_exact_vs_reference(jnp):
    """Pinned-state stupid blanker: identical cleared-point sets and
    float32-exact surviving samples vs blank1.c:1013-1083.

    The noise floor and the absolute limit are pinned on both sides
    (reference: stupid_bln_mode=2 fixed limit + ref_set_var noise
    floor; ours: explicit kernel arguments), so the clear + widen
    decisions must coincide exactly."""
    rc = _wide_ref()
    geo, _p = _wide_geo(rc)
    newp = geo.fft1_new_points
    rng = np.random.default_rng(9)
    nsamp = newp * 64
    iq = (200.0 * (rng.standard_normal(nsamp)
                   + 1j * rng.standard_normal(nsamp)))
    # isolated strong impulses away from the reference's per-transform
    # blanker chunk edges (multiples of fft1_new_points)
    pulse_pos = []
    for k in range(4, nsamp // newp - 4, 3):
        pos = k * newp + 300 + int(rng.integers(0, 300))
        amp = 12000.0 * (1 + rng.random())   # keeps |I|,|Q| < 32767
        ph = np.exp(2j * np.pi * rng.random())
        iq[pos] += amp * ph
        pulse_pos.append(pos)
    iq = np.round(iq)
    assert np.abs(iq.real).max() < 32767 and np.abs(iq.imag).max() < 32767

    # pass A — blankers off: fit the scale s and the ref noise power
    rc.feed_iq(iq)
    rc.run_wideband()
    pts = rc.geo("timf2_pa") // 4
    ref_a = rc.timf2_stream(pts)[:, 0, 0]
    ours_w, ours_pwr, _ = _run_ours_wideband(geo, iq, jnp)
    m = min(len(ours_w), pts) - geo.fft1_size
    s, maxrel = _fit_altconj(ours_w[:m], ref_a[:m], skip=3000)
    assert maxrel < 1e-5
    s2 = float(abs(s)) ** 2
    ref_pwr_a = np.abs(ref_a[:m]) ** 2
    nf_ref = float(np.median(ref_pwr_a[3000:])) * 1.4  # ~mean of |z|^2

    # pass B — stupid blanker on, pinned state, fixed absolute limit
    lim_ref = 30.0 * nf_ref
    rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2)
    rc.set_liminfo_auto(False)
    rc.set_hg("clever_bln_mode", 0)
    rc.set_hg("stupid_bln_mode", 2)
    rc.set_hg("stupid_bln_limit", lim_ref)
    rc.set_var("timf2_noise_floor", nf_ref)
    rc.set_var("blanker_info_update_interval", 1 << 30)
    rc.set_var("min_delay_time", 1e-9)  # blanker runs every transform
    pw = rc.geo("blanker_pulsewidth")
    rc.feed_iq(iq)
    rc.run_wideband()
    fit_end = int(rc.get_var("timf2p_fit"))
    ref_b = rc.timf2_stream(pts)[:, 0, 0]

    nf_ours = nf_ref / s2
    lim_amp = math.sqrt(lim_ref / nf_ref)
    _wb, pwr_b, _ = _run_ours_wideband(geo, iq, jnp,
                                       blanker=(nf_ours, lim_amp, pw))
    mb = min(m, fit_end - 64)
    ref_clear = np.abs(ref_b[:mb]) == 0.0
    our_clear = pwr_b[:mb] == 0.0
    # identical cleared sets (after the startup transient)
    mismatch = np.flatnonzero(ref_clear[3000:] != our_clear[3000:])
    assert mismatch.size == 0, mismatch[:20] + 3000
    assert ref_clear.sum() > 20          # blanker actually fired
    # surviving samples unchanged and still exact
    s_b, maxrel_b = _fit_altconj(_wb[:mb], ref_b[:mb], skip=3000,
                                 mask=~our_clear)
    assert maxrel_b < 1e-5, (s_b, maxrel_b)


def _ref_collect_baseb(rc, iq, chunk_frames=12):
    """Feed in chunks, run wideband+narrowband, return baseb_raw."""
    from refharness import load
    lib = load()
    lib.ref_read_baseb_raw.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long]
    newp = rc.geo("fft1_new_points")
    ch = newp * chunk_frames
    pos = 0
    out = []
    for k in range(len(iq) // ch):
        rc.feed_iq(iq[k * ch:(k + 1) * ch])
        rc.run_wideband()
        rc.run_narrowband()
        pa = rc.geo("baseb_pa")
        nn = pa - pos
        if nn:
            buf = np.empty(2 * nn, np.float32)
            lib.ref_read_baseb_raw(buf, pos, nn)
            out.append(buf[0::2] + 1j * buf[1::2])
            pos = pa
    return np.concatenate(out).astype(np.complex64)


def _tone_snr_db(z, fs, f_tone, guard_bins=6):
    z = z - z.mean()
    w = np.hanning(len(z))
    spec = np.abs(np.fft.fft(z * w)) ** 2
    f = np.fft.fftfreq(len(z), 1.0 / fs)
    kk = int(np.argmin(np.abs(f - f_tone)))
    idx = np.arange(kk - guard_bins, kk + guard_bins + 1) % len(z)
    tone = spec[idx].sum()
    return 10.0 * math.log10(tone / max(spec.sum() - tone, 1e-30))


def test_wideband_audio_snr_parity_vs_reference(jnp):
    """BASELINE configs 3/4 headline: the FULL second-FFT receive chain
    (fft1 -> sellim -> back transform -> stupid blanker -> fft2 -> mix1
    -> fft3 -> mix2) on pulse-laden noisy IQ with a weak carrier; the
    demodulated-baseband tone SNR must match the reference within 1.5 dB
    and the blanker must be the thing delivering it (SNR collapses by
    >6 dB with the blankers off in both chains)."""
    import dataclasses

    import jax.numpy as jnp_
    from linrad_tpu.params import Demod, RxParams
    from linrad_tpu.pipeline.chain import (RxState, RxTables,
                                           make_rx_step)
    from linrad_tpu.ops.blanker import BlankerTables

    rng = np.random.default_rng(17)
    rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2)
    geo, params = _wide_geo(rc)
    newp = geo.fft1_new_points
    nsamp = newp * 480          # ~5 s: the reference's auto noise
    t = np.arange(nsamp) / FS   # floor needs ~1 s to converge (buf.c:341)
    f_true, df = 12000.0, 800.0
    iq = (500.0 * np.exp(2j * np.pi * (f_true + df) * t)
          + 150.0 * (rng.standard_normal(nsamp)
                     + 1j * rng.standard_normal(nsamp)))
    # strong impulsive interference: ~120 pulses/s
    npulse = int(nsamp / FS * 120)
    for pos in rng.integers(newp, nsamp - newp, npulse):
        iq[pos] += (20000.0 + 8000.0 * rng.random()) * np.exp(
            2j * np.pi * rng.random())
    iq = np.round(np.clip(iq.real, -32767, 32767)
                  + 1j * np.clip(iq.imag, -32767, 32767))

    def run_ref(stupid_on, warm_floor=None):
        rcx = RefChain(ad_speed=96000, second_fft=1, sinpow=2)
        rcx.set_hg("clever_bln_mode", 0)   # forced off uncalibrated
        rcx.set_hg("stupid_bln_mode", 1 if stupid_on else 0)
        if warm_floor is not None:
            # converged state: cold start is 200 (buf.c:418) and takes
            # ~10 s of x11-per-update growth to reach int16-scale power
            rcx.set_var("timf2_noise_floor", warm_floor)
            rcx.set_hg("stupid_bln_limit", 5.0 * warm_floor)
        rcx.tune(FS / 2 + f_true)
        z = _ref_collect_baseb(rcx, iq)
        fs_bb = rcx.geof("baseband_sampling_speed")
        snr = _tone_snr_db(z[len(z) // 2:], fs_bb, -df)
        pwr = rcx.array("timf2_pwr_float", rcx.geo("timf2pow_size")).copy()
        return snr, pwr

    def run_ours(stupid_on, warm_floor=None):
        from linrad_tpu.ops.blanker import BlankerState
        p = dataclasses.replace(
            params, demod=Demod.NONE, agc_enable=False,
            filter_low_hz=-1200.0, filter_high_hz=1200.0,
            blanker_enable=stupid_on,
            clever_bln_limit=1e6,          # stupid-only, like the ref
            stupid_bln_limit=2.236,        # the ref default factor 5
            sellim_maxlevel=12000.0,       # genparm default, A/D units
            max_pulses_per_block=8)        # in power (hires_graph.c)
        import jax
        tables = RxTables.create(geo, p)
        _, pw = BlankerTables.create(geo)
        step = jax.jit(make_rx_step(geo, p, blanker_pulsewidth=pw))
        state = RxState.create(geo)
        if warm_floor is not None:
            state = dataclasses.replace(
                state, blanker=BlankerState(
                    noise_floor=jnp_.float32(warm_floor)))
        tune_bin = int(round(f_true * geo.fftx_size / FS))
        spp = geo.samples_per_step
        outs, pwrs = [], []
        for s in range(len(iq) // spp):
            blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
            state, out = step(tables, state, blk, jnp_.int32(tune_bin))
            outs.append(np.asarray(out.baseb[:, 0]))
            pwrs.append(float(out.noise_floor))
        z = np.concatenate(outs)
        snr = _tone_snr_db(z[len(z) // 2:], geo.baseband_sampling_speed,
                           df)
        return snr, float(pwrs[-1])   # converged tracked floor

    def despiked(pwr):
        m = np.median(pwr[pwr > 0]) * 1.4      # ~mean of |z|^2
        return float(m)

    snr_ref_off, pwr_ref = run_ref(False)
    snr_ours_off, nf_ours = run_ours(False)
    nf_ref = despiked(pwr_ref)
    snr_ref_on, _ = run_ref(True, warm_floor=nf_ref)
    snr_ours_on, _ = run_ours(True, warm_floor=nf_ours)
    # the blanker is doing real work in both chains
    assert snr_ref_on - snr_ref_off > 6.0, (snr_ref_on, snr_ref_off)
    assert snr_ours_on - snr_ours_off > 6.0, (snr_ours_on, snr_ours_off)
    # and the chains agree, blanked and unblanked
    assert abs(snr_ours_on - snr_ref_on) < 1.5, (snr_ours_on, snr_ref_on)
    assert abs(snr_ours_off - snr_ref_off) < 1.5, (snr_ours_off,
                                                   snr_ref_off)
    assert snr_ref_on > 10.0


def test_liminfo_wide_skirt_vs_reference(jnp):
    """VERDICT r2 item 10: a strong signal far wider than any bounded
    walk (40-bin modulation) vs the compiled reference's unbounded
    skirt walk.  Our skirt extension is an exact associative-scan reach
    (ops/sellim._chain_reach), so the only legitimate differences are
    borderline bins (power within ~30% of the limit classify on float
    noise) and their taper shadows."""
    import math as _m

    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.sellim import (SellimState, sellim_limit,
                                       update_liminfo)

    rc = _wide_ref()
    geo, _p = _wide_geo(rc)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    k = 16
    rc.set_wg("fft_avg1num", 1000)
    rc.set_wg("spek_avgnum", 1e9)
    m_ref = 10000.0
    rc.set_genparm(10, int(m_ref))
    rng = np.random.default_rng(77)
    t = np.arange(k * newp) / FS
    bw = 40 * FS / n
    mod = np.convolve(
        rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)),
        np.ones(int(FS / bw)) / int(FS / bw), mode="same")
    sig = 8000.0 * mod * np.exp(2j * np.pi * 18000.0 * t)
    iq = np.round(sig + 20.0 * (rng.standard_normal(len(t))
                                + 1j * rng.standard_normal(len(t))))
    iq = (np.clip(iq.real, -32767, 32767)
          + 1j * np.clip(iq.imag, -32767, 32767))
    rc.feed_iq(iq)
    assert rc.run_wideband() == k
    rc.update_liminfo()
    lim_ref = rc.array("liminfo", 2 * n)[:n].copy()

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    _, spec, _ = fft1_step(geo, t1, s1,
                           jnp.asarray(iq.astype(np.complex64)[:, None]),
                           avg1num=8)
    avg_p = np.mean(np.abs(np.asarray(spec)[:, :, 0]) ** 2, axis=0)
    fcs, c_win = 0.137449, 1.6319311
    l_ref = m_ref ** 2 * 1000.0 * n / geo.fft2_size
    l_ours = l_ref / (k * (fcs * c_win) ** 2)
    m_ours = _m.sqrt(l_ours / sellim_limit(geo, 1.0))
    st = update_liminfo(geo, SellimState.create(geo),
                        jnp.asarray(avg_p, jnp.float32), m_ours,
                        ston=1e12)
    lim_ours = np.roll(np.asarray(st.liminfo), n // 2)

    sr, so = lim_ref != 0, lim_ours != 0
    # the wide region IS wide in both (far beyond an 8-step walk)
    assert sr.sum() > 45 and so.sum() > 45, (sr.sum(), so.sum())
    assert np.mean(sr == so) > 0.99
    # mismatches only at borderline power or in a borderline bin's
    # taper shadow (within the width/4+1 taper reach of one)
    p_band = np.roll(avg_p, n // 2) * (k * (fcs * c_win) ** 2)
    borderline = np.abs(p_band / l_ref - 1.0) < 0.35
    reach = 16
    shadow = np.convolve(borderline.astype(float),
                         np.ones(2 * reach + 1), mode="same") > 0
    for i in np.flatnonzero(sr != so):
        assert shadow[i], i
    # where both scale, the dominant region's gain agrees exactly
    # (same region max); fragmentation at borderline bins may give a
    # few bins their own gain, so assert on the bulk
    both = (lim_ref > 0) & (lim_ours > 0)
    assert both.sum() > 30
    ratio = lim_ours[both] / lim_ref[both]
    assert np.median(np.abs(ratio - 1.0)) < 0.01
    assert np.mean(np.abs(ratio - 1.0) < 0.02) > 0.7, ratio


def test_clever_blanker_single_pulse_vs_reference(jnp):
    """Single-pulse crosscheck of the fit-and-subtract blanker vs the
    compiled subtract_onechan_pulse (blank1.c:36-232; VERDICT r2 weak
    item 4).  The reference needs amplitude calibration for its
    reference-pulse bank, so the harness pretends CALAMP with the
    default desired response — the same flat+edge-taper response our
    bank is built from.  Both must fit exactly one pulse, suppress its
    window by >18 dB, agree within 6 dB, and leave everything outside
    the subtraction window float-exact."""
    import math as _m

    from refharness import load
    from linrad_tpu.ops import blanker as blanker_ops
    from linrad_tpu.ops.blanker import BlankerTables

    lib = load()
    lib.ref_set_pretend_calamp(1)
    try:
        rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2)
        rc.set_liminfo_auto(False)
        assert rc.geo("refpul_size") == 256   # bank actually built
        geo, _p = _wide_geo(rc)
        newp = geo.fft1_new_points
        n = newp * 48
        rng = np.random.default_rng(5)
        iq = 100.0 * (rng.standard_normal(n)
                      + 1j * rng.standard_normal(n))
        iq[20 * newp + 517] += 20000.0 * np.exp(0.7j)
        iq = np.round(iq)

        # pass A: blankers off (shared unblanked stream + noise floor)
        rc.set_hg("clever_bln_mode", 0)
        rc.set_hg("stupid_bln_mode", 0)
        rc.feed_iq(iq)
        rc.run_wideband()
        pts = rc.geo("timf2_pa") // 4
        ref_off = rc.timf2_stream(pts)[:, 0, 0].copy()
        nf_ref = float(np.median(np.abs(ref_off[5000:]) ** 2)) * 1.4
        lim_ref = 30.0 * nf_ref

        # pass B: reference clever blanker, pinned state
        rc2 = RefChain(ad_speed=96000, second_fft=1, sinpow=2)
        rc2.set_liminfo_auto(False)
        rc2.set_hg("stupid_bln_mode", 0)
        rc2.set_hg("clever_bln_mode", 2)
        rc2.set_hg("clever_bln_limit", lim_ref)
        rc2.set_var("timf2_noise_floor", nf_ref)
        rc2.set_var("blanker_info_update_interval", 1 << 30)
        rc2.set_var("min_delay_time", 1e-9)
        rc2.feed_iq(iq)
        rc2.run_wideband()
        ref_on = rc2.timf2_stream(pts)[:, 0, 0].copy()
        assert rc2.geo("timf2_fitted_pulses") == 1

        # ours: same chain all-weak, then the clever blanker with the
        # matched threshold; our timf2 is float-exact vs ref_off, so
        # both blankers see the same pulse
        ours_w, ours_pwr, _ = _run_ours_wideband(geo, iq, jnp)
        m = min(len(ours_w), pts) - geo.fft1_size
        s, maxrel = _fit_altconj(ours_w[:m], ref_off[:m], skip=3000)
        assert maxrel < 1e-5
        s2 = float(abs(s)) ** 2
        nf_ours = nf_ref / s2
        lim_amp = _m.sqrt(lim_ref / nf_ref)
        tables, pw = BlankerTables.create(geo)
        w2, p2, nfit = blanker_ops.clever_blanker(
            jnp.asarray(ours_w[:m][:, None]),
            jnp.asarray(ours_pwr[:m]), tables,
            jnp.float32(nf_ours), lim_amp, pw, max_pulses=8,
            block_size=0)
        assert int(nfit) == 1
        w2 = np.asarray(w2)[:, 0]

        ppos = int(np.argmax(np.abs(ref_off[:m])))
        sl = slice(ppos - 40, ppos + 40)
        e_off = float((np.abs(ref_off[sl]) ** 2).sum())
        supp_ref = 10 * _m.log10(
            e_off / float((np.abs(ref_on[sl]) ** 2).sum()))
        supp_ours = 10 * _m.log10(
            e_off / (float((np.abs(w2[sl]) ** 2).sum()) * s2))
        assert supp_ref > 18.0 and supp_ours > 18.0, (supp_ref,
                                                      supp_ours)
        assert abs(supp_ref - supp_ours) < 6.0, (supp_ref, supp_ours)

        # outside both subtraction windows the streams stay exact
        mask = np.ones(m, bool)
        mask[max(ppos - 300, 0): ppos + 300] = False
        mask[:3000] = False
        s_b, maxrel_b = _fit_altconj(w2, ref_on[:m], skip=0, mask=mask)
        assert maxrel_b < 1e-5, (s_b, maxrel_b)
    finally:
        lib.ref_set_pretend_calamp(0)


def test_timf2_and_fft2_exact_two_channels(jnp):
    """2-channel wideband branch: the dual-channel back transform
    (fft1back_two / split_two) and the two-channel fft2 bodies
    (fft2.c separate 1-chan/2-chan paths) reproduce the reference
    float32-exactly on both RF channels."""
    from refharness import IQ_DATA, TWO_CHANNELS
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.fft2 import FFT2State, FFT2Tables, fft2_step
    from linrad_tpu.ops.timf2 import (Timf2State, make_timf2_syn,
                                      timf2_step)
    import dataclasses

    rc = _wide_ref(rf_channels=2, input_mode=IQ_DATA + TWO_CHANNELS)
    _geo1, params = _wide_geo(rc)
    params = dataclasses.replace(params, rx_rf_channels=2)
    from linrad_tpu.geometry import derive_geometry
    geo = derive_geometry(params)
    assert geo.channels == 2

    newp = geo.fft1_new_points
    n = geo.fft1_size
    n2 = geo.fft2_size
    rng = np.random.default_rng(8)
    nsamp = newp * 64
    iq = np.round(3000 * (rng.standard_normal((nsamp, 2))
                          + 1j * rng.standard_normal((nsamp, 2))))
    rc.feed_iq(iq)
    rc.run_wideband()
    pts = rc.geo("timf2_pa") // (4 * 2)
    ref_t2 = rc.timf2_stream(pts)       # (pts, 2[weak/strong], 2 ch)

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    syn = make_timf2_syn(geo)
    st2 = Timf2State.create(geo)
    tf2, sf2 = FFT2Tables.create(geo), FFT2State.create(geo)
    wg = jnp.ones(n, jnp.float32)
    sg = jnp.zeros(n, jnp.float32)
    spp = geo.fft1_frames_per_step * newp
    weak_all, f2_all = [], []
    for s in range(len(iq) // spp):
        blk = jnp.asarray(iq[s * spp:(s + 1) * spp].astype(np.complex64))
        s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        st2, weak, strong, wpwr = timf2_step(geo, syn, st2, spec, wg, sg)
        sf2, spec2, _ = fft2_step(geo, tf2, sf2, weak, strong)
        weak_all.append(np.asarray(weak))
        f2_all.append(np.asarray(spec2))
    ours_w = np.concatenate(weak_all)           # (t, 2)
    ours2 = np.concatenate(f2_all, axis=0)      # (nf, n2, 2)

    m = min(len(ours_w), pts) - geo.fft1_size
    for ch in range(2):
        s, maxrel = _fit_altconj(ours_w[:m, ch], ref_t2[:m, 0, ch],
                                 skip=3000)
        assert maxrel < 1e-5, (ch, s, maxrel)
        assert np.abs(ref_t2[:m, 1, ch]).max() == 0.0   # all-weak

    nfft2 = rc.geo("fft2_na")
    assert nfft2 >= 8
    raw2 = rc.array("fft2_float", nfft2 * 4 * n2).copy()
    for r in range(2, nfft2):
        fr = raw2[r * 4 * n2:(r + 1) * 4 * n2].reshape(n2, 4)
        for ch in range(2):
            ref_fr = fr[:, 2 * ch] + 1j * fr[:, 2 * ch + 1]
            a = np.conj(np.fft.fftshift(ours2[r + 1, :, ch]))
            s = np.vdot(a, ref_fr) / np.vdot(a, a)
            err = np.abs(ref_fr - s * a)
            maxrel = err.max() / np.abs(ref_fr).max()
            assert maxrel < 1e-5, (r, ch, s, maxrel)


def test_clever_blanker_two_channel_pulse_vs_reference(jnp):
    """2-channel single-pulse crosscheck vs subtract_twochan_pulse
    (blank1.c:232-432): the reference rotates timf2 into the pulse's
    polarization frame (get_pulse_pol blank1.c:433, transform_timf2_pol
    :565) and fits there; our design fits a per-channel phase against
    the shared refpulse shape.  Both must fit exactly one pulse and
    suppress the polarized pulse comparably on BOTH channels."""
    import math as _m

    from refharness import IQ_DATA, TWO_CHANNELS, load
    from linrad_tpu.geometry import derive_geometry
    from linrad_tpu.ops import blanker as blanker_ops
    from linrad_tpu.ops.blanker import BlankerTables
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.timf2 import (Timf2State, make_timf2_syn,
                                      timf2_step)
    import dataclasses

    lib = load()
    lib.ref_set_pretend_calamp(1)
    try:
        kw = dict(ad_speed=96000, second_fft=1, sinpow=2, rf_channels=2,
                  input_mode=IQ_DATA + TWO_CHANNELS)
        rc = RefChain(**kw)
        rc.set_liminfo_auto(False)
        assert rc.geo("refpul_size") == 256
        _g1, params = _wide_geo(rc)
        params = dataclasses.replace(params, rx_rf_channels=2)
        geo = derive_geometry(params)
        newp = geo.fft1_new_points
        n = newp * 48
        rng = np.random.default_rng(5)
        iq = 100.0 * (rng.standard_normal((n, 2))
                      + 1j * rng.standard_normal((n, 2)))
        # a polarized pulse: different amplitude AND phase per channel
        iq[20 * newp + 517, 0] += 20000.0 * np.exp(0.7j)
        iq[20 * newp + 517, 1] += 12000.0 * np.exp(-0.4j)
        iq = np.round(iq)

        rc.set_hg("clever_bln_mode", 0)
        rc.set_hg("stupid_bln_mode", 0)
        rc.feed_iq(iq)
        rc.run_wideband()
        pts = rc.geo("timf2_pa") // 8
        ref_off = rc.timf2_stream(pts)[:, 0, :].copy()
        nf_ref = float(np.median(np.abs(ref_off[5000:, 0]) ** 2
                       + np.abs(ref_off[5000:, 1]) ** 2)) * 1.4
        lim_ref = 30.0 * nf_ref

        rc2 = RefChain(**kw)
        rc2.set_liminfo_auto(False)
        rc2.set_hg("stupid_bln_mode", 0)
        rc2.set_hg("clever_bln_mode", 2)
        rc2.set_hg("clever_bln_limit", lim_ref)
        rc2.set_var("timf2_noise_floor", nf_ref)
        rc2.set_var("blanker_info_update_interval", 1 << 30)
        rc2.set_var("min_delay_time", 1e-9)
        rc2.feed_iq(iq)
        rc2.run_wideband()
        ref_on = rc2.timf2_stream(pts)[:, 0, :].copy()
        assert rc2.geo("timf2_fitted_pulses") == 1

        t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
        syn = make_timf2_syn(geo)
        st2 = Timf2State.create(geo)
        wg = jnp.ones(geo.fft1_size, jnp.float32)
        sg = jnp.zeros(geo.fft1_size, jnp.float32)
        spp = geo.fft1_frames_per_step * newp
        weak_all, pwr_all = [], []
        for s in range(len(iq) // spp):
            blk = jnp.asarray(
                iq[s * spp:(s + 1) * spp].astype(np.complex64))
            s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
            st2, weak, strong, wpwr = timf2_step(geo, syn, st2, spec,
                                                 wg, sg)
            weak_all.append(np.asarray(weak))
            pwr_all.append(np.asarray(wpwr))
        ours_w = np.concatenate(weak_all)
        ours_pwr = np.concatenate(pwr_all)
        m = min(len(ours_w), pts) - geo.fft1_size
        s0, maxrel = _fit_altconj(ours_w[:m, 0], ref_off[:m, 0],
                                  skip=3000)
        assert maxrel < 1e-5
        s2f = float(abs(s0)) ** 2

        tables, pw = BlankerTables.create(geo)
        w2, _p2, nfit = blanker_ops.clever_blanker(
            jnp.asarray(ours_w[:m]), jnp.asarray(ours_pwr[:m]), tables,
            jnp.float32(nf_ref / s2f), _m.sqrt(lim_ref / nf_ref), pw,
            max_pulses=8, block_size=0)
        assert int(nfit) == 1
        w2 = np.asarray(w2)

        ppos = int(np.argmax(np.abs(ref_off[:m, 0])))
        sl = slice(ppos - 40, ppos + 40)
        for ch in range(2):
            e_off = float((np.abs(ref_off[sl, ch]) ** 2).sum())
            supp_ref = 10 * _m.log10(
                e_off / float((np.abs(ref_on[sl, ch]) ** 2).sum()))
            supp_ours = 10 * _m.log10(
                e_off / (float((np.abs(w2[sl, ch]) ** 2).sum()) * s2f))
            assert supp_ref > 15.0 and supp_ours > 15.0, (
                ch, supp_ref, supp_ours)
            assert abs(supp_ref - supp_ours) < 6.0, (ch, supp_ref,
                                                     supp_ours)

        # outside the subtraction window both channels stay exact
        mask = np.ones(m, bool)
        mask[max(ppos - 300, 0): ppos + 300] = False
        mask[:3000] = False
        for ch in range(2):
            _sb, maxrel_b = _fit_altconj(w2[:, ch], ref_on[:m, ch],
                                         skip=0, mask=mask)
            assert maxrel_b < 1e-5, (ch, maxrel_b)
    finally:
        lib.ref_set_pretend_calamp(0)


def test_timf2_real_input_bounded_vs_reference(jnp):
    """Real (non-IQ) input wideband: the reference's real-mode back
    transform vs our rfft-fold + N-point inverse.

    Bin-indexed root cause of the former "-32 dB differs slightly"
    bound (VERDICT r3 #6): the deviation lives ENTIRELY in the packed
    DC/Nyquist slot (bin 0 of the one-sided spectrum — the reference
    packs re=Nyquist, im=DC there, fft1_re.c:100-102, and its
    split/back pipeline carries ~-34 dB of frame-varying junk in that
    slot that is not a clean function of the frame's DC/Nyquist).
    Bins 1..N-1 are float32-exact: after REMOVING a fitted per-frame
    bin-0 component (the OLA synthesis-window shape) from the
    difference, the residual is at float32 level (<1e-4 rel rms,
    measured 1.8e-5).  The overall production-path bound (<4 % max
    rel) is kept as the headline envelope."""
    import dataclasses

    from refharness import load
    from linrad_tpu.geometry import derive_geometry
    from linrad_tpu.params import InputMode
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.timf2 import (Timf2State, make_timf2_syn,
                                      timf2_step)

    rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2, input_mode=0,
                  rf_channels=1)
    rc.set_liminfo_auto(False)
    rc.set_hg("clever_bln_mode", 0)
    rc.set_hg("stupid_bln_mode", 0)
    lib = load()
    _g, params = _wide_geo(rc)
    params = dataclasses.replace(params, input_mode=InputMode.REAL)
    geo = derive_geometry(params)
    newp = geo.fft1_new_points
    rng = np.random.default_rng(3)
    nsamp = 2 * newp * 64
    x = np.round(3000 * rng.standard_normal(nsamp)).astype(np.float32)
    words = x.astype(np.int16)
    chsz = 2 * newp * 16
    for k in range(len(words) // chsz):
        flat = np.ascontiguousarray(words[k * chsz:(k + 1) * chsz])
        lib.ref_feed(flat, flat.size)
        rc.run_wideband()
    pts = rc.geo("timf2_pa") // 4
    ref = rc.timf2_stream(pts)[:, 0, 0]

    t1 = FFT1Tables.create(geo)
    s1 = FFT1State.create(geo)
    syn = make_timf2_syn(geo)
    st2 = Timf2State.create(geo)
    wg = jnp.ones(geo.fft1_size, jnp.float32)
    sg = jnp.zeros(geo.fft1_size, jnp.float32)
    spp2 = 2 * geo.samples_per_step
    weak_all, weak0_all = [], []
    st2z = Timf2State.create(geo)
    for s in range(len(x) // spp2):
        blk = jnp.asarray(x[s * spp2:(s + 1) * spp2][:, None])
        s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        st2, weak, strong, wpwr = timf2_step(geo, syn, st2, spec, wg, sg)
        weak_all.append(np.asarray(weak[:, 0]))
        # same spectra with the packed DC/Nyquist slot zeroed
        st2z, weak0, _s0, _p0 = timf2_step(
            geo, syn, st2z, spec.at[:, 0, :].set(0), wg, sg)
        weak0_all.append(np.asarray(weak0[:, 0]))
    ours = np.concatenate(weak_all)
    ours0 = np.concatenate(weak0_all)
    m = min(len(ours), pts)
    lag = 512            # one fft1 hop of group-delay offset

    def _fit(series):
        aa, bb = np.conj(series[:m])[3000:m - lag], ref[3000 + lag:m]
        k2 = min(len(aa), len(bb))
        aa, bb = aa[:k2], bb[:k2]
        sc = np.vdot(aa, bb) / np.vdot(aa, aa)
        return bb - sc * aa, bb

    # headline envelope on the production path
    err, bb = _fit(ours)
    maxrel = np.abs(err).max() / np.abs(bb).max()
    assert maxrel < 0.04, maxrel
    rms = float(np.sqrt((np.abs(err) ** 2).mean()
                        / (np.abs(bb) ** 2).mean()))
    assert rms < 0.05, rms

    # bin-indexed exactness: with OUR bin 0 zeroed, the difference is
    # the reference's per-frame bin-0 term alone — remove a fitted
    # per-frame amplitude with the OLA synthesis-window shape and the
    # rest of the band is float32-exact
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    err0, bb0 = _fit(ours0)
    N = geo.fft1_size
    hop = geo.fft1_new_points
    synv = np.asarray(syn)
    T = len(err0)
    n_frames = len(ours) // hop
    rows, cols, vals = [], [], []
    for f in range(n_frames):
        start = f * hop - 3000
        s0, s1_ = max(start, 0), min(start + N, T)
        if s1_ <= s0:
            continue
        idx = np.arange(s0, s1_)
        rows.append(idx)
        cols.append(np.full(len(idx), f))
        vals.append(synv[idx - start])
    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows),
                                np.concatenate(cols))),
        shape=(T, n_frames))
    c = spl.lsqr(A, err0, atol=1e-10, btol=1e-10)[0]
    res = err0 - A @ c
    rel = float(np.sqrt((np.abs(res) ** 2).mean()
                        / (np.abs(bb0) ** 2).mean()))
    assert rel < 1e-4, rel


def test_fft2_mix1_timf3_exact_vs_reference(jnp):
    """The second-FFT narrowband tail: mix1 consuming the FFT2 stream
    (fft2_mix1_fixed mix1.c:935-993 — the BASELINE config 3/4 tuning
    path) is sample-exact vs the reference through
    fft1 -> timf2 -> fft2 -> mix1 on broadband noise."""
    from refharness import load
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.fft2 import FFT2State, FFT2Tables, fft2_step
    from linrad_tpu.ops.mix1 import Mix1State, Mix1Tables, mix1_step
    from linrad_tpu.ops.timf2 import (Timf2State, make_timf2_syn,
                                      timf2_step)

    rc = _wide_ref()
    geo, _p = _wide_geo(rc)
    lib = load()
    newp = geo.fft1_new_points
    rng = np.random.default_rng(6)
    nsamp = geo.samples_per_step * 2
    iq = np.round(3000 * (rng.standard_normal(nsamp)
                          + 1j * rng.standard_normal(nsamp))
                  ).astype(np.complex64)
    f_true = 12000.0
    rc.tune(FS / 2 + f_true)
    ch = newp * 16
    for k in range(nsamp // ch):
        rc.feed_iq(iq[k * ch:(k + 1) * ch])
        rc.run_wideband()
        while lib.ref_step_mix1() == 1:
            pass
    pa = rc.geo("timf3_pa")
    w = rc.array("timf3_float", pa).copy()
    ref = (w[0::2] + 1j * w[1::2]).astype(np.complex64)

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    syn = make_timf2_syn(geo)
    st2 = Timf2State.create(geo)
    tf2, sf2 = FFT2Tables.create(geo), FFT2State.create(geo)
    tm, sm = Mix1Tables.create(geo), Mix1State.create(geo)
    wg = jnp.ones(geo.fft1_size, jnp.float32)
    sg = jnp.zeros(geo.fft1_size, jnp.float32)
    tune_bin = int(round(f_true * geo.fft2_size / FS))
    spp = geo.samples_per_step
    outs = []
    for s in range(nsamp // spp):
        blk = jnp.asarray(iq[s * spp:(s + 1) * spp, None])
        s1, spec1, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        st2, weak, strong, wpwr = timf2_step(geo, syn, st2, spec1, wg, sg)
        sf2, spec2, _ = fft2_step(geo, tf2, sf2, weak, strong)
        sm, timf3 = mix1_step(geo, tm, sm, spec2, tune_bin)
        outs.append(np.asarray(timf3[:, 0]))
    ours = np.concatenate(outs)
    m = min(len(ours), len(ref))
    a, b = np.conj(ours[:m]), ref[:m]
    size = 1 << int(np.ceil(np.log2(2 * m)))
    corr = np.fft.ifft(np.fft.fft(b, size) * np.conj(np.fft.fft(a, size)))
    lag = int(np.argmax(np.abs(corr)))
    if lag > size // 2:
        lag -= size
    assert lag % (geo.mix1_new_points // 2) == 0, lag
    skip = 4 * geo.mix1_new_points
    if lag >= 0:
        aa, bb = a[skip:m - lag], b[skip + lag:m]
    else:
        aa, bb = a[skip - lag:m], b[skip:m + lag]
    k2 = min(len(aa), len(bb))
    aa, bb = aa[:k2], bb[:k2]
    sc = np.vdot(aa, bb) / np.vdot(aa, aa)
    err = np.abs(bb - sc * aa)
    assert err.max() / np.abs(bb).max() < 1e-5


def test_liminfo_classification_two_channels(jnp):
    """2-channel selective limiter: liminfo classifies on the CHANNEL-
    SUMMED per-bin power (fft1_sumsq accumulates both channels,
    fft1.c:4085; sellim.c:792 thresholds the sum), with the limit
    carrying the channel count (sellim.c:769-773 'one channel out of
    four').  Strong signals on DIFFERENT channels must both classify.
    Marginal skirt-edge bins at the 0.3-ratio crossing may flip with
    float accumulation order; at most 2 such edge bins may differ."""
    import dataclasses

    from refharness import IQ_DATA, TWO_CHANNELS
    from linrad_tpu.geometry import derive_geometry
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.sellim import (SellimState, sellim_limit,
                                       update_liminfo)

    rc = RefChain(ad_speed=96000, second_fft=1, sinpow=2, rf_channels=2,
                  input_mode=IQ_DATA + TWO_CHANNELS)
    rc.set_liminfo_auto(False)
    rc.set_hg("clever_bln_mode", 0)
    rc.set_hg("stupid_bln_mode", 0)
    _g, params = _wide_geo(rc)
    params = dataclasses.replace(params, rx_rf_channels=2)
    geo = derive_geometry(params)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    k = 16
    rc.set_wg("fft_avg1num", 1000)
    rc.set_wg("spek_avgnum", 1e9)
    m_ref = 10000.0
    rc.set_genparm(10, int(m_ref))

    rng = np.random.default_rng(21)
    t = np.arange(k * newp) / FS
    iq = np.zeros((k * newp, 2), np.complex128)
    iq[:, 0] = (6000.0 * np.exp(2j * np.pi * 12000.0 * t)
                + 30.0 * (rng.standard_normal(len(t))
                          + 1j * rng.standard_normal(len(t))))
    iq[:, 1] = (2500.0 * np.exp(2j * np.pi * 31171.875 * t)
                + 30.0 * (rng.standard_normal(len(t))
                          + 1j * rng.standard_normal(len(t))))
    iq = np.round(iq)
    rc.feed_iq(iq)
    assert rc.run_wideband() == k
    rc.update_liminfo()
    lim_ref = rc.array("liminfo", 2 * n)[:n].copy()

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    _, spec, _ = fft1_step(geo, t1, s1,
                           jnp.asarray(iq.astype(np.complex64)),
                           avg1num=8)
    avg_p = np.mean(np.sum(np.abs(np.asarray(spec)) ** 2, axis=2),
                    axis=0)
    fcs, c_win = 0.137449, 1.6319311
    l_ref = m_ref ** 2 * 1000.0 * 2 * n / geo.fft2_size
    l_ours = l_ref / (k * (fcs * c_win) ** 2)
    maxlevel_eq = np.sqrt(l_ours / sellim_limit(geo, 1.0))
    st = update_liminfo(geo, SellimState.create(geo),
                        jnp.asarray(avg_p, jnp.float32),
                        float(maxlevel_eq), ston=1e9)
    ours = np.asarray(st.liminfo)

    ref_strong = set(np.flatnonzero(np.fft.fftshift(lim_ref)
                                    != 0).tolist())
    our_strong = set(np.flatnonzero(ours != 0).tolist())
    # both signals classified (one per channel)
    assert any(250 <= b <= 263 for b in our_strong)
    assert any(658 <= b <= 672 for b in our_strong)
    diff = ref_strong ^ our_strong
    assert len(diff) <= 2, sorted(diff)
    agreed = ref_strong & our_strong
    for b in diff:                      # only skirt edges may differ
        assert (b - 1 in agreed) or (b + 1 in agreed), sorted(diff)
