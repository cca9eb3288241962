"""Golden parity against the compiled reference DSP chain.

VERDICT.md round-1 item 1 (the acceptance criterion): nothing had been
compared against output produced by the actual reference program.  These
tests compile the reference narrowband chain from the mounted tree
(tests/refharness) and drive it sample-by-sample next to our JAX chain
on identical int16 IQ streams.

Conventions (established empirically, pinned by these tests):

* The reference stores fft1 spectra DC-CENTRED and CONJUGATED:
  ref[i] = conj(fftshift(FFT(frame*w)))[i], so the linrad frequency
  coordinate of a true IQ frequency f is ``fq = f + fs/2`` and the
  baseband frequency axis comes out inverted (a tone at +800 Hz relative
  to the tuned frequency appears at -800 Hz in timf3/baseb).
* mix1 (do_mix1 mix1.c:55-647) places the *selected frequency* exactly
  at DC (integer bin via bin selection + fractional bin via a per-sample
  phase ramp mix1_phase_rot, set_mix1_phases mix1.c:781-860); for a tune
  frequency on an exact fft1 bin our integer-bin mixer matches it and
  ``timf3_ref[t] = s * conj(timf3_ours[t])`` for one complex constant s.
* mix1_fqwin is the erfc taper of make_window mode 5 (fft0.c:818-829,
  buf.c:1297) — see ops/mix1.fqwin_weight.
* With use_bfo (SSB/CW modes) the reference's baseb_out IS the filtered
  complex baseband (mix2.c:1779-1800; the BFO product happens in
  rx_output).  Audio SNR is invariant under the BFO rotation, so tone
  SNR measured on the complex baseband equals audio SNR.
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


@pytest.fixture()
def ref_ssb():
    return RefChain(ad_speed=96000, second_fft=0, sinpow=2)


def _our_geo(rc, frames_per_step=16):
    from linrad_tpu.geometry import derive_geometry
    from linrad_tpu.params import RxParams
    n = rc.geo("fft1_size")
    params = RxParams(
        rx_ad_speed=96000, fft1_n_override=int(math.log2(n)),
        first_fft_sinpow=2, second_fft_enable=False,
        mix1_bandwidth_reduction_n=int(
            math.log2(n // rc.geo("mix1_size"))),
        fft3_n=int(math.log2(rc.geo("fft3_size"))),
        mix2_reduction_n=int(math.log2(rc.geo("fft3_size")
                                       // rc.geo("mix2_size"))),
        target_fft1_frames_per_step=frames_per_step,
        agc_enable=False)
    geo = derive_geometry(params)
    assert geo.mix1_size == rc.geo("mix1_size")
    assert geo.fft3_size == rc.geo("fft3_size")
    assert geo.mix2_size == rc.geo("mix2_size")
    assert geo.fft1_new_points == rc.geo("fft1_new_points")
    return geo, params


def _ref_run_collect_baseb(rc, iq, chunk_frames=20):
    """Feed IQ in ring-safe chunks, returning the baseb_raw stream."""
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


def _fit_conj(ours: np.ndarray, ref: np.ndarray, lag: int, skip: int):
    """Best complex s for ref[t+lag] ~ s*conj(ours[t]); returns
    (max_rel_err, rms_rel_err)."""
    a = np.conj(ours)
    if lag >= 0:
        a, b = a[skip:len(a) - lag], ref[skip + lag:]
    else:
        a, b = a[skip - lag:], ref[skip:]
    k = min(len(a), len(b))
    a, b = a[:k], b[:k]
    s = np.vdot(a, b) / np.vdot(a, a)
    err = np.abs(b - s * a)
    return (err.max() / np.abs(b).max(),
            float(np.sqrt((err ** 2).mean() / (np.abs(b) ** 2).mean())))


def _find_lag(ours: np.ndarray, ref: np.ndarray) -> int:
    a = np.conj(ours)
    size = 1 << int(np.ceil(np.log2(len(a) + len(ref))))
    corr = np.fft.ifft(np.fft.fft(ref, size) * np.conj(np.fft.fft(a, size)))
    lag = int(np.argmax(np.abs(corr)))
    return lag - size if lag > size // 2 else lag


def test_mix1_timf3_exact_vs_reference(ref_ssb, jnp):
    """fft1 -> mix1 reproduces the reference's timf3 stream sample-exactly
    (float32 tolerance) on broadband noise — the mix1 phase-continuity
    crosscheck (mix1.c:55-234, set_mix1_phases mix1.c:781)."""
    from refharness import load
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.mix1 import Mix1State, Mix1Tables, mix1_step

    rc = ref_ssb
    geo, _p = _our_geo(rc)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    rng = np.random.default_rng(42)
    nsamp = newp * 96
    iq = np.round(4000 * (rng.standard_normal(nsamp)
                          + 1j * rng.standard_normal(nsamp)))

    f_true = 12000.0                      # exact fft1 bin (256)
    rc.tune(FS / 2 + f_true)
    rc.feed_iq(iq)
    rc.run_wideband()
    lib = load()
    while lib.ref_step_mix1() == 1:
        pass
    pa = rc.geo("timf3_pa")
    w = rc.array("timf3_float", pa).copy()
    ref = (w[0::2] + 1j * w[1::2]).astype(np.complex64)

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    tm, sm = Mix1Tables.create(geo), Mix1State.create(geo)
    tune_bin = int(round(f_true * n / FS))
    spp = geo.fft1_frames_per_step * newp
    ours = []
    for s in range(len(iq) // spp):
        blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
        s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        sm, timf3 = mix1_step(geo, tm, sm, spec, tune_bin)
        ours.append(np.asarray(timf3[:, 0]))
    ours = np.concatenate(ours)

    m = min(len(ours), len(ref))
    maxrel, rmsrel = _fit_conj(ours[:m], ref[:m], lag=0,
                               skip=4 * geo.mix1_new_points)
    assert maxrel < 1e-5, (maxrel, rmsrel)


def test_full_narrowband_baseband_exact_vs_reference(ref_ssb, jnp):
    """fft1 -> mix1 -> fft3 -> mix2 reproduces the reference's filtered
    baseband (baseb_raw) sample-exactly on broadband noise when our mix2
    filter is the reference's own bg_filterfunc (mix2.c:146-216)."""
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.fft3 import FFT3State, FFT3Tables, fft3_step
    from linrad_tpu.ops.mix1 import Mix1State, Mix1Tables, mix1_step
    from linrad_tpu.ops.mix2 import Mix2State, Mix2Tables, mix2_step
    from linrad_tpu.ops.windows import synthesis_weights

    rc = ref_ssb
    geo, _p = _our_geo(rc)
    n = geo.fft1_size
    n3 = geo.fft3_size
    m2 = geo.mix2_size
    newp = geo.fft1_new_points
    rng = np.random.default_rng(7)
    nsamp = newp * 400
    iq = np.round(4000 * (rng.standard_normal(nsamp)
                          + 1j * rng.standard_normal(nsamp)))
    f_true = 12000.0
    rc.tune(FS / 2 + f_true)
    ref = _ref_run_collect_baseb(rc, iq)
    ff_ref = rc.array("bg_filterfunc", n3).copy()

    # inject the reference's own filter: ref indexes the DC-centred fft3
    # spectrum as bg_filterfunc[n3/2 + i]; our filt is in shifted order
    rel = np.where(np.arange(m2) < m2 // 2, np.arange(m2),
                   np.arange(m2) - m2)
    filt = ff_ref[(n3 // 2 + rel) % n3].astype(np.float32)
    syn = synthesis_weights(m2, m2 - geo.mix2_new_points, geo.fft3_sinpow)
    tmix2 = Mix2Tables(filt=jnp.asarray(filt), carr_filt=jnp.asarray(filt),
                       syn=jnp.asarray(syn, np.float32), fir=None)

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    tm, sm = Mix1Tables.create(geo), Mix1State.create(geo)
    t3, s3 = FFT3Tables.create(geo), FFT3State.create(geo)
    s2 = Mix2State.create(geo)
    tune_bin = int(round(f_true * n / FS))
    spp = geo.fft1_frames_per_step * newp
    ours = []
    for s in range(len(iq) // spp):
        blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
        s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        sm, timf3 = mix1_step(geo, tm, sm, spec, tune_bin)
        s3, f3spec = fft3_step(geo, t3, s3, timf3)
        s2, baseb, _ = mix2_step(geo, tmix2, s2, f3spec)
        ours.append(np.asarray(baseb[:, 0]))
    ours = np.concatenate(ours)

    lag = _find_lag(ours, ref)
    # group-delay offset between the chains is a whole number of fft3
    # half-frames (our frame_stream zero-primes its first frame)
    assert lag % (geo.mix2_new_points // 2) == 0, lag
    maxrel, rmsrel = _fit_conj(ours, ref, lag=lag, skip=6000)
    assert maxrel < 1e-5, (maxrel, rmsrel, lag)


def _tone_snr_db(z: np.ndarray, fs: float, f_tone: float,
                 guard_bins: int = 6) -> float:
    """Tone power vs everything else in the complex stream's spectrum."""
    z = z - z.mean()
    w = np.hanning(len(z))
    spec = np.abs(np.fft.fft(z * w)) ** 2
    f = np.fft.fftfreq(len(z), 1.0 / fs)
    k = int(np.argmin(np.abs(f - f_tone)))
    lo, hi = k - guard_bins, k + guard_bins + 1
    idx = (np.arange(lo, hi)) % len(z)
    tone = spec[idx].sum()
    noise = spec.sum() - tone
    return 10.0 * math.log10(tone / max(noise, 1e-30))


def test_audio_snr_parity_vs_reference(ref_ssb, jnp):
    """The north star (BASELINE.json): audio-SNR parity on recorded IQ.

    A carrier 800 Hz above the tuned frequency plus white noise runs
    through both chains with their OWN default SSB filters (ours is not
    injected from the reference here); the demodulated-audio tone SNR
    must match within 1 dB.  SNR is measured on the complex baseband,
    which equals audio SNR (the BFO is a pure rotation)."""
    from linrad_tpu.params import Demod
    from linrad_tpu.pipeline.chain import RxState, RxTables, make_rx_step
    import dataclasses

    rc = ref_ssb
    geo, params = _our_geo(rc)
    params = dataclasses.replace(params, demod=Demod.NONE,
                                 filter_low_hz=-1200.0,
                                 filter_high_hz=1200.0)
    rng = np.random.default_rng(11)
    newp = geo.fft1_new_points
    nsamp = newp * 400
    t = np.arange(nsamp) / FS
    f_true, df = 12000.0, 800.0
    iq = np.round(
        600.0 * np.exp(2j * np.pi * (f_true + df) * t)
        + 400.0 * (rng.standard_normal(nsamp)
                   + 1j * rng.standard_normal(nsamp)))

    rc.tune(FS / 2 + f_true)
    ref = _ref_run_collect_baseb(rc, iq)
    fs_bb = rc.geof("baseband_sampling_speed")
    snr_ref = _tone_snr_db(ref[len(ref) // 4:], fs_bb, -df)

    step = make_rx_step(geo, params)
    tables = RxTables.create(geo, params)
    state = RxState.create(geo)
    tune_bin = int(round(f_true * geo.fft1_size / FS))
    spp = geo.samples_per_step
    ours = []
    import jax.numpy as jnp_
    for s in range(len(iq) // spp):
        blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
        state, out = step(tables, state, blk, jnp_.int32(tune_bin))
        ours.append(np.asarray(out.baseb[:, 0]))
    ours = np.concatenate(ours)
    snr_ours = _tone_snr_db(ours[len(ours) // 4:], fs_bb, df)

    assert abs(snr_ours - snr_ref) < 1.0, (snr_ours, snr_ref)
    # and the chain is actually receiving (tone well above the noise)
    assert snr_ref > 10.0


def test_mix1_fractional_tune_exact_vs_reference(ref_ssb, jnp):
    """Off-bin tuning: the per-sample phase ramp (set_mix1_phases
    mix1.c:781-860) places a dial frequency BETWEEN fft1 bins exactly at
    DC; timf3 stays sample-exact vs the reference (VERDICT r2 item 4 —
    the earlier tests dodged this by tuning to exact bins)."""
    from refharness import load
    from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
    from linrad_tpu.ops.mix1 import Mix1State, Mix1Tables, mix1_step

    rc = ref_ssb
    geo, _p = _our_geo(rc)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    rng = np.random.default_rng(43)
    nsamp = newp * 96
    iq = np.round(4000 * (rng.standard_normal(nsamp)
                          + 1j * rng.standard_normal(nsamp)))

    f_true = 12013.7                   # 0.29 bins off bin 256
    rc.tune(FS / 2 + f_true)
    rc.feed_iq(iq)
    rc.run_wideband()
    lib = load()
    while lib.ref_step_mix1() == 1:
        pass
    pa = rc.geo("timf3_pa")
    w = rc.array("timf3_float", pa).copy()
    ref = (w[0::2] + 1j * w[1::2]).astype(np.complex64)

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    tm, sm = Mix1Tables.create(geo), Mix1State.create(geo)
    # emulate the reference's float32 frequency arithmetic exactly
    # (fq * fftx_points_per_hz with points_per_hz = 1/(fs/N) in float32,
    # buf.c:604/811, set_mix1_phases mix1.c:798-800) so the fractional
    # parts are bit-identical
    pph = np.float32(1.0) / (np.float32(FS) / np.float32(n))
    t_bins = np.float32(np.float32(FS / 2 + f_true) * pph)         - np.float32(FS / 2) * pph
    tune_bin = int(np.float32(f_true * n / FS) + 0.5)
    frac = jnp.float32(float(t_bins) - round(float(t_bins)))
    spp = geo.fft1_frames_per_step * newp
    ours = []
    for s in range(len(iq) // spp):
        blk = iq[s * spp:(s + 1) * spp].astype(np.complex64)[:, None]
        s1, spec, _ = fft1_step(geo, t1, s1, blk, avg1num=4)
        sm, timf3 = mix1_step(geo, tm, sm, spec, tune_bin,
                              tune_frac=frac)
        ours.append(np.asarray(timf3[:, 0]))
    ours = np.concatenate(ours)

    m = min(len(ours), len(ref))
    maxrel, rmsrel = _fit_conj(ours[:m], ref[:m], lag=0,
                               skip=4 * geo.mix1_new_points)
    assert maxrel < 2e-4, (maxrel, rmsrel)
