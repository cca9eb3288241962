"""Intra-frame frequency-slope mixing (the phrot_step capability,
do_mix1 mix1.c:103-106): tracking a drifting carrier with per-frame
fracs alone leaves a sawtooth FM of one hop's drift; linearising the
frequency within each frame removes it."""

import math

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from linrad_tpu.geometry import derive_geometry
from linrad_tpu.ops.fft1 import FFT1State, FFT1Tables, fft1_step
from linrad_tpu.ops.mix1 import Mix1State, Mix1Tables, mix1_step
from linrad_tpu.params import RxParams

FS = 96_000.0


def _mix_drifting(use_slope: bool):
    p = RxParams(fft1_n_override=10, target_fft1_frames_per_step=64,
                 agc_enable=False)
    geo = derive_geometry(p)
    n = geo.fft1_size
    newp = geo.fft1_new_points
    nframes = geo.fft1_frames_per_step
    nsamp = geo.samples_per_step

    f0, rate = 12000.0, 4000.0          # Hz, Hz/s
    t = np.arange(nsamp) / FS
    phase = 2 * np.pi * np.cumsum(f0 + rate * t) / FS
    iq = np.exp(1j * phase).astype(np.complex64)

    # per-frame schedule at frame midpoints, in big-FFT bins.  Drift is
    # tracked against a CONSTANT base bin: the whole deviation rides the
    # fractional ramp, so overlapping frames are mixed coherently (no
    # inter-frame integer-bin steps inside the overlap-add)
    mids_hz = f0 + rate * ((np.arange(nframes + 1) + 0.5) * newp) / FS
    tbins = mids_hz * n / FS
    c0 = int(round(tbins[nframes // 2]))
    bins = np.full(nframes, c0, np.int32)
    frac = (tbins[:nframes] - c0).astype(np.float32)
    slope = np.diff(tbins).astype(np.float32)

    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    tm, sm = Mix1Tables.create(geo), Mix1State.create(geo)
    s1, spec, _ = fft1_step(geo, t1, s1, jnp.asarray(iq[:, None]),
                            avg1num=4)
    kw = dict(tune_frac=jnp.asarray(frac))
    if use_slope:
        kw["tune_slope"] = jnp.asarray(slope)
    sm, timf3 = mix1_step(geo, tm, sm, spec, jnp.asarray(bins), **kw)
    out = np.asarray(timf3[:, 0])
    fs_t3 = FS / (n // geo.mix1_size)
    return out[len(out) // 8:], fs_t3


def _narrow_snr_db(z, fs):
    spec = np.abs(np.fft.fft(z * np.hanning(len(z)))) ** 2
    pk = int(np.argmax(spec))
    idx = np.arange(pk - 3, pk + 4) % len(z)
    tone = spec[idx].sum()
    return (10 * math.log10(tone / max(spec.sum() - tone, 1e-30)),
            np.fft.fftfreq(len(z), 1 / fs)[pk])


def test_slope_removes_sawtooth_fm():
    stepped, fs_t3 = _mix_drifting(use_slope=False)
    sloped, _ = _mix_drifting(use_slope=True)
    snr_step, res_step = _narrow_snr_db(stepped, fs_t3)
    snr_slope, res_slope = _narrow_snr_db(sloped, fs_t3)
    # both keep the carrier near DC
    assert abs(res_step) < 60
    assert abs(res_slope) < 60
    # the slope path concentrates the carrier into a clean line
    assert snr_slope > snr_step + 10, (snr_slope, snr_step)
    assert snr_slope > 10


def test_zero_slope_matches_plain_frac():
    p = RxParams(fft1_n_override=10, target_fft1_frames_per_step=16,
                 agc_enable=False)
    geo = derive_geometry(p)
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(geo.samples_per_step)
          + 1j * rng.standard_normal(geo.samples_per_step)
          ).astype(np.complex64)
    t1, s1 = FFT1Tables.create(geo), FFT1State.create(geo)
    s1, spec, _ = fft1_step(geo, t1, s1, jnp.asarray(iq[:, None]),
                            avg1num=4)
    tm = Mix1Tables.create(geo)
    frac = jnp.float32(0.3)
    _, a = mix1_step(geo, tm, Mix1State.create(geo), spec,
                     jnp.int32(128), tune_frac=frac)
    _, b = mix1_step(geo, tm, Mix1State.create(geo), spec,
                     jnp.int32(128), tune_frac=frac,
                     tune_slope=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_afc_frame_tuning_consistency():
    """AFCTracker.frame_tuning returns a constant base bin with the
    deviation on frac and slopes matching the prediction's drift."""
    from linrad_tpu.weak.afc import AFCConfig, AFCTracker

    p = RxParams(first_fft_bandwidth=30.0, mix1_bandwidth_reduction_n=4,
                 agc_enable=False, afc_enable=True)
    geo = derive_geometry(p)
    tr = AFCTracker(geo, AFCConfig())
    tr.status = 3
    tr._t0 = 0.0
    tr._coef = [10_000.0, 2.0]          # 2 Hz/s drift
    tr.freq_hz = 10_000.0
    n = geo.fftx_frames_per_step
    bins, frac, slope = tr.frame_tuning(1.0, n)
    assert len(bins) == len(frac) == len(slope) == n
    assert np.all(bins == bins[0])      # constant base: coherent OLA
    bw = geo.timf1_sampling_speed / geo.fftx_size
    hop_s = geo.fftx_new_points / geo.timf1_sampling_speed
    # reconstructed frequency == prediction at each frame midpoint
    f_rec = (bins[0] + frac) * bw
    t = 1.0 + tr.config.delay * hop_s + hop_s * (np.arange(n) + 0.5)
    f_exp = np.array([tr.predict(ti) for ti in t])
    np.testing.assert_allclose(f_rec, f_exp, atol=bw * 1e-3)
    # slopes equal the drift per hop
    np.testing.assert_allclose(slope * bw, 2.0 * hop_s, rtol=1e-3)

    # and the chain tail accepts the tuple end-to-end
    from linrad_tpu.pipeline.chain import (NBState, RxTables,
                                           narrowband_tail)
    tables = RxTables.create(geo, p)
    nb = NBState.create(geo)
    rng = np.random.default_rng(1)
    spec = jnp.asarray(
        (rng.standard_normal((n, geo.fftx_size, 1))
         + 1j * rng.standard_normal((n, geo.fftx_size, 1))
         ).astype(np.complex64))
    nb2, audio, baseb, gain = narrowband_tail(
        geo, p, tables, nb, spec, jnp.asarray(bins),
        tune_frac=jnp.asarray(frac), tune_slope=jnp.asarray(slope))
    assert np.all(np.isfinite(np.asarray(baseb)))
