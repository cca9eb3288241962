"""Geometry derivation tests against the reference formulas
(buf.c:43-560, SURVEY.md Appendix A)."""

import math

import pytest

from linrad_tpu import InputMode, RxParams, derive_geometry, interleave_ratio


def test_interleave_ratio_formula():
    # ratio = 2*asin(0.5^(1/N))/pi (buf.c:131)
    for n in (1, 2, 3, 4):
        assert interleave_ratio(n) == pytest.approx(
            2 * math.asin(0.5 ** (1 / n)) / math.pi)
    assert interleave_ratio(0) == 0.0
    assert interleave_ratio(8) == 0.8     # buf.c:119-128
    assert interleave_ratio(9) == 0.625
    # sin^2 gives exactly 50% overlap
    assert interleave_ratio(2) == pytest.approx(0.5)


def test_fft1_size_from_bandwidth():
    p = RxParams(rx_ad_speed=96_000, first_fft_bandwidth=100.0,
                 first_fft_sinpow=2)
    g = derive_geometry(p)
    # bandwidth within (0.707, 1.414) of desired (buf.c:185-199)
    assert 0.7 * 100 < g.fft1_bandwidth < 1.5 * 100
    assert g.fft1_size == 1 << g.fft1_n
    assert g.fft1_n >= 7


def test_interleave_even_and_consistent():
    for sinpow in (0, 1, 2, 3, 4):
        g = derive_geometry(RxParams(first_fft_sinpow=sinpow))
        assert g.fft1_interleave_points % 2 == 0
        assert g.fft1_new_points + g.fft1_interleave_points == g.fft1_size
        # fft1 interleave is a multiple of mix1's scaled by the decimation
        # (buf.c:325-327)
        d = g.fft1_size // g.mix1_size
        assert g.fft1_interleave_points == g.mix1_interleave_points * d


def test_real_input_halves_rate():
    g_iq = derive_geometry(RxParams(input_mode=InputMode.IQ))
    g_re = derive_geometry(RxParams(input_mode=InputMode.REAL))
    assert g_iq.timf1_sampling_speed == 96_000
    assert g_re.timf1_sampling_speed == 48_000  # buf.c:47-51


def test_second_fft_resolution_growth():
    p = RxParams(second_fft_enable=True, second_fft_ninc=2,
                 first_fft_bandwidth=100.0)
    g = derive_geometry(p)
    assert g.fft2_n >= g.fft1_n
    # growth condition: fft2_bw * 2^ninc < 1.5 * fft1_bw (buf.c:355-371)
    assert g.fft2_bandwidth * (1 << p.second_fft_ninc) < 1.5 * g.fft1_bandwidth
    # fft2 interleave snapped to mix1 multiple (buf.c:451-453)
    d = g.fft2_size // g.mix1_size
    assert g.fft2_interleave_points == g.mix1_interleave_points * d


def test_per_step_frame_counts_are_exact():
    for second in (False, True):
        g = derive_geometry(RxParams(second_fft_enable=second))
        assert g.samples_per_step == g.fft1_frames_per_step * g.fft1_new_points
        if second:
            assert g.samples_per_step == (
                g.fft2_frames_per_step * g.fft2_new_points)
        # timf3 production matches fft3 consumption exactly
        timf3 = g.fftx_frames_per_step * g.mix1_new_points
        assert timf3 == g.fft3_frames_per_step * g.fft3_new_points
        # decimated hop identity: fftx_new = mix1_new * decimation
        assert g.fftx_new_points == g.mix1_new_points * g.decimation


def test_timf3_rate():
    g = derive_geometry(RxParams())
    assert g.timf3_sampling_speed == pytest.approx(
        g.timf1_sampling_speed * g.mix1_size / g.fftx_size)  # buf.c:478-482


def test_noise_floor_avgnum_one_second():
    g = derive_geometry(RxParams())
    # ~1 s time constant (buf.c:336-341)
    assert g.timf2_noise_floor_avgnum == pytest.approx(
        g.rx_ad_speed / g.fft1_new_points, rel=0.1)


def test_params_json_roundtrip():
    p = RxParams(second_fft_enable=True, blanker_enable=True)
    assert RxParams.from_json(p.to_json()) == p


def test_params_version_and_compat():
    """vernr.h semantics: version mismatch forces re-setup; files from
    older/newer builds load with unknown fields dropped and missing
    fields defaulted."""
    import json

    p = RxParams()
    d = json.loads(p.to_json())
    assert d["check"] == RxParams.PAR_VERNR
    d["check"] = RxParams.PAR_VERNR + 1
    with pytest.raises(ValueError, match="re-setup"):
        RxParams.from_json(json.dumps(d))
    d["check"] = RxParams.PAR_VERNR
    d["some_future_knob"] = 42          # newer build's field
    del d["blanker_rounds"]             # older build lacks a new field
    q = RxParams.from_json(json.dumps(d))
    assert q.blanker_rounds == RxParams().blanker_rounds


def test_geometry_fuzz_divisibility_and_chain():
    """Randomized parameter sweep: every derivable geometry must satisfy
    the integer-divisibility invariants, and the full chain must compile
    and run one step on it (the buf.c contract: get_wideband_sizes never
    produces fractional per-step work)."""
    import itertools
    import numpy as np
    import jax.numpy as jnp
    from linrad_tpu.params import Demod, InputMode, RxParams
    from linrad_tpu.geometry import derive_geometry

    rng = np.random.default_rng(123)
    combos = []
    for _ in range(24):
        combos.append(dict(
            rx_ad_speed=int(rng.choice([48_000, 96_000, 192_000])),
            first_fft_sinpow=int(rng.choice([1, 2, 3, 4, 8, 9])),
            fft1_n_override=int(rng.choice([8, 9, 10])),
            second_fft_enable=bool(rng.choice([False, True])),
            second_fft_ninc=int(rng.choice([0, 1, 2])),
            mix1_bandwidth_reduction_n=int(rng.choice([3, 4, 5])),
            fft3_n=int(rng.choice([7, 8, 9])),
            mix2_reduction_n=int(rng.choice([0, 1])),
            input_mode=InputMode.IQ if rng.random() < 0.8
            else InputMode.REAL,
            rx_rf_channels=int(rng.choice([1, 2])),
            target_fft1_frames_per_step=int(rng.choice([4, 8, 16])),
        ))
    ran_chain = 0
    for kw in combos:
        try:
            geo = derive_geometry(RxParams(agc_enable=False, **kw))
        except ValueError:
            continue   # explicitly rejected combinations are fine
        # divisibility invariants (buf.c:139 analog)
        assert geo.samples_per_step % geo.fft1_new_points == 0
        assert geo.fft1_frames_per_step \
            == geo.samples_per_step // geo.fft1_new_points
        if geo.second_fft_enable:
            assert geo.samples_per_step % geo.fft2_new_points == 0
        assert geo.baseband_samples_per_step > 0
        # one tiny chain step must trace + run
        if ran_chain < 6 and geo.samples_per_step <= 1 << 15 \
                and geo.iq_input:
            from linrad_tpu.pipeline.chain import (RxState, RxTables,
                                                   make_rx_step)
            from linrad_tpu.ops.blanker import BlankerTables
            p = RxParams(agc_enable=False, **kw)
            tables = RxTables.create(geo, p)
            state = RxState.create(geo)
            _, pw = BlankerTables.create(geo)
            step = make_rx_step(geo, p, blanker_pulsewidth=pw)
            blk = jnp.zeros((geo.samples_per_step, geo.channels),
                            jnp.complex64)
            _, out = step(tables, state, blk, jnp.int32(8))
            assert np.all(np.isfinite(np.asarray(out.audio)))
            ran_chain += 1
    assert ran_chain >= 3   # the sweep really exercised the chain
