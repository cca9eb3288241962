"""Coherent-CW audio surface golden crosscheck (VERDICT r3 missing #5).

The reference's coherent output modes — ``bg_coherent`` in fft3_mix2's
output stage (mix2.c:1774-1920: 0 = plain BFO, 1 = signal ear +
amplitude-weighted carrier ear, 2 = carrier-locked I/Q demodulation
using the tracked carrier phase) — driven headless through the full
chain to the D/A ring (make_audio_signal rxout.c:970), against our
``Demod.COHERENT`` ``coherent_mode`` 0/1/2 (pipeline/chain.py
narrowband_post_mix1 + ops/demod.py).  The implementations differ
internally (the reference's carrier comes from its bg carrier filter,
ours from the fft3 carrier branch), so the pins are behavioral:
keying-envelope fidelity on the carrier ear, audible pitch, and
speaker SNR parity — the same style as the AM/FM/AGC golden tests.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from refharness import available, MODE_WCW, RefChain  # noqa: E402

if not available():                                # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)

jnp = pytest.importorskip("jax.numpy")

FS = 96000.0


def _keyed(nsamp: int, f_rf: float, seed: int = 5):
    """75 %-duty keyed carrier + light noise (the coherent-mode test
    signal of TestCoherentModesWithAFC)."""
    t = np.arange(nsamp) / FS
    key = (np.mod(t, 0.4) < 0.3).astype(np.float64)
    # soften edges ~5 ms so the keying doesn't splatter
    k = int(0.005 * FS)
    kern = np.hanning(2 * k + 1)
    key = np.convolve(key, kern / kern.sum(), mode="same")
    rng = np.random.default_rng(seed)
    sig = (600.0 * key * np.exp(2j * np.pi * f_rf * t)
           + 20.0 * (rng.standard_normal(nsamp)
                     + 1j * rng.standard_normal(nsamp)))
    return np.round(sig), key


def _keydown_up_ratio_db(a: np.ndarray, fs: float) -> float:
    """Power ratio between the loud half and the quiet fifth of the
    samples — alignment-free keying-envelope fidelity (the chain
    delays audio by several frames)."""
    e = np.sort(np.asarray(a, np.float64) ** 2)
    p_up = e[: len(e) // 5].mean()
    p_dn = e[len(e) // 2:].mean()
    return 10 * math.log10(p_dn / max(p_up, 1e-30))


def _tone_snr_db(x, fs, half_hz: float = 250.0):
    """Tone-to-rest ratio with a Hz-defined signal band so chains at
    different audio rates measure the same thing; the band covers the
    keying splatter (5 ms edges -> ~200 Hz) so filter-width config
    differences between the chains don't masquerade as demod gaps."""
    x = np.asarray(x, np.float64)
    x = x - x.mean()
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    fr = np.fft.rfftfreq(len(x), 1 / fs)
    k = int(np.argmax(spec))
    m = np.abs(fr - fr[k]) < half_hz
    tone = spec[m].sum()
    return (10 * math.log10(tone / max(spec.sum() - tone, 1e-30)),
            float(fr[k]))


def _ref_audio(bg_coherent: int, iq: np.ndarray, f_true: float):
    rc = RefChain(mode=MODE_WCW, ad_speed=int(FS), second_fft=0,
                  sinpow=2)
    # the active mode + channel layout are derived in
    # init_baseband_sizes (baseb_graph.c:3086-3152); set the request
    # and retune so the derivation runs
    rc.set_bg("new_coherent", bg_coherent)
    newp = rc.geo("fft1_new_points")
    rc.tune(FS / 2 + f_true)
    assert rc.lib.ref_geo(b"fft1_size")  # chain alive after rebuild
    ch = newp * 20
    chunks = []
    for k in range(len(iq) // ch):
        rc.feed_iq(iq[k * ch:(k + 1) * ch])
        rc.run_wideband()
        rc.run_narrowband()
        rc.run_output()
        chunks.append(rc.consume_daout())
    return np.concatenate(chunks).astype(np.float64), rc


def _our_audio(coherent_mode: int, iq: np.ndarray, f_true: float):
    import dataclasses

    from linrad_tpu.params import Demod
    from linrad_tpu.pipeline import Receiver
    from test_ref_parity import _our_geo

    rc = RefChain(ad_speed=int(FS), second_fft=0, sinpow=2)
    geo0, params = _our_geo(rc)
    # match the reference's derived default audio bandwidth
    # (baseb_graph.c:3385: 1.9 * timf3_rate / fft3_size)
    bw = 1.9 * geo0.timf3_sampling_speed / geo0.fft3_size
    params = dataclasses.replace(
        params, demod=Demod.COHERENT, coherent_mode=coherent_mode,
        bfo_hz=600.0, agc_enable=False,
        filter_low_hz=-bw / 2, filter_high_hz=bw / 2)
    rx = Receiver(params)
    rx.tune(f_true)
    outs = [np.asarray(o.audio) for o in
            rx.run(iq[:, None].astype(np.complex64))]
    return np.concatenate(outs), rx.geo


class TestCoherentAudioGoldenParity:
    F_TRUE = 12000.0

    def test_mode1_signal_and_carrier_ears(self):
        """bg_coherent=1: left ear the signal, right ear the
        amplitude-weighted carrier (mix2.c:1846-1876).  Both chains'
        carrier ears must follow the 75 % keying deeply; keying
        fidelity within 6 dB of each other."""
        rc0 = RefChain(mode=MODE_WCW, ad_speed=int(FS), second_fft=0,
                       sinpow=2)
        newp = rc0.geo("fft1_new_points")
        iq, _key = _keyed(newp * 300, self.F_TRUE)
        ref, _rc = _ref_audio(1, iq, self.F_TRUE)
        assert ref.shape[1] == 2 and len(ref) > 4096
        half = len(ref) // 2
        r_ratio = _keydown_up_ratio_db(ref[half:, 1], 48_000.0)

        ours, geo = _our_audio(1, iq, self.F_TRUE)
        assert ours.shape[1] == 2
        o_ratio = _keydown_up_ratio_db(
            ours[len(ours) // 2:, 1], geo.baseband_sampling_speed)
        assert r_ratio > 10.0, r_ratio
        assert o_ratio > 10.0, o_ratio
        # ours must not trail the reference's keying fidelity
        assert o_ratio > r_ratio - 3.0, (o_ratio, r_ratio)
        # the signal ear carries an audible pitch in both chains
        s_ref, f_ref = _tone_snr_db(ref[half:, 0], 48_000.0)
        s_our, f_our = _tone_snr_db(ours[len(ours) // 2:, 0],
                                    geo.baseband_sampling_speed)
        assert 100.0 < f_ref < 3000.0
        assert 100.0 < f_our < 3000.0
        # speaker SNR parity (AM/FM golden-test convention)
        assert s_our > s_ref - 3.0, (s_our, s_ref)

    def test_mode2_carrier_locked_iq(self):
        """bg_coherent=2: the tracked carrier phase demodulates I/Q
        (mix2.c:1888-1920) — AM to one ear.  On a keyed carrier the I
        ear reproduces the keying in both chains."""
        rc0 = RefChain(mode=MODE_WCW, ad_speed=int(FS), second_fft=0,
                       sinpow=2)
        newp = rc0.geo("fft1_new_points")
        iq, _key = _keyed(newp * 300, self.F_TRUE)
        ref, _rc = _ref_audio(2, iq, self.F_TRUE)
        assert ref.shape[1] == 2 and len(ref) > 4096
        half = len(ref) // 2
        r_ratio = _keydown_up_ratio_db(ref[half:, 0], 48_000.0)

        ours, geo = _our_audio(2, iq, self.F_TRUE)
        o_ratio = _keydown_up_ratio_db(
            ours[len(ours) // 2:, 0], geo.baseband_sampling_speed)
        assert r_ratio > 8.0, r_ratio
        assert o_ratio > 8.0, o_ratio
        # ours must not trail the reference's keying fidelity
        assert o_ratio > r_ratio - 3.0, (o_ratio, r_ratio)
