"""The jitted signal chain: one pipeline step.

Linrad's 57-thread pipeline (input -> wideband_dsp -> timf2 -> second_fft
-> narrowband_dsp -> mix2 -> fft3 -> rx_output, reference
menu.c:700-721 / SURVEY.md §3.3-3.4) collapses into ONE pure function:

    state, outputs = rx_step(state, iq_block, tune_bin)

Thread hand-offs become function composition; circular buffers become the
carried ``RxState`` pytree; events/semaphores vanish (XLA's dataflow *is*
the synchronisation).  Everything inside is static-shaped, so the whole
chain compiles to a single fused XLA program per configuration.

With the second FFT enabled the wideband branch runs between fft1 and
mix1: sellim classification -> weak/strong back transform -> noise
blankers -> fft2, and the narrowband chain consumes fft2 transforms
(the fft1/fft2 store boundary of fft1def.h:242-330).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import Geometry
from ..params import Demod, RxParams
from ..utils.pytree import pytree_dataclass
from ..ops import agc as agc_ops
from ..ops import demod as demod_ops
from ..ops import blanker as blanker_ops
from ..ops import sellim as sellim_ops
from ..ops.blanker import BlankerState, BlankerTables
from ..ops.fft1 import FFT1State, FFT1Tables, fft1_step
from ..ops.fft2 import FFT2State, FFT2Tables, fft2_step
from ..ops.fft3 import FFT3State, FFT3Tables, fft3_step
from ..ops.mix1 import Mix1State, Mix1Tables, mix1_step
from ..ops.mix2 import (Mix2FirState, Mix2State, Mix2Tables,
                        mix2_carrier_step, mix2_fir_step, mix2_step)
from ..ops.sellim import SellimState
from ..ops.squelch import SquelchState, expander, squelch_step
from ..ops.timf2 import Timf2State, make_timf2_syn, timf2_step
from ..weak.pol import PolState, update_polarization
from ..weak.spur import SpurState, spur_subtract_step, window_template


@pytree_dataclass(frozen=True)
class RxTables:
    fft1: FFT1Tables
    mix1: Mix1Tables
    fft3: FFT3Tables
    mix2: Mix2Tables
    fft2: FFT2Tables | None
    timf2_syn: jax.Array | None
    blanker: BlankerTables | None
    spur_template: jax.Array | None

    @classmethod
    def create(cls, geo: Geometry, p: RxParams,
               calibration: dict | None = None) -> "RxTables":
        calibration = calibration or {}
        fft2 = timf2_syn = blanker = spur_tpl = None
        if geo.second_fft_enable:
            fft2 = FFT2Tables.create(geo)
            timf2_syn = make_timf2_syn(geo)
            blanker, _pw = BlankerTables.create(geo)
        if p.spur_enable:
            sinpow = (geo.fft2_sinpow if geo.second_fft_enable
                      else geo.fft1_sinpow)
            spur_tpl = jnp.asarray(
                window_template(geo.fftx_size, sinpow))
        return cls(fft1=FFT1Tables.create(
                       geo, filtercorr=calibration.get("filtercorr"),
                       iq_corr=calibration.get("iq_corr")),
                   mix1=Mix1Tables.create(geo),
                   fft3=FFT3Tables.create(geo),
                   mix2=Mix2Tables.create(geo, p),
                   fft2=fft2, timf2_syn=timf2_syn, blanker=blanker,
                   spur_template=spur_tpl)


@pytree_dataclass
class RxState:
    fft1: FFT1State
    mix1: Mix1State
    fft3: FFT3State
    mix2: Mix2State
    bfo: demod_ops.BFOState
    am: demod_ops.AMState
    fm: demod_ops.FMState
    coh: demod_ops.CoherentState
    agc: agc_ops.AGCState
    sellim: SellimState | None
    timf2: Timf2State | None
    fft2: FFT2State | None
    blanker: BlankerState | None
    spur: SpurState | None = None
    squelch: SquelchState | None = None
    pol: PolState | None = None
    mix2_fir: Mix2FirState | None = None  # mixer_mode-2 timf3 history

    @classmethod
    def create(cls, geo: Geometry, spur: bool = False,
               pol: bool = False, fir_len: int = 0) -> "RxState":
        # adaptive polarization combines the 2 channels into 1 before
        # the detectors, so the demod/AGC state is single-channel then
        c = 1 if pol else geo.channels
        wide = geo.second_fft_enable
        return cls(
            spur=SpurState.create(geo) if spur else None,
            squelch=SquelchState.create(),
            pol=PolState.create() if pol else None,
            fft1=FFT1State.create(geo),
            mix1=Mix1State.create(geo),
            fft3=FFT3State.create(geo),
            mix2=Mix2State.create(geo),
            bfo=demod_ops.BFOState.create(),
            am=demod_ops.AMState.create(c),
            fm=demod_ops.FMState.create(c),
            coh=demod_ops.CoherentState.create(c),
            agc=agc_ops.AGCState.create(c),
            sellim=SellimState.create(geo) if wide else None,
            timf2=Timf2State.create(geo) if wide else None,
            fft2=FFT2State.create(geo) if wide else None,
            blanker=BlankerState.create(geo) if wide else None,
            mix2_fir=(Mix2FirState.create(geo, fir_len) if fir_len
                      else None),
        )


@pytree_dataclass
class RxOutputs:
    """Per-step observable outputs — the stage-tap taxonomy of the
    reference's network layer (RAW/FFT1/TIMF2/FFT2/BASEB,
    globdef.h:237-253) as pipeline outputs."""

    audio: jax.Array          # (S_audio, C) float32 demodulated audio
    baseb: jax.Array          # (S_bb, C) complex64 filtered baseband
    fft1_power: jax.Array     # (fft1_size, C) float32 step power spectrum
    fft1_avg_power: jax.Array  # slow average (fft1_sumsq analog)
    agc_gain: jax.Array       # (S_bb, C) float32
    fft2_power: jax.Array | None      # (fft2_size, C) float32
    liminfo: jax.Array | None         # (fft1_size,) float32
    blanker_fitted: jax.Array | None  # () int32 pulses subtracted
    blanker_cleared: jax.Array | None  # () int32 points hard-cleared
    noise_floor: jax.Array | None     # () float32


def make_rx_step(geo: Geometry, p: RxParams, blanker_pulsewidth: int = 2):
    """Build the pure step function for this configuration.

    Returns ``step(tables, state, block, tune_bin) -> (state, outputs)``
    with block (samples_per_step, C) complex64 and tune_bin a traced
    int32 fftx bin index (retuning does not recompile).
    """
    fs_bb = geo.baseband_sampling_speed
    with_carrier = p.demod == Demod.COHERENT
    step_seconds = geo.samples_per_step / geo.timf1_sampling_speed

    def step(tables: RxTables, state: RxState, block: jax.Array,
             tune_bin: jax.Array) -> tuple[RxState, RxOutputs]:
        s_fft1, fft1_spec, step_power = fft1_step(
            geo, tables.fft1, state.fft1, block, p.fft_avg1num,
            variant=p.fft1_variant)

        s_sellim = state.sellim
        s_timf2 = state.timf2
        s_fft2 = state.fft2
        s_blank = state.blanker
        fft2_power = liminfo_out = n_fit = n_clear = nf_out = None

        # tune_bin may be scalar (fixed tuning) or (n_fftx,) per-frame
        # (the AFC path, do_mix1_afc mix1.c:648)
        tune0 = jnp.reshape(tune_bin, (-1,))[0]

        if geo.second_fft_enable:
            # protected passband in fft1-bin coordinates
            # (selfreq_liminfo, sellim.c:38-116)
            ratio = geo.fft2_size // geo.fft1_size
            sel_c = tune0 // ratio
            bw_bins = max(
                1, int(0.7 * (p.filter_high_hz - p.filter_low_hz)
                       / geo.fft1_bandwidth)) + 3
            sel_lo = sel_c - bw_bins
            sel_hi = sel_c + bw_bins
            avg_p = jnp.sum(s_fft1.sumsq_avg, axis=-1)
            s_sellim = sellim_ops.update_liminfo(
                geo, state.sellim, avg_p, p.sellim_maxlevel,
                ston=p.sellim_ston, sel_lo=sel_lo, sel_hi=sel_hi)
            wgain, sgain = sellim_ops.liminfo_gains(s_sellim.liminfo)
            s_timf2, weak, strong, wpwr = timf2_step(
                geo, tables.timf2_syn, state.timf2, fft1_spec, wgain,
                sgain)
            nf = state.blanker.noise_floor
            n_fit = jnp.int32(0)
            n_clear = jnp.int32(0)
            if p.blanker_enable:
                weak, wpwr, n_fit = blanker_ops.clever_blanker(
                    weak, wpwr, tables.blanker, nf, p.clever_bln_limit,
                    blanker_pulsewidth, p.max_pulses_per_block,
                    block_size=p.blanker_block_size,
                    rounds=p.blanker_rounds)
                weak, wpwr, n_clear = blanker_ops.stupid_blanker(
                    weak, wpwr, nf, p.stupid_bln_limit,
                    blanker_pulsewidth)
            s_blank = blanker_ops.update_noise_floor(
                state.blanker, wpwr, step_seconds)
            s_fft2, fftx_spec, fft2_power = fft2_step(
                geo, tables.fft2, state.fft2, weak, strong, p.fft_avg1num)
            liminfo_out = s_sellim.liminfo
            nf_out = s_blank.noise_floor
        else:
            fftx_spec = fft1_spec

        s_spur = state.spur
        if p.spur_enable:
            s_spur, fftx_spec = spur_subtract_step(
                geo, tables.spur_template, state.spur, fftx_spec)

        s_mix1, timf3 = mix1_step(geo, tables.mix1, state.mix1, fftx_spec,
                                  tune_bin)
        s_fft3, fft3_spec = fft3_step(geo, tables.fft3, state.fft3, timf3)
        s_fir = state.mix2_fir
        if p.mixer_mode == 2:
            # time-domain FIR decimator (mix2.c:217-245); the carrier
            # branch still comes from fft3 (mix2.c:246 runs either way)
            s_fir, baseb = mix2_fir_step(geo, tables.mix2.fir,
                                         state.mix2_fir, timf3)
            s_mix2, carrier = state.mix2, None
            if with_carrier:
                s_mix2, carrier = mix2_carrier_step(
                    geo, tables.mix2, state.mix2, fft3_spec)
        else:
            s_mix2, baseb, carrier = mix2_step(geo, tables.mix2,
                                               state.mix2, fft3_spec,
                                               with_carrier=with_carrier)
        s_pol = state.pol
        if p.pol_adapt_enable and geo.channels == 2:
            # adaptive polarization: project the 2-channel baseband onto
            # the dominant coherency eigenvector (pol_graph.c channel
            # combination, applied in the mix2 path)
            s_pol, combined, w = update_polarization(state.pol, baseb)
            baseb = combined[:, None]
            if carrier is not None:
                carrier = (carrier @ jnp.conj(w))[:, None]
        s_bfo, s_am, s_fm, s_coh = state.bfo, state.am, state.fm, state.coh
        if p.demod == Demod.SSB:
            s_bfo, audio = demod_ops.bfo_ssb(state.bfo, baseb, p.bfo_hz,
                                             fs_bb)
        elif p.demod == Demod.AM:
            s_am, audio = demod_ops.am_detect(state.am, baseb, fs_bb)
        elif p.demod == Demod.FM:
            s_fm, audio = demod_ops.fm_detect(state.fm, baseb, fs_bb)
            if p.fm_deemphasis_us > 0:
                audio, de_last = demod_ops.fm_deemphasis(
                    audio, fs_bb, p.fm_deemphasis_us, s_fm.deemph)
                s_fm = demod_ops.FMState(last=s_fm.last, deemph=de_last)
        elif p.demod == Demod.COHERENT:
            s_coh, audio_i, _audio_q = demod_ops.coherent_detect(
                state.coh, baseb, carrier, fs_bb)
            s_bfo, audio = demod_ops.bfo_ssb(state.bfo,
                                             audio_i.astype(jnp.complex64),
                                             p.bfo_hz, fs_bb)
        else:  # Demod.NONE — raw complex baseband as "audio" I channel
            audio = jnp.real(baseb)
        if p.agc_enable:
            s_agc, audio, gain = agc_ops.agc(
                state.agc, audio, fs_bb, p.agc_attack_ms, p.agc_release_ms,
                p.agc_hang_ms)
        else:
            s_agc = state.agc
            gain = jnp.ones_like(audio)
        if p.expander_exponent > 1.0:
            audio = expander(audio, p.expander_exponent)
        s_squelch = state.squelch
        if p.squelch_enable:
            s_squelch, audio, _open = squelch_step(
                geo, state.squelch, fft3_spec, tables.mix2.filt,
                p.squelch_ratio, p.squelch_tc_ms, audio)
        new_state = RxState(fft1=s_fft1, mix1=s_mix1, fft3=s_fft3,
                            mix2=s_mix2, bfo=s_bfo, am=s_am, fm=s_fm,
                            coh=s_coh, agc=s_agc, sellim=s_sellim,
                            timf2=s_timf2, fft2=s_fft2, blanker=s_blank,
                            spur=s_spur, squelch=s_squelch, pol=s_pol,
                            mix2_fir=s_fir)
        outputs = RxOutputs(audio=audio, baseb=baseb,
                            fft1_power=step_power,
                            fft1_avg_power=s_fft1.sumsq_avg,
                            agc_gain=gain, fft2_power=fft2_power,
                            liminfo=liminfo_out, blanker_fitted=n_fit,
                            blanker_cleared=n_clear, noise_floor=nf_out)
        return new_state, outputs

    return step
