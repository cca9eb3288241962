"""The jitted signal chain: one pipeline step.

Linrad's 57-thread pipeline (input -> wideband_dsp -> timf2 -> second_fft
-> narrowband_dsp -> mix2 -> fft3 -> rx_output, reference
menu.c:700-721 / SURVEY.md §3.3-3.4) collapses into ONE pure function:

    state, outputs = rx_step(state, iq_block, tune_bin)

Thread hand-offs become function composition; circular buffers become the
carried ``RxState`` pytree; events/semaphores vanish (XLA's dataflow *is*
the synchronisation).  Everything inside is static-shaped, so the whole
chain compiles to a single fused XLA program per configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import Geometry
from ..params import Demod, RxParams
from ..utils.pytree import pytree_dataclass
from ..ops import agc as agc_ops
from ..ops import demod as demod_ops
from ..ops.fft1 import FFT1State, FFT1Tables, fft1_step
from ..ops.fft3 import FFT3State, FFT3Tables, fft3_step
from ..ops.mix1 import Mix1State, Mix1Tables, mix1_step
from ..ops.mix2 import Mix2State, Mix2Tables, mix2_step


@pytree_dataclass(frozen=True)
class RxTables:
    fft1: FFT1Tables
    mix1: Mix1Tables
    fft3: FFT3Tables
    mix2: Mix2Tables

    @classmethod
    def create(cls, geo: Geometry, p: RxParams) -> "RxTables":
        return cls(fft1=FFT1Tables.create(geo), mix1=Mix1Tables.create(geo),
                   fft3=FFT3Tables.create(geo),
                   mix2=Mix2Tables.create(geo, p))


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

    @classmethod
    def create(cls, geo: Geometry) -> "RxState":
        c = geo.channels
        return cls(
            fft1=FFT1State.create(geo),
            mix1=Mix1State.create(geo),
            fft3=FFT3State.create(geo),
            mix2=Mix2State.create(geo),
            bfo=demod_ops.BFOState.create(),
            am=demod_ops.AMState.create(c),
            fm=demod_ops.FMState.create(c),
            coh=demod_ops.CoherentState.create(c),
            agc=agc_ops.AGCState.create(c),
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


def make_rx_step(geo: Geometry, p: RxParams):
    """Build the pure step function for this configuration.

    Returns ``step(tables, state, block, tune_bin) -> (state, outputs)``
    with block (samples_per_step, C) complex64 and tune_bin a traced
    int32 fftx bin index (retuning does not recompile).
    """
    if geo.second_fft_enable:
        raise NotImplementedError(
            "second-FFT chain lands in the wideband milestone")
    fs_bb = geo.baseband_sampling_speed
    with_carrier = p.demod == Demod.COHERENT

    def step(tables: RxTables, state: RxState, block: jax.Array,
             tune_bin: jax.Array) -> tuple[RxState, RxOutputs]:
        s_fft1, fft1_spec, step_power = fft1_step(
            geo, tables.fft1, state.fft1, block, p.fft_avg1num)
        s_mix1, timf3 = mix1_step(geo, tables.mix1, state.mix1, fft1_spec,
                                  tune_bin)
        s_fft3, fft3_spec = fft3_step(geo, tables.fft3, state.fft3, timf3)
        s_mix2, baseb, carrier = mix2_step(geo, tables.mix2, state.mix2,
                                           fft3_spec,
                                           with_carrier=with_carrier)
        s_bfo, s_am, s_fm, s_coh = state.bfo, state.am, state.fm, state.coh
        if p.demod == Demod.SSB:
            s_bfo, audio = demod_ops.bfo_ssb(state.bfo, baseb, p.bfo_hz,
                                             fs_bb)
        elif p.demod == Demod.AM:
            s_am, audio = demod_ops.am_detect(state.am, baseb, fs_bb)
        elif p.demod == Demod.FM:
            s_fm, audio = demod_ops.fm_detect(state.fm, baseb, fs_bb)
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
        new_state = RxState(fft1=s_fft1, mix1=s_mix1, fft3=s_fft3,
                            mix2=s_mix2, bfo=s_bfo, am=s_am, fm=s_fm,
                            coh=s_coh, agc=s_agc)
        outputs = RxOutputs(audio=audio, baseb=baseb,
                            fft1_power=step_power,
                            fft1_avg_power=s_fft1.sumsq_avg,
                            agc_gain=gain)
        return new_state, outputs

    return step
