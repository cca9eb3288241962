"""Time-block sharded pipeline step.

The wideband hot path (fft1 -> sellim split -> back-FFT -> blankers ->
fft2 -> mix1), which carries >95% of the FLOPs, is sharded along the
time axis: device d processes the d-th contiguous slice of each step's
samples.  Three kinds of cross-shard dependency exist, all nearest-
neighbour and all carried over ICI with ``lax.ppermute``:

1. **Framing halos**: overlapped analysis frames need the previous
   shard's tail samples (the fft1/fft2/fft3 interleave, the analog of
   Linrad's circular-buffer history, buf.c:303-327).
2. **Overlap-add carries**: inverse-transform reconstruction pushes
   partial sums into the next shard (timf2/timf3/baseband OLA).
3. **Global reductions**: power-spectrum averages and blanker noise
   floors are ``lax.pmean`` across shards (SURVEY.md §7).

The decimated narrowband finale (fft3/mix2/demod/AGC, ~1/decimation of
the samples) is computed replicated after an ``all_gather`` of the tiny
timf3 stream — its sequential AGC recurrence then needs no cross-shard
prefix fixup.  Linrad's equivalent is the single narrowband thread fed
by all fft1 workers (wcw.c:1240).

Step-level carried state stays replicated (it is a few KB); each step
updates it from the last shard's values via a masked ``psum``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import Geometry
from ..params import Demod, RxParams
from ..ops import agc as agc_ops
from ..ops import blanker as blanker_ops
from ..ops import demod as demod_ops
from ..ops import sellim as sellim_ops
from ..ops.fft2 import FFT2State
from ..ops.fft3 import fft3_step
from ..ops.framing import frame_stream, overlap_add
from ..ops.mix1 import Mix1State, mix1_step
from ..ops.mix2 import mix2_step
from ..ops.fft1 import FFT1State
from ..ops.timf2 import Timf2State
from ..pipeline.chain import RxOutputs, RxState, RxTables

AXIS = "t"


def _from_left(x: jax.Array, axis_name: str = AXIS) -> jax.Array:
    """Value of ``x`` on the left neighbour (shard d-1); zeros on d=0."""
    d = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(d - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _from_right(x: jax.Array, axis_name: str = AXIS) -> jax.Array:
    """Value of ``x`` on the right neighbour (shard d+1); zeros on the
    last shard."""
    d = jax.lax.axis_size(axis_name)
    perm = [(i + 1, i) for i in range(d - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _pick_last(x: jax.Array, axis_name: str = AXIS) -> jax.Array:
    """Broadcast the last shard's ``x`` to every shard (replicated)."""
    d = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.psum(jnp.where(idx == d - 1, x, jnp.zeros_like(x)),
                        axis_name)


def _shard_tail(state_tail: jax.Array, local_block: jax.Array
                ) -> tuple[jax.Array, jax.Array]:
    """Per-shard framing tail: left neighbour's chunk end, or the carried
    state tail on shard 0.  Returns (tail_for_me, new_state_tail)."""
    ov = state_tail.shape[0]
    my_end = local_block[-ov:] if ov else local_block[:0]
    from_left = _from_left(my_end)
    idx = jax.lax.axis_index(AXIS)
    tail = jnp.where(idx == 0, state_tail, from_left)
    new_state_tail = _pick_last(my_end)
    return tail, new_state_tail


def _shard_ola(frames: jax.Array, hop: int, state_carry: jax.Array
               ) -> tuple[jax.Array, jax.Array]:
    """Sharded overlap-add: local OLA, then push the trailing partial
    sums into the right neighbour's head (carry chain)."""
    ov = state_carry.shape[0]
    zero = jnp.zeros_like(state_carry)
    out, carry = overlap_add(frames, hop, zero)
    incoming = _from_left(carry)
    idx = jax.lax.axis_index(AXIS)
    head_add = jnp.where(idx == 0, state_carry, incoming)
    out = out.at[:ov].add(head_add)
    new_state_carry = _pick_last(carry)
    return out, new_state_carry


def make_sharded_rx_step(geo: Geometry, p: RxParams, mesh: Mesh,
                         blanker_pulsewidth: int = 2,
                         per_frame_tune: bool = False):
    """Build the sharded step.  Requires every per-shard chunk to hold an
    integer number of frames at every stage — derive the geometry with
    ``RxParams(shards=<mesh size>)``.

    With ``per_frame_tune`` the tune argument is a (fftx_frames_per_step,)
    array sharded along frames (the AFC mix1_fq_mid path); the mixer
    phase offset of each shard is the wrapped sum of all earlier shards'
    increments (exclusive prefix over the gathered per-shard sums)."""
    d = mesh.shape[AXIS]
    assert geo.fft1_frames_per_step % d == 0, (
        f"fft1 frames {geo.fft1_frames_per_step} not divisible by mesh "
        f"size {d}; set RxParams(shards={d})")
    if geo.second_fft_enable:
        assert geo.fft2_frames_per_step % d == 0
    assert geo.fft3_frames_per_step % d == 0
    fs_bb = geo.baseband_sampling_speed
    with_carrier = p.demod == Demod.COHERENT
    step_seconds = geo.samples_per_step / geo.timf1_sampling_speed

    def shard_body(tables: RxTables, state: RxState, block: jax.Array,
                   tune_bin: jax.Array):
        # ---- fft1 (sharded frames) ----
        tail, new_tail = _shard_tail(state.fft1.tail, block)
        frames, _ = frame_stream(tail, block, geo.fft1_size,
                                 geo.fft1_new_points)
        windowed = frames * tables.fft1.window[None, :, None]
        from ..ops import fft as fftlib
        spec = fftlib.fft(windowed, axis=1)
        spec = spec * tables.fft1.filtercorr[None, :, :]
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        step_power = jax.lax.pmean(jnp.mean(power, axis=0), AXIS)
        alpha = min(1.0, geo.fft1_frames_per_step / max(p.fft_avg1num, 1))
        sumsq = state.fft1.sumsq_avg * (1 - alpha) + step_power * alpha
        s_fft1 = FFT1State(tail=new_tail, sumsq_avg=sumsq)

        s_sellim = state.sellim
        s_timf2 = state.timf2
        s_fft2 = state.fft2
        s_blank = state.blanker
        fft2_power = liminfo_out = nf_out = None
        n_fit = n_clear = None

        if geo.second_fft_enable:
            ratio = geo.fft2_size // geo.fft1_size
            if per_frame_tune:
                # global first frame's bin (shard 0's first element)
                tune0 = jax.lax.psum(
                    jnp.where(jax.lax.axis_index(AXIS) == 0,
                              jnp.reshape(tune_bin, (-1,))[0], 0),
                    AXIS)
            else:
                tune0 = tune_bin
            sel_c = tune0 // ratio
            bw_bins = max(1, int(0.7 * (p.filter_high_hz - p.filter_low_hz)
                                 / geo.fft1_bandwidth)) + 3
            s_sellim = sellim_ops.update_liminfo(
                geo, state.sellim, jnp.sum(sumsq, axis=-1),
                p.sellim_maxlevel, ston=p.sellim_ston,
                sel_lo=sel_c - bw_bins,
                sel_hi=sel_c + bw_bins)
            wgain, sgain = sellim_ops.liminfo_gains(s_sellim.liminfo)
            # back transform local frames; OLA with carry chain
            gains = jnp.stack([wgain, sgain])
            masked = spec[None] * gains[:, None, :, None]
            back = fftlib.ifft(masked, axis=2)
            bframes = back * tables.timf2_syn[None, None, :, None]
            weak, wc = _shard_ola(bframes[0], geo.fft1_new_points,
                                  state.timf2.weak_carry)
            strong, sc = _shard_ola(bframes[1], geo.fft1_new_points,
                                    state.timf2.strong_carry)
            s_timf2 = Timf2State(weak_carry=wc, strong_carry=sc)
            wpwr = jnp.sum(jnp.real(weak) ** 2 + jnp.imag(weak) ** 2,
                           axis=-1)
            nf = state.blanker.noise_floor
            n_fit = jnp.int32(0)
            n_clear = jnp.int32(0)
            if p.blanker_enable:
                # clever blanker with cross-shard halos: each shard sees
                # one fit-window of neighbour samples so boundary pulses
                # are fitted whole; candidate *centres* stay shard-owned
                # (eligible mask), and the corrections a fit writes into
                # neighbour territory are shipped back over ICI and
                # applied (subtractions are linear, so they compose)
                halo = tables.blanker.refbank.shape[1]
                ext_w = jnp.concatenate(
                    [_from_left(weak[-halo:]), weak,
                     _from_right(weak[:halo])])
                ext_p = jnp.concatenate(
                    [_from_left(wpwr[-halo:]), wpwr,
                     _from_right(wpwr[:halo])])
                n_local = weak.shape[0]
                elig = jnp.pad(jnp.ones(n_local, bool), (halo, halo))
                ext_w0_l = ext_w[:halo]
                ext_w0_r = ext_w[-halo:]
                ext_w, ext_p, n_fit = blanker_ops.clever_blanker(
                    ext_w, ext_p, tables.blanker, nf, p.clever_bln_limit,
                    blanker_pulsewidth,
                    max(1, p.max_pulses_per_block // d),
                    block_size=p.blanker_block_size,
                    rounds=p.blanker_rounds, eligible=elig)
                weak = ext_w[halo: halo + n_local]
                # ship halo corrections to their owners and re-derive
                # the power over the touched edges
                dl = ext_w[:halo] - ext_w0_l          # belongs left
                dr = ext_w[-halo:] - ext_w0_r         # belongs right
                add_r = _from_right(dl)               # my tail samples
                add_l = _from_left(dr)                # my head samples
                weak = weak.at[-halo:].add(add_r)
                weak = weak.at[:halo].add(add_l)
                wpwr = jnp.sum(jnp.real(weak) ** 2 + jnp.imag(weak) ** 2,
                               axis=-1)
                # stupid blanker on the halo-extended stream: its
                # widening reach is ≤ pulsewidth+1 < halo, so runs that
                # cross a shard edge widen exactly as on one device
                # (read-only halos, own region sliced back out)
                sw = jnp.concatenate(
                    [_from_left(weak[-halo:]), weak,
                     _from_right(weak[:halo])])
                sp = jnp.concatenate(
                    [_from_left(wpwr[-halo:]), wpwr,
                     _from_right(wpwr[:halo])])
                sw2, sp2, _ = blanker_ops.stupid_blanker(
                    sw, sp, nf, p.stupid_bln_limit, blanker_pulsewidth)
                pre = wpwr
                weak = sw2[halo: halo + n_local]
                wpwr = sp2[halo: halo + n_local]
                n_clear = jnp.sum(((wpwr == 0.0) & (pre > 0.0))
                                  .astype(jnp.int32))
                n_fit = jax.lax.psum(n_fit, AXIS)
                n_clear = jax.lax.psum(n_clear, AXIS)
            mean = jax.lax.pmean(blanker_ops.despiked_mean(wpwr), AXIS)
            a_nf = jnp.float32(min(1.0, step_seconds))
            s_blank = blanker_ops.BlankerState(
                noise_floor=jnp.maximum(
                    nf * (1 - a_nf) + mean * a_nf, 1e-20))
            nf_out = s_blank.noise_floor
            # fft2 framing over the sharded timf2 stream
            timf2 = weak + strong
            tail2, new_tail2 = _shard_tail(state.fft2.tail, timf2)
            f2, _ = frame_stream(tail2, timf2, geo.fft2_size,
                                 geo.fft2_new_points)
            fftx_spec = fftlib.fft(
                f2 * tables.fft2.window[None, :, None], axis=1)
            pwr2 = jnp.real(fftx_spec) ** 2 + jnp.imag(fftx_spec) ** 2
            fft2_power = jax.lax.pmean(jnp.mean(pwr2, axis=0), AXIS)
            a2 = min(1.0, geo.fft2_frames_per_step / max(p.fft_avg1num, 1))
            s_fft2 = FFT2State(
                tail=new_tail2,
                sumsq_avg=state.fft2.sumsq_avg * (1 - a2) + fft2_power * a2)
            liminfo_out = s_sellim.liminfo
            n_fftx_local = geo.fft2_frames_per_step // d
        else:
            fftx_spec = spec
            n_fftx_local = geo.fft1_frames_per_step // d

        # ---- spur cancellation (replicated over gathered spectra: the
        # per-frame model recurrence chains across shard boundaries, and
        # the spectra are small after decim-relevant sizes; ~1 MB on ICI)
        s_spur = state.spur
        if p.spur_enable:
            from ..weak.spur import spur_subtract_step
            full_spec = jax.lax.all_gather(fftx_spec, AXIS, axis=0,
                                           tiled=True)
            s_spur, full_clean = spur_subtract_step(
                geo, tables.spur_template, state.spur, full_spec)
            fftx_spec = jax.lax.dynamic_slice_in_dim(
                full_clean, jax.lax.axis_index(AXIS) * n_fftx_local,
                n_fftx_local, 0)

        # ---- mix1 (sharded frames, shard-offset phase) ----
        idx = jax.lax.axis_index(AXIS)
        big_n = geo.fftx_size
        mask = jnp.uint32(big_n - 1)
        hop32 = jnp.uint32(geo.fftx_new_points)
        if per_frame_tune:
            # tune_bin: (n_local,) — exclusive prefix of per-shard
            # increment sums gives each shard's phase offset
            local_incr_sum = jnp.sum(
                (tune_bin.astype(jnp.uint32) * hop32) & mask)
            sums = jax.lax.all_gather(local_incr_sum, AXIS)   # (D,)
            before = jnp.sum(jnp.where(
                jnp.arange(sums.shape[0]) < idx, sums, jnp.uint32(0)))
            shard_phase = (state.mix1.phase_idx.astype(jnp.uint32)
                           + before) & mask
        else:
            incr = (tune_bin.astype(jnp.uint32) * hop32) & mask
            shard_phase = (state.mix1.phase_idx.astype(jnp.uint32)
                           + incr * (idx.astype(jnp.uint32)
                                     * jnp.uint32(n_fftx_local))) & mask
        local_mix1_state = Mix1State(
            phase_idx=shard_phase.astype(jnp.int32),
            ola_carry=jnp.zeros_like(state.mix1.ola_carry))
        m1, timf3_local = mix1_step(geo, tables.mix1, local_mix1_state,
                                    fftx_spec, tune_bin)
        # OLA carry chain for timf3
        ov3 = geo.mix1_interleave_points
        incoming = _from_left(m1.ola_carry)
        head = jnp.where(idx == 0, state.mix1.ola_carry, incoming)
        timf3_local = timf3_local.at[:ov3].add(head)
        new_mix1_state = Mix1State(
            phase_idx=_pick_last(m1.phase_idx),
            ola_carry=_pick_last(m1.ola_carry))

        # ---- narrowband finale: gather the decimated stream, compute
        # replicated (it is 1/decimation of the data) ----
        timf3 = jax.lax.all_gather(timf3_local, AXIS, axis=0,
                                   tiled=True)
        s_fft3, fft3_spec = fft3_step(geo, tables.fft3, state.fft3, timf3)
        s_mix2, baseb, carrier = mix2_step(geo, tables.mix2, state.mix2,
                                           fft3_spec,
                                           with_carrier=with_carrier)
        s_pol = state.pol
        if p.pol_adapt_enable and geo.channels == 2:
            from ..weak.pol import update_polarization
            s_pol, combined, w = update_polarization(state.pol, baseb)
            baseb = combined[:, None]
            if carrier is not None:
                carrier = (carrier @ jnp.conj(w))[:, None]
        s_bfo, s_am, s_fm, s_coh = (state.bfo, state.am, state.fm,
                                    state.coh)
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
            s_coh, audio_i, _q = demod_ops.coherent_detect(
                state.coh, baseb, carrier, fs_bb)
            s_bfo, audio = demod_ops.bfo_ssb(
                state.bfo, audio_i.astype(jnp.complex64), p.bfo_hz, fs_bb)
        else:
            audio = jnp.real(baseb)
        if p.agc_enable:
            s_agc, audio, gain = agc_ops.agc(
                state.agc, audio, fs_bb, p.agc_attack_ms, p.agc_release_ms,
                p.agc_hang_ms)
        else:
            s_agc = state.agc
            gain = jnp.ones_like(audio)
        from ..ops.squelch import expander, squelch_step
        if p.expander_exponent > 1.0:
            audio = expander(audio, p.expander_exponent)
        s_squelch = state.squelch
        if p.squelch_enable:
            s_squelch, audio, _open = squelch_step(
                geo, state.squelch, fft3_spec, tables.mix2.filt,
                p.squelch_ratio, p.squelch_tc_ms, audio)

        new_state = RxState(fft1=s_fft1, mix1=new_mix1_state,
                            fft3=s_fft3, mix2=s_mix2, bfo=s_bfo, am=s_am,
                            fm=s_fm, coh=s_coh, agc=s_agc,
                            sellim=s_sellim, timf2=s_timf2, fft2=s_fft2,
                            blanker=s_blank, spur=s_spur,
                            squelch=s_squelch, pol=s_pol)
        outputs = RxOutputs(audio=audio, baseb=baseb,
                            fft1_power=step_power, fft1_avg_power=sumsq,
                            agc_gain=gain, fft2_power=fft2_power,
                            liminfo=liminfo_out, blanker_fitted=n_fit,
                            blanker_cleared=n_clear, noise_floor=nf_out)
        return new_state, outputs

    # everything except the input block is replicated; the block is
    # sharded along time
    state_spec = jax.tree_util.tree_map(
        lambda _: P(), RxState.create(geo, spur=p.spur_enable, pol=p.pol_adapt_enable))
    tables_spec = jax.tree_util.tree_map(lambda _: P(),
                                         RxTables.create(geo, p))
    out_spec = jax.tree_util.tree_map(
        lambda _: P(), (RxState.create(geo, spur=p.spur_enable, pol=p.pol_adapt_enable),
                        _outputs_struct(geo, p)))

    tune_spec = P(AXIS) if per_frame_tune else P()
    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(tables_spec, state_spec, P(AXIS, None), tune_spec),
        out_specs=out_spec, check_vma=False)
    return sharded


def _outputs_struct(geo: Geometry, p: RxParams):
    """Zero-filled RxOutputs with the right tree structure for specs."""
    wide = geo.second_fft_enable
    z = jnp.zeros(())
    return RxOutputs(
        audio=z, baseb=z, fft1_power=z, fft1_avg_power=z, agc_gain=z,
        fft2_power=z if wide else None,
        liminfo=z if wide else None,
        blanker_fitted=z if wide else None,
        blanker_cleared=z if wide else None,
        noise_floor=z if wide else None)


class ShardedReceiver:
    """Receiver running one pipeline over a device mesh.

    The host feeds full step blocks; jax shards them along time.  This is
    the single-pipeline scale-out mode (Linrad master+slaves on one
    signal, z_NETWORK.txt); for throughput over independent recordings
    use one Receiver per device instead."""

    def __init__(self, params: RxParams, devices=None):
        from ..geometry import derive_geometry
        if devices is None:
            devices = jax.devices()
        self.mesh = Mesh(np.array(devices), (AXIS,))
        d = len(devices)
        if params.shards != d:
            params = RxParams(**{**params.__dict__, "shards": d})
        self.params = params
        self.geo = derive_geometry(params)
        self.tables = RxTables.create(self.geo, params)
        self.state = RxState.create(self.geo, spur=params.spur_enable, pol=params.pol_adapt_enable)
        pw = 2
        if self.geo.second_fft_enable:
            from ..ops.blanker import BlankerTables
            _, pw = BlankerTables.create(self.geo)
        self._step = jax.jit(
            make_sharded_rx_step(self.geo, params, self.mesh, pw))
        # AFC path: separate compilation with a per-frame-sharded tune
        self._step_afc = jax.jit(
            make_sharded_rx_step(self.geo, params, self.mesh, pw,
                                 per_frame_tune=True))
        self._tune_bin = jnp.zeros((), jnp.int32)
        self._block_sharding = NamedSharding(self.mesh, P(AXIS, None))
        self._tune_sharding = NamedSharding(self.mesh, P(AXIS))
        from ..pipeline.control import WeakSignalControl
        self.control = WeakSignalControl(self.geo, params)

    def tune(self, freq_hz: float) -> None:
        n = self.geo.fftx_size
        fs = self.geo.timf1_sampling_speed
        self._tune_bin = jnp.asarray(
            int(round(freq_hz / fs * n)) % n, jnp.int32)
        self.control.on_tune(freq_hz)

    def process_block(self, block) -> RxOutputs:
        block = jnp.asarray(block, jnp.complex64)
        if block.ndim == 1:
            block = block[:, None]
        block = jax.device_put(block, self._block_sharding)
        if self._tune_bin.ndim:  # per-frame AFC tuning
            tune = jax.device_put(self._tune_bin, self._tune_sharding)
            self.state, out = self._step_afc(self.tables, self.state,
                                             block, tune)
        else:
            self.state, out = self._step(self.tables, self.state, block,
                                         self._tune_bin)
        self._tune_bin, self.state = self.control.update(
            out, self._tune_bin, self.state)
        return out

    def run(self, iq: np.ndarray):
        if iq.ndim == 1:
            iq = iq[:, None]
        s = self.geo.samples_per_step
        for i in range(iq.shape[0] // s):
            yield self.process_block(iq[i * s:(i + 1) * s])


class ShardedBatchRunner:
    """Throughput mode over the mesh: K sharded steps per dispatch.

    The lax.scan of pipeline/batch.py wrapped around the shard_map step —
    the device mesh processes K * samples_per_step samples per dispatch
    with the cross-shard halos/carries riding ICI inside the scan and no
    host round-trips in between.  State chains through the scan exactly
    as across streamed ShardedReceiver steps (tested)."""

    def __init__(self, params: RxParams, k_steps: int = 16,
                 outputs: tuple = ("audio", "baseb"), devices=None):
        from ..geometry import derive_geometry
        if devices is None:
            devices = jax.devices()
        self.mesh = Mesh(np.array(devices), (AXIS,))
        d = len(devices)
        if params.shards != d:
            params = RxParams(**{**params.__dict__, "shards": d})
        self.params = params
        self.geo = derive_geometry(params)
        self.k = k_steps
        self.outputs = tuple(outputs)
        self.tables = RxTables.create(self.geo, params)
        self.state = RxState.create(self.geo, spur=params.spur_enable, pol=params.pol_adapt_enable)
        pw = 2
        if self.geo.second_fft_enable:
            from ..ops.blanker import BlankerTables
            _, pw = BlankerTables.create(self.geo)
        step = make_sharded_rx_step(self.geo, params, self.mesh, pw)
        fields = self.outputs

        def run_k(tables, state, blocks, tune_bin):
            def body(s, blk):
                s, out = step(tables, s, blk, tune_bin)
                return s, tuple(getattr(out, f) for f in fields)

            return jax.lax.scan(body, state, blocks)

        self._run_k = jax.jit(run_k, donate_argnums=(1,))
        self._tune_bin = jnp.zeros((), jnp.int32)
        self._blocks_sharding = NamedSharding(self.mesh, P(None, AXIS,
                                                           None))

    def tune(self, freq_hz: float) -> None:
        n = self.geo.fftx_size
        fs = self.geo.timf1_sampling_speed
        self._tune_bin = jnp.asarray(
            int(round(freq_hz / fs * n)) % n, jnp.int32)

    @property
    def samples_per_call(self) -> int:
        return self.k * self.geo.samples_per_step

    def process(self, iq: np.ndarray) -> dict[str, np.ndarray]:
        """Process a recording; returns concatenated output streams.
        Trailing samples short of a full K-step call are dropped."""
        if iq.ndim == 1:
            iq = iq[:, None]
        s = self.geo.samples_per_step
        per = self.samples_per_call
        collected: dict[str, list] = {f: [] for f in self.outputs}
        for i in range(iq.shape[0] // per):
            seg = jnp.asarray(iq[i * per:(i + 1) * per], jnp.complex64)
            blocks = jax.device_put(
                seg.reshape(self.k, s, self.geo.channels),
                self._blocks_sharding)
            self.state, outs = self._run_k(self.tables, self.state,
                                           blocks, self._tune_bin)
            for f, v in zip(self.outputs, outs):
                a = np.asarray(v)               # (K, S_f, C)
                collected[f].append(a.reshape(-1, a.shape[-1]))
        return {f: (np.concatenate(v) if v else np.zeros((0, 1)))
                for f, v in collected.items()}
