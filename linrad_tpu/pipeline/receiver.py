"""Host-side receiver orchestrator.

The ``normal_rx_routine`` analog (reference menu.c:576-959): owns the
configuration, builds geometry/tables/state, jits the step function, and
streams blocks from a file/generator through the device.  Where Linrad
spins up ~15 threads and a supervisor loop, this object is a thin
feeder: per-sample work lives in the jitted step; the host only slices
input blocks and collects outputs (the AFC/Morse-style ~Hz control
decisions also live host-side, per SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import Geometry, derive_geometry
from ..params import RxParams
from .chain import RxOutputs, RxState, RxTables, make_rx_step


class Transport:
    """File-replay transport: pause/resume/seek honored between steps
    (the diskread_pause_flag + seek handling of the reference's file
    input, menu.c:888-896).  Thread-safe — drive it from another thread
    while the run() generator is being consumed."""

    def __init__(self):
        import threading
        self._running = threading.Event()
        self._running.set()
        self._seek_seconds: float | None = None
        self._lock = threading.Lock()

    def pause(self) -> None:
        self._running.clear()

    def resume(self) -> None:
        self._running.set()

    @property
    def paused(self) -> bool:
        return not self._running.is_set()

    def seek(self, seconds: float) -> None:
        """Jump the replay position (forward or back)."""
        with self._lock:
            self._seek_seconds = max(0.0, float(seconds))

    def _next_index(self, i: int, step_seconds: float) -> int:
        self._running.wait()
        with self._lock:
            if self._seek_seconds is not None:
                i = int(self._seek_seconds / step_seconds)
                self._seek_seconds = None
        return i


class Receiver:
    def __init__(self, params: RxParams, calibration: dict | None = None,
                 audio_out_rate: float | None = None):
        """calibration: optional {'filtercorr': ..., 'iq_corr': ...} from
        linrad_tpu.calibration (the dsp_<mode>_corr file analog).
        audio_out_rate: resample audio to this rate (the rx_output D/A
        resampler, rxout.c:266); must give an integer output count per
        step (exact rational, ops/resample.py)."""
        self.params = params
        self.geo: Geometry = derive_geometry(params)
        self.tables = RxTables.create(self.geo, params, calibration)
        from ..params import Demod
        ac = None
        if params.demod == Demod.COHERENT and params.coherent_mode == 1:
            # signal ear + carrier ear (bg_coherent 1, mix2.c:1843)
            ac = 2 * (1 if params.pol_adapt_enable else self.geo.channels)
        self.state = RxState.create(
            self.geo, spur=params.spur_enable,
            pol=params.pol_adapt_enable,
            fir_len=(int(self.tables.mix2.fir.shape[0])
                     if self.tables.mix2.fir is not None else 0),
            audio_channels=ac)
        self.blanker_pulsewidth = 2
        if self.geo.second_fft_enable:
            from ..ops.blanker import BlankerTables
            _, self.blanker_pulsewidth = BlankerTables.create(self.geo)
        step = make_rx_step(self.geo, params,
                            blanker_pulsewidth=self.blanker_pulsewidth,
                            fractional_tune=True)
        self._step = jax.jit(step)
        self._tune_bin = jnp.zeros((), jnp.int32)
        self._tune_frac = jnp.zeros((), jnp.float32)
        self._tune_slope = None  # per-frame drift once the AFC locks
        self._step_seconds = (self.geo.samples_per_step
                              / self.geo.timf1_sampling_speed)
        # host-side weak-signal controllers (SURVEY.md §7: ~Hz control)
        from .control import WeakSignalControl
        self.control = WeakSignalControl(self.geo, params)
        # optional audio-rate conversion (rx_output resampler analog)
        self.audio_out_rate = audio_out_rate
        self._resampler = None
        self._resampler_state = None
        if audio_out_rate:
            from ..ops.resample import Resampler
            # 32-tap windowed sinc: interpolation + anti-image filtering
            # in one contraction (the reference needs a separate IIR
            # after its 4-point interpolator, rxout.c:1165-1210)
            self._resampler = Resampler(
                self.geo.baseband_sampling_speed, audio_out_rate,
                self.geo.baseband_samples_per_step, self.geo.channels,
                taps=32)
            self._resampler_state = self._resampler.init_state()
        # user-extension hooks — the users_*.c plugin surface
        # (SURVEY.md §2.13: users_init_mode menu.c:693, users_extra_fast
        # wcw.c:931-937, hware_command users.c:41):
        #   "init": fn(receiver)              after construction
        #   "extra_fast": fn(receiver, out)   every step, before control
        #   "block": fn(receiver, out)        every step, after control
        #   "tune": fn(receiver, freq_hz)     on retune
        self.hooks: dict[str, list] = {"init": [], "extra_fast": [],
                                       "block": [], "tune": []}

    def add_hook(self, event: str, fn) -> None:
        """Register a user hook (users_*.c extension API analog)."""
        self.hooks[event].append(fn)

    def _fire(self, event: str, *args) -> None:
        for fn in self.hooks.get(event, ()):
            fn(self, *args)

    # ---- tuning -------------------------------------------------------
    # RF-dial frequency control (the freq_control.c graph: hardware
    # frequency = passband centre + converter offset, with optional
    # spectrum inversion).  center_frequency_hz is the recording's RF
    # centre (fg.passband_center) — set explicitly or auto-filled from
    # a WAV's Perseus rcvr / SpectraVue auxi metadata in run_file().
    center_frequency_hz: float = 0.0

    def tune_rf(self, rf_hz: float) -> None:
        """Tune to an absolute RF frequency (dial frequency), mapping
        through the converter offset and passband direction."""
        p = self.params
        base = rf_hz - p.converter_offset_hz - self.center_frequency_hz
        if p.passband_direction < 0:
            base = -base
        self.tune(base)

    @property
    def tuned_rf_hz(self) -> float:
        base = self.tuned_hz
        if self.params.passband_direction < 0:
            base = -base
        return (base + self.center_frequency_hz
                + self.params.converter_offset_hz)

    def tune(self, freq_hz: float) -> None:
        """Select the mix1 centre frequency — continuous: the nearest
        fftx bin plus a traced fractional-bin phase ramp place the dial
        frequency exactly at DC (set_mix1_phases mix1.c:781-860)."""
        n = self.geo.fftx_size
        fs = self.geo.timf1_sampling_speed
        t1 = freq_hz / fs * n
        bin_idx = int(round(t1))
        self._tune_frac = jnp.asarray(t1 - bin_idx, jnp.float32)
        self._tune_bin = jnp.asarray(bin_idx % n, jnp.int32)
        self._tune_slope = None
        self.control.on_tune(freq_hz)
        self._fire("tune", freq_hz)

    @property
    def tuned_hz(self) -> float:
        n = self.geo.fftx_size
        b = int(self._tune_bin)
        if b >= n // 2:
            b -= n
        return ((b + float(self._tune_frac))
                * self.geo.timf1_sampling_speed / n)

    # ---- streaming ----------------------------------------------------
    def process_block(self, block) -> RxOutputs:
        """Process one step of input: (samples_per_step, C) complex IQ,
        or (2*samples_per_step, C) float32 in real-input mode
        (timf1_sampling_speed is half the A/D rate, buf.c:47-51)."""
        if self.geo.iq_input:
            from ..utils.xfer import device_complex
            block = device_complex(block)
            expect = self.geo.samples_per_step
        else:
            block = jnp.asarray(block, jnp.float32)
            expect = 2 * self.geo.samples_per_step
        if block.ndim == 1:
            block = block[:, None]
        assert block.shape == (expect, self.geo.channels), block.shape
        self.state, out = self._step(self.tables, self.state, block,
                                     self._tune_bin, self._tune_frac,
                                     self._tune_slope)
        if self._resampler is not None:
            self._resampler_state, resampled = self._resampler(
                self._resampler_state, out.audio)
            import dataclasses as _dc
            out = _dc.replace(out, audio=resampled)
        self._fire("extra_fast", out)
        (self._tune_bin, self._tune_frac, self._tune_slope,
         self.state) = self.control.update(
            out, self._tune_bin, self.state, tune_frac=self._tune_frac,
            tune_slope=self._tune_slope)
        self._fire("block", out)
        return out

    # back-compat accessors for the control sub-objects
    @property
    def afc(self):
        return self.control.afc

    @property
    def spur_manager(self):
        return self.control.spur_manager

    @property
    def _steps_done(self) -> int:
        return self.control.steps_done

    @_steps_done.setter
    def _steps_done(self, v: int) -> None:
        self.control.steps_done = v

    def run(self, iq: np.ndarray, progress: bool = False,
            transport: "Transport | None" = None, pace: bool = False,
            watchdog=None, monitor=None):
        """Stream an arbitrary-length recording; yields RxOutputs per
        step (drops the final partial block, like the reference's file
        input thread stops at EOF, modesub.c:1022).

        transport: optional pause/resume/seek control between steps
        (diskread_pause_flag analog).  pace: replay at the recording's
        real-time rate, like the reference's file input thread paces to
        the A/D speed (§3.5).

        watchdog/monitor: optional runtime.watchdog.Watchdog (gets a
        "receiver" heartbeat per step, the thread_status_flag analog)
        and RealTimeMonitor (advanced by each step's raw input sample
        count, so construct it with rate_hz = the input A/D rate
        geo.rx_ad_speed in both IQ and real-input modes — the
        z_TIMING.txt margin surface)."""
        import time as _time
        if iq.ndim == 1:
            iq = iq[:, None]
        s = (self.geo.samples_per_step if self.geo.iq_input
             else 2 * self.geo.samples_per_step)
        n_steps = iq.shape[0] // s
        t0 = _time.monotonic()
        done = 0
        i = 0
        while i < n_steps:
            if transport is not None:
                i = transport._next_index(i, self._step_seconds)
                if i >= n_steps:
                    break
            if pace:
                due = t0 + done * self._step_seconds
                delay = due - _time.monotonic()
                if delay > 0:
                    _time.sleep(delay)
            out = self.process_block(iq[i * s:(i + 1) * s])
            if watchdog is not None:
                watchdog.beat("receiver")
            if monitor is not None:
                monitor.advance(s)  # raw input samples (A/D rate)
            yield out
            i += 1
            done += 1

    def run_file(self, path: str):
        """Stream a .wav recording through the native file prefetcher
        (runtime ring buffer + background reader — the
        THREAD_RX_FILE_INPUT analog, SURVEY.md §3.5): disk I/O overlaps
        device compute.  Yields RxOutputs per step."""
        from ..io.wav import AuxiChunk, RcvrChunk, read_wav
        from .. import runtime

        # parse the header once to learn the layout, then stream the
        # payload through the prefetcher
        import struct as _s
        with open(path, "rb") as f:
            riff = f.read(12)
            if riff[:4] != b"RIFF":
                raise ValueError(f"{path}: not a WAV")
            fmt = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    raise ValueError(f"{path}: missing data chunk")
                cid, csize = _s.unpack("<4sI", hdr)
                if cid == b"fmt ":
                    fmt = f.read(csize)
                elif cid == b"rcvr":
                    # RF centre from the capture metadata -> dial tuning
                    self.center_frequency_hz = float(
                        RcvrChunk.unpack(f.read(csize)).center_frequency_hz)
                elif cid == b"auxi":
                    self.center_frequency_hz = float(
                        AuxiChunk.unpack(f.read(csize)).center_freq)
                elif cid == b"data":
                    data_off = f.tell()
                    break
                else:
                    f.seek(csize + (csize & 1), 1)
        (wformat, nch, rate, _br, _al, bits) = _s.unpack("<HHIIHH",
                                                         fmt[:16])
        if bits != 16 or nch != 2 * self.geo.channels:
            # uncommon layouts fall back to the simple reader
            iq, _info = read_wav(path)
            if _info.rcvr is not None:
                self.center_frequency_hz = float(
                    _info.rcvr.center_frequency_hz)
            elif _info.auxi is not None:
                self.center_frequency_hz = float(_info.auxi.center_freq)
            yield from self.run(iq)
            return
        frame_bytes = 2 * nch
        s = self.geo.samples_per_step
        pf = runtime.FilePrefetcher(path, block_bytes=s * frame_bytes,
                                    offset=data_off)
        while True:
            raw = pf.read_block()
            if len(raw) < s * frame_bytes:
                break
            x = np.frombuffer(raw, "<i2").astype(np.float32).reshape(
                s, nch)
            iq = (x[:, 0::2] + 1j * x[:, 1::2]).astype(np.complex64)
            yield self.process_block(iq)

    def process(self, iq: np.ndarray) -> dict[str, np.ndarray]:
        """Convenience: process a whole recording, concatenate outputs."""
        from ..utils.xfer import fetch
        audio, baseb, gains = [], [], []
        power = None
        for out in self.run(iq):
            audio.append(np.asarray(out.audio))
            baseb.append(fetch(out.baseb))
            gains.append(np.asarray(out.agc_gain))
            power = np.asarray(out.fft1_avg_power)
        return {
            "audio": np.concatenate(audio) if audio else np.zeros((0, 1)),
            "baseb": np.concatenate(baseb) if baseb else np.zeros((0, 1)),
            "agc_gain": np.concatenate(gains) if gains else np.zeros((0, 1)),
            "fft1_avg_power": power,
        }


class MultiReceiver:
    """K independently tuned sub-receivers over ONE wideband front end
    (the reference's MIX1_NO_OF_CHANNELS=24 mix1 slots / network userx
    consumers, globdef.h:315, 1282-1294).  The narrowband tail is a
    vmapped batch axis, so K sub-channels cost one fat kernel set, not
    K dispatches."""

    def __init__(self, params: RxParams, n_subch: int,
                 calibration: dict | None = None):
        from .chain import NBState, make_multi_rx_step

        self.params = params
        self.n_subch = n_subch
        self.geo: Geometry = derive_geometry(params)
        self.tables = RxTables.create(self.geo, params, calibration)
        fir_len = (int(self.tables.mix2.fir.shape[0])
                   if self.tables.mix2.fir is not None else 0)
        self.state = RxState.create(self.geo, spur=params.spur_enable,
                                    fir_len=fir_len)
        self.nbs = NBState.create_stacked(
            self.geo, n_subch, pol=params.pol_adapt_enable,
            fir_len=fir_len)
        pw = 2
        if self.geo.second_fft_enable:
            from ..ops.blanker import BlankerTables
            _, pw = BlankerTables.create(self.geo)
        self._step = jax.jit(make_multi_rx_step(self.geo, params,
                                                blanker_pulsewidth=pw))
        self._tune_bins = np.zeros(n_subch, np.int64)

    def tune_subch(self, k: int, freq_hz: float) -> None:
        """Tune sub-receiver k (quantised to an fftx bin); traced, so
        retuning any sub-channel never recompiles."""
        n = self.geo.fftx_size
        fs = self.geo.timf1_sampling_speed
        self._tune_bins[k] = int(round(freq_hz / fs * n)) % n

    def process_block(self, block) -> RxOutputs:
        """One step; outputs.audio/baseb/agc_gain have shape (K, S, C)."""
        from ..utils.xfer import device_complex
        block = (device_complex(block) if self.geo.iq_input
                 else jnp.asarray(block, jnp.float32))
        if block.ndim == 1:
            block = block[:, None]
        (self.state, self.nbs), out = self._step(
            self.tables, self.state, self.nbs, block,
            jnp.asarray(self._tune_bins, jnp.int32))
        return out

    def run(self, iq: np.ndarray):
        """Stream a recording; yields RxOutputs per step."""
        if iq.ndim == 1:
            iq = iq[:, None]
        s = self.geo.samples_per_step
        if not self.geo.iq_input:
            s *= 2
        for i in range(iq.shape[0] // s):
            yield self.process_block(iq[i * s:(i + 1) * s])
