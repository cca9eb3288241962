"""Host-side weak-signal control shared by Receiver and ShardedReceiver.

The ~Hz-rate control decisions (AFC tracking, spur list management,
SURVEY.md §7) operate on per-step outputs and steer the next step's
traced inputs."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..geometry import Geometry
from ..params import RxParams


class WeakSignalControl:
    def __init__(self, geo: Geometry, params: RxParams):
        self.geo = geo
        self.params = params
        self.step_seconds = geo.samples_per_step / geo.timf1_sampling_speed
        self.steps_done = 0
        self.afc = None
        self._afc_subbuf: list = []
        if params.afc_enable:
            from ..weak.afc import AFCConfig, AFCTracker
            self.afc = AFCTracker(
                geo, AFCConfig(fit_points=params.afc_fit_points,
                               max_drift_hz_per_s=max(
                                   params.afc_max_drift_hz / 10.0, 0.5)))
        self.spur_manager = None
        # the spur auto-search runs at ~Hz wall-clock rate like the
        # reference's spursearch (spur.c), NOT per N steps: step size is
        # a batching knob (step-size invariance), so a fixed step count
        # at large steps would delay acquisition by tens of seconds
        self.spur_scan_interval = max(
            1, int(round(1.4 / self.step_seconds)))
        if params.spur_enable:
            from ..weak.spur import SpurManager
            self.spur_manager = SpurManager(geo)

    def on_tune(self, freq_hz: float) -> None:
        if self.afc is not None:
            self.afc.status = 0
            self.afc.freq_hz = freq_hz % self.geo.timf1_sampling_speed
            self._afc_subbuf.clear()

    def update(self, out, tune_bin, state, tune_frac=None,
               tune_slope=None):
        """Returns (new_tune_bin, new_state) — or, when called with
        ``tune_frac``, (new_tune_bin, new_frac, new_slope, new_state).

        Once the AFC is tracking, tune_bin becomes a per-frame array
        (mix1_fq_mid); with ``afc_coherent`` (and a frac-capable
        caller) it instead becomes a constant base bin plus per-frame
        (frac, slope) ramps — AFCTracker.frame_tuning, the coherent
        form of do_mix1_afc (mix1.c:648)."""
        geo = self.geo
        with_frac = tune_frac is not None
        self.steps_done += 1
        if self.afc is not None:
            power = np.sum(np.asarray(
                out.fft2_power if geo.second_fft_enable
                else out.fft1_power), axis=-1)
            now = self.steps_done * self.step_seconds
            if self.afc.status in (0, 1):
                self._afc_subbuf.append(power)
                if len(self._afc_subbuf) >= 4:
                    self.afc.acquire(np.stack(self._afc_subbuf),
                                     self.afc.freq_hz, self.step_seconds)
                    self._afc_subbuf.clear()
            else:
                self.afc.update(power, now)
            if self.afc.status in (2, 3, 4):
                if with_frac and self.params.afc_coherent:
                    bins, frac, slope = self.afc.frame_tuning(
                        now + self.step_seconds, geo.fftx_frames_per_step)
                    tune_bin = jnp.asarray(bins)
                    tune_frac = jnp.asarray(frac)
                    tune_slope = jnp.asarray(slope)
                else:
                    bins = self.afc.frame_bins(now + self.step_seconds,
                                               geo.fftx_frames_per_step)
                    tune_bin = jnp.asarray(bins)
        if (self.spur_manager is not None and state.spur is not None
                and self.steps_done % self.spur_scan_interval == 0):
            avg = np.sum(np.asarray(
                out.fft2_power if geo.second_fft_enable
                else out.fft1_avg_power), axis=-1)
            c = int(np.reshape(np.asarray(tune_bin), (-1,))[0])
            new_spur = self.spur_manager.scan(avg, state.spur,
                                              protect_lo=c - 7,
                                              protect_hi=c + 7)
            state = dataclasses.replace(state, spur=new_spur)
        if with_frac:
            return tune_bin, tune_frac, tune_slope, state
        return tune_bin, state
