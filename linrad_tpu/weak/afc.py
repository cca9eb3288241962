"""AFC — automatic frequency control for drifting weak carriers.

TPU-native re-design of the reference AFC (``make_afc`` afc_graph.c:362,
``collect_initial_spectrum`` afcsub.c:34, ``make_afc_signoi``
afcsub.c:693, ``afc_eval_line``).  The per-signal state machine keeps
the reference's status codes (afc_graph.c:374-378):

    0 = first call, everything unknown
    1 = frequency set but no signal detected
    2 = signal detected, frequency + linear drift stored
    3 = tracking ok
    4 = signal lost, holding constant frequency
    1000 = AFC disabled, fixed frequency

The search works on averaged fftx power spectra (computed on device);
the initial acquisition searches a (frequency x drift) grid by shift-
and-add over sub-averages — the drift-line search of
collect_initial_spectrum — then tracking fits a polynomial of frequency
vs time over ``fit_points`` past measurements (AG_PARMS fit_points /
avgnum / delay, globdef.h:884-899) and extrapolates per-frame mixer
frequencies, which drive mix1's per-frame centre bins (the
``mix1_fq_mid[]`` contract, do_mix1_afc mix1.c:648).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geometry import Geometry
from ..utils.llsq import parabolic_peak, polyfit_drift


@dataclass
class AFCConfig:
    fit_points: int = 10          # history points in the drift fit
    fit_degree: int = 2           # polynomial degree (freq vs time)
    search_hz: float = 200.0      # half-width of the acquisition search
    track_hz: float = 30.0        # half-width of the tracking window
    max_drift_hz_per_s: float = 5.0
    ston_acquire: float = 8.0     # linear S/N to declare a signal
    ston_lose: float = 2.0        # linear S/N below which it is lost
    lose_count: int = 5           # consecutive bad updates -> status 4


@dataclass
class AFCTracker:
    """Host-side per-signal tracker (one per mix1 channel)."""

    geo: Geometry
    config: AFCConfig = field(default_factory=AFCConfig)
    status: int = 0
    freq_hz: float = 0.0          # current best frequency estimate
    ston: float = 0.0
    _times: list = field(default_factory=list)
    _freqs: list = field(default_factory=list)
    _weights: list = field(default_factory=list)
    _bad: int = 0

    # -- helpers --------------------------------------------------------
    def _bin_hz(self) -> float:
        return self.geo.timf1_sampling_speed / self.geo.fftx_size

    def _measure(self, power: np.ndarray, center_hz: float,
                 half_hz: float) -> tuple[float, float]:
        """Peak frequency + linear S/N inside a window of the averaged
        spectrum (power indexed by fftx bin, wrap-around)."""
        n = self.geo.fftx_size
        bw = self._bin_hz()
        c = int(round(center_hz / bw))
        h = max(3, int(round(half_hz / bw)))
        idx = (c + np.arange(-h, h + 1)) % n
        win = power[idx]
        k = int(np.argmax(win))
        noise = np.median(win)
        if k == 0 or k == len(win) - 1:
            off = 0.0
            peak = win[k]
        else:
            off, peak = parabolic_peak(win[k - 1], win[k], win[k + 1])
        freq = (c - h + k + off) * bw
        ston = peak / max(noise, 1e-30)
        return freq, ston

    def acquire(self, sub_spectra: np.ndarray, center_hz: float,
                dt_sub: float) -> None:
        """Initial (frequency x drift) search over sub-averaged spectra.

        sub_spectra: (k, fftx_size) power, k consecutive sub-averages
        spaced dt_sub seconds (the drift-line shift-and-add of
        collect_initial_spectrum, afcsub.c:34)."""
        n = self.geo.fftx_size
        bw = self._bin_hz()
        k = sub_spectra.shape[0]
        c = int(round(center_hz / bw))
        h = max(3, int(round(self.config.search_hz / bw)))
        max_shift = max(1, int(round(self.config.max_drift_hz_per_s
                                     * dt_sub * (k - 1) / bw)))
        best = (-1.0, 0.0, 0.0)  # (score, freq, drift_hz_s)
        for shift_total in range(-max_shift, max_shift + 1):
            acc = np.zeros(2 * h + 1)
            for j in range(k):
                s = int(round(shift_total * j / max(k - 1, 1)))
                idx = (c + s + np.arange(-h, h + 1)) % n
                acc += sub_spectra[j][idx]
            kk = int(np.argmax(acc))
            noise = np.median(acc)
            score = acc[kk] / max(noise, 1e-30)
            if score > best[0]:
                if 0 < kk < 2 * h:
                    off, _ = parabolic_peak(acc[kk - 1], acc[kk],
                                            acc[kk + 1])
                else:
                    off = 0.0
                freq = (c - h + kk + off) * bw
                drift = shift_total * bw / max(dt_sub * (k - 1), 1e-9)
                best = (score, freq, drift)
        self.ston = best[0]
        if best[0] >= self.config.ston_acquire:
            self.freq_hz = best[1]
            self.status = 2
            self._times.clear()
            self._freqs.clear()
            self._weights.clear()
            self._bad = 0
        else:
            self.status = 1

    def update(self, power: np.ndarray, time_s: float) -> None:
        """One tracking update from the step-averaged spectrum."""
        cfg = self.config
        if self.status in (0, 1):
            return  # needs acquire()
        freq, ston = self._measure(power, self.freq_hz, cfg.track_hz)
        self.ston = ston
        good = ston >= cfg.ston_lose
        if good:
            self._bad = 0
            self._times.append(time_s)
            self._freqs.append(freq)
            self._weights.append(min(ston, 100.0))
            if len(self._times) > cfg.fit_points:
                self._times.pop(0)
                self._freqs.pop(0)
                self._weights.pop(0)
            if len(self._times) >= 3:
                self.status = 3
            # polynomial fit, evaluated at the latest time
            deg = min(cfg.fit_degree, len(self._times) - 1)
            t0 = self._times[-1]
            coef = polyfit_drift(np.array(self._times) - t0,
                                 np.array(self._freqs), deg,
                                 np.array(self._weights))
            self.freq_hz = float(coef[0])
            self._coef = coef
            self._t0 = t0
        else:
            self._bad += 1
            if self._bad >= cfg.lose_count and self.status == 3:
                self.status = 4  # hold last good frequency

    def predict(self, time_s: float) -> float:
        """Extrapolated frequency at an absolute time (afc_eval_line)."""
        if self.status in (3,) and hasattr(self, "_coef"):
            dt = np.clip(time_s - self._t0, 0.0, 5.0)
            return float(sum(c * dt ** k
                             for k, c in enumerate(self._coef)))
        return self.freq_hz

    def frame_bins(self, step_start_s: float, n_frames: int) -> np.ndarray:
        """Per-frame mix1 centre bins for the next step (mix1_fq_mid)."""
        hop_s = self.geo.fftx_new_points / self.geo.timf1_sampling_speed
        bw = self._bin_hz()
        t = step_start_s + hop_s * np.arange(n_frames)
        freqs = np.array([self.predict(ti) for ti in t])
        return (np.round(freqs / bw).astype(np.int64)
                % self.geo.fftx_size).astype(np.int32)
