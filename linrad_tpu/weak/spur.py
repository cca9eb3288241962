"""Spur cancellation — coherent subtraction of stable narrow carriers.

TPU-native re-design of the reference spur canceller
(``eliminate_spurs`` spur.c:36, ``init_spur_elimination`` spursub.c:177,
``spur_removal`` wcw.c:204-248).  The reference models each spur over
SPUR_SIZE=8 consecutive transforms with amplitude/phase/slope/curvature
(globdef.h:173-175) and subtracts the smooth model from fft1/fft2.

Here each spur is a matched-filter estimate against the analysis-window
spectrum template around its bin, with an exponentially-smoothed complex
amplitude and a tracked per-frame phase rotation (the discrete analog of
the reference's phase slope): only components whose phase progresses
coherently build up a prediction, so noise and keyed signals are not
subtracted.  Estimation+subtraction runs on device as a ``lax.scan``
over the frame batch (cheap: max_spurs * (2w+1) bins per frame); the
spur *list* (find/drop/re-centre) is host-side control logic at ~Hz
(the auto-search of spur.c).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import Geometry
from ..utils.pytree import pytree_dataclass
from ..ops.windows import make_window

MAX_SPURS = 16      # MAX_NO_OF_SPURS analog (static shape)
TEMPLATE_HALF = 3   # bins each side of the spur centre


def window_template(size: int, sinpow: int) -> np.ndarray:
    """Analysis-window spectrum around DC — the shape a pure carrier
    takes in the fftx spectrum (normalised to unit centre)."""
    w = make_window(size, sinpow)
    spec = np.fft.fft(w)
    idx = np.arange(-TEMPLATE_HALF, TEMPLATE_HALF + 1)
    t = spec[idx % size]
    return (t / spec[0]).astype(np.complex64)


@pytree_dataclass
class SpurState:
    bins: jax.Array     # (MAX_SPURS,) int32 — centre bin, -1 = inactive
    amp: jax.Array      # (MAX_SPURS, C) complex64 — smoothed amplitude
    rot: jax.Array      # (MAX_SPURS,) complex64 — per-frame phase step

    @classmethod
    def create(cls, geo: Geometry) -> "SpurState":
        return cls(
            bins=jnp.full((MAX_SPURS,), -1, jnp.int32),
            amp=jnp.zeros((MAX_SPURS, geo.channels), jnp.complex64),
            rot=jnp.ones((MAX_SPURS,), jnp.complex64),
        )


def spur_subtract_step(geo: Geometry, template: jax.Array,
                       state: SpurState, spectra: jax.Array,
                       gamma: float = 0.1
                       ) -> tuple[SpurState, jax.Array]:
    """Estimate + subtract all active spurs from a step of spectra.

    spectra: (n, N, C) complex64.  Returns (state, cleaned spectra)."""
    n_frames, big_n, c = spectra.shape
    th = TEMPLATE_HALF
    tlen = 2 * th + 1
    offs = jnp.arange(-th, th + 1)
    tnorm = jnp.sum(jnp.abs(template) ** 2).astype(jnp.float32)
    active = (state.bins >= 0)[:, None]                       # (S, 1)
    idx = jnp.mod(jnp.where(state.bins < 0, 0, state.bins)[:, None]
                  + offs[None, :], big_n)                      # (S, tlen)

    def frame_body(carry, x):
        amp, rot = carry                                       # (S,C),(S,)
        sel = x[idx]                                           # (S,tlen,C)
        est = jnp.sum(sel * jnp.conj(template)[None, :, None],
                      axis=1) / tnorm                          # (S, C)
        pred = amp * rot[:, None]
        # subtract the *smoothed prediction* (not the raw estimate) so
        # only coherent components are removed (spur.c model subtract)
        sub = jnp.where(active, pred, 0.0)[:, None, :] \
            * template[None, :, None]                          # (S,tlen,C)
        x = x.at[idx].add(-sub)
        # update the model: amplitude EMA + rotation EMA
        new_amp = jnp.where(active, (1 - gamma) * pred + gamma * est,
                            amp)
        corr = jnp.sum(est * jnp.conj(pred), axis=1)           # (S,)
        unit = jnp.where(jnp.abs(corr) > 1e-20,
                         corr / jnp.maximum(jnp.abs(corr), 1e-20), 1.0)
        new_rot = rot * jnp.where(active[:, 0],
                                  unit ** jnp.float32(gamma), 1.0)
        new_rot = new_rot / jnp.maximum(jnp.abs(new_rot), 1e-20)
        return (new_amp, new_rot), x

    (amp, rot), cleaned = jax.lax.scan(frame_body,
                                       (state.amp, state.rot), spectra)
    return SpurState(bins=state.bins, amp=amp, rot=rot), cleaned


@dataclass
class SpurManager:
    """Host-side spur list control (the auto-search of spur.c).

    Finds persistent narrow peaks in the long-term averaged spectrum
    (outside the protected passband), assigns them to state slots and
    re-centres drifted spurs."""

    geo: Geometry
    ston: float = 25.0          # power ratio over median to call a spur
    _slots: dict = field(default_factory=dict)   # slot -> bin

    def scan(self, avg_power: np.ndarray, state: SpurState,
             protect_lo: int = -1, protect_hi: int = -1) -> SpurState:
        p = np.asarray(avg_power, np.float64)
        n = len(p)
        med = np.median(p)
        bins = np.asarray(state.bins).copy()
        amp = np.asarray(state.amp).copy()
        rot = np.asarray(state.rot).copy()
        taken = set(int(b) for b in bins if b >= 0)
        # drop spurs that faded
        for s in range(MAX_SPURS):
            b = int(bins[s])
            if b >= 0 and p[b] < 3.0 * med:
                bins[s] = -1
                amp[s] = 0
                rot[s] = 1
                taken.discard(b)
        # find candidates: local maxima well above the floor, narrow
        cand = np.argsort(p)[::-1][:64]
        for b in cand:
            b = int(b)
            if p[b] < self.ston * med:
                break
            if protect_lo <= b <= protect_hi:
                continue
            if any(abs(b - t) <= 2 * TEMPLATE_HALF or
                   abs(b - t) >= n - 2 * TEMPLATE_HALF for t in taken):
                continue
            free = np.where(bins < 0)[0]
            if len(free) == 0:
                break
            s = int(free[0])
            bins[s] = b
            amp[s] = 0
            rot[s] = 1
            taken.add(b)
        return SpurState(bins=jnp.asarray(bins),
                         amp=jnp.asarray(amp), rot=jnp.asarray(rot))
