"""Selective limiter — per-bin weak/strong classification (liminfo).

TPU-native ``fft1_update_liminfo`` (reference sellim.c:738-1157).  The
liminfo contract (sellim.c:757-763):

    liminfo[i]  < 0  => bin to strong channel at unit gain
    liminfo[i] == 0  => bin to weak channel
    liminfo[i]  > 0  => bin to strong channel scaled by liminfo[i]

Algorithm, re-expressed without the reference's sequential bin walks:

1. Bins above ``limit = maxlevel^2 * channels * fft1_size/fft2_size``
   on the averaged power spectrum are strong (sellim.c:783-786).
2. Regions extend down their skirts while the adjacent-bin ratio < 0.3
   (sellim.c:801-802) — bounded iterative dilation.
3. All bins of one signal get the common gain ``t2 = sqrt(limit/maxval)``
   (segmented max, sellim.c:810), smoothed 0.8*old + 0.2*new when within
   10x of the previous gain (sellim.c:812-814).
4. Region edges taper as ``t^0.9`` per bin over extra bins
   (sellim.c:823-855) — bounded dilation with exponent decay.
5. Noise floor from per-group mean-of-3-smallest of the slow spectrum
   (sellim.c:877-917, 989-1040); bins above ``ston * floor`` marked
   strong at unit gain (-1) with an SFAC=2 skirt walk (sellim.c:1047-1100).
6. Strong classification holds ~1 s before reverting to weak
   (``liminfo_wait``, sellim.c:775-777, 1127-1140) and gains may only
   grow by RELEASE_FACTOR=1.15 per update (sellim.c:1141-1151).
7. The selected passband is protected (selfreq_liminfo, sellim.c:38-116)
   and the outermost bins are forced weak (sellim.c:1152-1157).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import Geometry
from ..utils.pytree import pytree_dataclass
from ..utils.segments import segment_max, segment_min, segment_sum

RELEASE_FACTOR = 1.15   # sellim.c:35
SFAC = 2.0              # sellim.c:36
TAPER_STEPS = 64        # edge-taper reach (reference budget is
                        # width/4+1 bins per side, sellim.c:823-855 —
                        # 64 covers strong signals up to ~250 bins wide)


def _chain_reach(strong: jax.Array, q: jax.Array,
                 reverse: bool) -> jax.Array:
    """Unbounded conditional reach: r[i] = strong[i] | (q[i] & r[prev])
    along the scan direction — the reference's skirt walk
    (``while(p[ia-1]/p[ia] < 0.3) ia--``, sellim.c:801-802) as one
    associative scan over the boolean semiring instead of a sequential
    (or bounded-dilation) pass.  Exact for any skirt width."""
    def comb(a, b):
        qa, sa = a
        qb, sb = b
        return qa & qb, sb | (qb & sa)

    _, reach = jax.lax.associative_scan(comb, (q, strong),
                                        reverse=reverse)
    return reach


@pytree_dataclass
class SellimState:
    liminfo: jax.Array       # (fft1_size,) float32
    liminfo_wait: jax.Array  # (fft1_size,) int32

    @classmethod
    def create(cls, geo: Geometry) -> "SellimState":
        return cls(liminfo=jnp.zeros((geo.fft1_size,), jnp.float32),
                   liminfo_wait=jnp.zeros((geo.fft1_size,), jnp.int32))


def sellim_limit(geo: Geometry, maxlevel: float) -> float:
    """Strong-signal power threshold on the averaged fft1 spectrum.

    The reference threshold ``maxlevel^2 * avg1num * channels *
    fft1_size/fft2_size`` (sellim.c:783-786) is calibrated in A/D counts
    against summed raw-FFT power.  Here the averaged spectrum is a mean
    (no avg1num factor) and ``maxlevel`` is interpreted in *input
    amplitude* units, so the carrier's coherent FFT gain (sum of the
    analysis window) converts it to spectrum units — a maxlevel of 8
    means "an input carrier of amplitude 8 saturates the weak path".
    """
    from .windows import make_window
    winsum = float(make_window(geo.fft1_size, geo.fft1_sinpow).sum())
    return ((maxlevel * winsum) ** 2 * geo.channels * geo.fft1_size
            / max(geo.fft2_size, geo.fft1_size))


def update_liminfo(geo: Geometry, state: SellimState, avg_power: jax.Array,
                   maxlevel: float, ston: float = 30.0,
                   sel_lo: jax.Array | None = None,
                   sel_hi: jax.Array | None = None,
                   groups: int = 32) -> SellimState:
    """One liminfo update from the averaged fft1 power spectrum.

    avg_power: (fft1_size,) float32, power summed over channels.
    sel_lo/sel_hi: protected passband bin range (traced), or None.
    """
    n = geo.fft1_size
    # Work in band-ascending order (the reference's axis: its bin 0 is
    # the lowest frequency = our bin n/2 for IQ input), so skirt/taper
    # dilation never wraps across the true band edge, the noise-floor
    # groups are contiguous in frequency, and the outermost-bin forcing
    # (sellim.c:1152-1157) lands on the real band edges.
    half = n // 2 if geo.iq_input else 0
    p = jnp.roll(jnp.maximum(avg_power, 1e-30), half)
    old_liminfo = jnp.roll(state.liminfo, half)
    old_wait = jnp.roll(state.liminfo_wait, half)
    limit = jnp.float32(sellim_limit(geo, maxlevel))

    # 1. threshold + 2. skirt extension (exact unbounded walk via scan)
    strong = p > limit
    p_left = jnp.concatenate([p[:1], p[:-1]])
    p_right = jnp.concatenate([p[1:], p[-1:]])
    q_dn = p < 0.3 * p_left     # joins when its left neighbour is in
    q_up = p < 0.3 * p_right    # joins when its right neighbour is in
    strong = (_chain_reach(strong, q_dn, reverse=False)
              | _chain_reach(strong, q_up, reverse=True))

    # 3. common region gain with temporal smoothing
    maxval = segment_max(p, strong)
    gain = jnp.sqrt(limit / jnp.maximum(maxval, limit))
    old_pos = jnp.where(old_liminfo > 0, old_liminfo, jnp.inf)
    old_gain = segment_min(old_pos, strong)
    ratio = old_gain / jnp.maximum(gain, 1e-20)
    smooth = (ratio > 0.1) & (ratio < 10.0) & jnp.isfinite(old_gain)
    gain = jnp.where(smooth, 0.8 * old_gain + 0.2 * gain, gain)
    lim = jnp.where(strong, gain, 0.0)

    # 4. edge taper t^0.9 over (width/4)+1 extra bins
    width = segment_sum(jnp.ones_like(p), strong)
    budget0 = jnp.where(strong, width / 4.0 + 1.0, 0.0)

    def taper_body(_i, carry):
        lim, budget = carry
        lft = jnp.concatenate([lim[:1], lim[:-1]])
        rgt = jnp.concatenate([lim[1:], lim[-1:]])
        bl = jnp.concatenate([budget[:1], budget[:-1]])
        br = jnp.concatenate([budget[1:], budget[-1:]])
        cand = jnp.maximum(jnp.where(bl >= 1.0, lft, 0.0),
                           jnp.where(br >= 1.0, rgt, 0.0))
        new = (lim == 0.0) & (cand > 0.0)
        lim = jnp.where(new, cand ** 0.9, lim)
        budget = jnp.where(new, jnp.maximum(bl - 1.0, br - 1.0), budget)
        return lim, budget

    lim, _ = jax.lax.fori_loop(0, TAPER_STEPS, taper_body,
                               (lim, budget0))

    # 5. noise floor: groups -> mean of 3 smallest (sellim.c:891-917)
    gp = p.reshape(groups, n // groups)
    small3 = -jax.lax.top_k(-gp, 3)[0]          # (groups, 3)
    gmin = jnp.mean(small3, axis=1)
    gavg = jnp.mean(gmin)
    sel = gmin < 2.0 * gavg
    floor = jnp.sum(jnp.where(sel, gmin, 0.0)) / jnp.maximum(
        jnp.sum(sel), 1)
    thr = floor * jnp.float32(ston)
    carrier = (p > thr) & (lim == 0.0)
    # SFAC skirt: extend while the inner neighbour is >2x larger
    for _ in range(4):
        lft = jnp.concatenate([carrier[:1], carrier[:-1]])
        rgt = jnp.concatenate([carrier[1:], carrier[-1:]])
        p_l = jnp.concatenate([p[:1], p[:-1]])
        p_r = jnp.concatenate([p[1:], p[-1:]])
        grow = ((lft & (SFAC * p < p_l)) | (rgt & (SFAC * p < p_r)))
        carrier = carrier | (grow & (lim == 0.0))
    lim = jnp.where(carrier & (lim == 0.0), -1.0, lim)

    # 6. wait counters + release limiting
    blocktime = geo.fft1_new_points / geo.timf1_sampling_speed
    wait_n = jnp.int32(min(255, 1 + int(1.0 / max(
        geo.fft1_frames_per_step * blocktime, 1e-9)) + 1))
    is_strong = lim != 0.0
    wait = jnp.where(is_strong, wait_n, jnp.maximum(old_wait - 1, 0))
    lim = jnp.where(~is_strong & (wait > 0), -1.0, lim)
    # gains may only rise by RELEASE_FACTOR per update (sellim.c:1141)
    cap = jnp.where(old_liminfo > 0, old_liminfo * RELEASE_FACTOR,
                    jnp.inf)
    lim = jnp.where((lim > 0) & (lim > cap) & (cap < 1.0), cap, lim)

    # 7. outermost (band-edge) bins forced weak (sellim.c:1152-1157)
    edge = (jnp.arange(n) < 2) | (jnp.arange(n) >= n - 2)
    lim = jnp.where(edge, 0.0, lim)

    # back to our DC-at-0 bin order, then the protected passband
    # (selfreq_liminfo, our-order coordinates)
    lim = jnp.roll(lim, -half)
    wait = jnp.roll(wait, -half)
    if sel_lo is not None:
        idx = jnp.arange(n)
        in_sel = (idx >= sel_lo) & (idx <= sel_hi)
        lim = jnp.where(in_sel, 0.0, lim)
        wait = jnp.where(in_sel, 0, wait)

    return SellimState(liminfo=lim, liminfo_wait=wait)


def liminfo_gains(liminfo: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-bin (weak_gain, strong_gain) from liminfo (timf2.c:39-126)."""
    weak = jnp.where(liminfo == 0.0, 1.0, 0.0)
    strong = jnp.where(liminfo < 0.0, 1.0,
                       jnp.where(liminfo > 0.0, liminfo, 0.0))
    return weak.astype(jnp.float32), strong.astype(jnp.float32)
