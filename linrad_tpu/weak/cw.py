"""Coherent CW processing and Morse decoding.

TPU-native re-design of the reference's coherent-CW + Morse stack
(``coherent_cw_detect`` coherent.c:283, ``evaluate_keying_spectrum``
coherent.c:77, ``detect_cw_speed`` cwspeed.c:577, symbol segmentation
and decode cwdetect.c:126-160 / morse.c:77-125; method notes
z_MORSE_DECODING.txt).

The envelope/keying analysis runs on numpy at audio rate (host control
path — the decode operates on seconds of audio at a few kHz, far from
the TPU hot loop, exactly like the reference runs it in the narrowband
idle path).  Stages:

1. Envelope smoothing at ~8x the keying rate.
2. CW speed from the keying spectrum — the envelope's spectral peak in
   the plausible keying-rate band (evaluate_keying_spectrum).
3. Adaptive mark/space threshold between the envelope's low/high modes.
4. Run-length classification: dot vs dash at 2x the dot length, element
   / character / word gaps at the standard 1:3:7 weighting.
5. Character lookup in the Morse table (insert_char, morse.c:77).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MORSE_TABLE = {
    ".-": "A", "-...": "B", "-.-.": "C", "-..": "D", ".": "E",
    "..-.": "F", "--.": "G", "....": "H", "..": "I", ".---": "J",
    "-.-": "K", ".-..": "L", "--": "M", "-.": "N", "---": "O",
    ".--.": "P", "--.-": "Q", ".-.": "R", "...": "S", "-": "T",
    "..-": "U", "...-": "V", ".--": "W", "-..-": "X", "-.--": "Y",
    "--..": "Z",
    "-----": "0", ".----": "1", "..---": "2", "...--": "3", "....-": "4",
    ".....": "5", "-....": "6", "--...": "7", "---..": "8", "----.": "9",
    ".-.-.-": ".", "--..--": ",", "..--..": "?", "-..-.": "/",
    "-...-": "=", ".-.-.": "+", "-....-": "-", ".--.-.": "@",
}
MORSE_ENCODE = {v: k for k, v in MORSE_TABLE.items()}


def smooth_envelope(x: np.ndarray, fs: float,
                    cutoff_hz: float) -> np.ndarray:
    """One-pole envelope smoother (the coherent.c averaging)."""
    from scipy.signal import lfilter

    env = np.abs(x).astype(np.float64)
    a = np.exp(-2 * np.pi * cutoff_hz / fs)
    out, _ = lfilter([1 - a], [1, -a], env, zi=[env[0] * a])
    return out


def keying_spectrum(envelope: np.ndarray, fs: float) -> tuple[np.ndarray,
                                                              np.ndarray]:
    """Power spectrum of the keying envelope (evaluate_keying_spectrum,
    coherent.c:77).  Returns (freqs_hz, power)."""
    e = envelope - envelope.mean()
    n = len(e)
    spec = np.abs(np.fft.rfft(e * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    return freqs, spec


def _runs(on: np.ndarray) -> list[tuple[bool, int]]:
    edges = np.flatnonzero(np.diff(on.astype(np.int8)))
    runs = []
    prev = 0
    cur = bool(on[0])
    for e in edges:
        runs.append((cur, e + 1 - prev))
        prev = e + 1
        cur = not cur
    runs.append((cur, len(on) - prev))
    return runs


def _debounce(runs: list[tuple[bool, int]], min_len: int
              ) -> list[tuple[bool, int]]:
    """Merge runs shorter than min_len into their neighbours (threshold
    chatter suppression — the reference's region-growing segmentation,
    cwdetect.c short_region_guesses, serves the same purpose)."""
    changed = True
    while changed:
        changed = False
        out: list[tuple[bool, int]] = []
        for state, ln in runs:
            if out and (out[-1][0] == state or
                        (ln < min_len and len(out) > 0)):
                if out[-1][0] == state:
                    out[-1] = (state, out[-1][1] + ln)
                else:
                    out[-1] = (out[-1][0], out[-1][1] + ln)
                    changed = True
            else:
                out.append((state, ln))
        runs = out
    return runs


def detect_cw_speed(envelope: np.ndarray, fs: float,
                    min_wpm: float = 5.0, max_wpm: float = 80.0
                    ) -> float:
    """CW speed in WPM from mark run-length statistics.

    The reference derives speed from the keying spectrum plus dash/dot
    correlation over amplitude sequences (detect_cw_speed cwspeed.c:577,
    find_good_dashes :496).  Run lengths are the robust digital
    equivalent: marks cluster at 1 dot and 3 dots; a 2-means split of
    the mark lengths recovers the dot time even for short noisy
    captures where the keying spectrum is dominated by word structure.
    """
    lo = np.percentile(envelope, 15)
    hi = np.percentile(envelope, 85)
    if hi <= 1.5 * lo:
        return 0.0  # no keying contrast
    on = envelope > 0.5 * (lo + hi)
    marks = np.array([ln for is_on, ln in _runs(on) if is_on],
                     np.float64)
    min_dot = fs * 1.2 / max_wpm / 2
    marks = marks[marks > min_dot]
    if len(marks) == 0:
        return 0.0
    # 2-means split into dot / dash clusters
    c_lo, c_hi = marks.min(), marks.max()
    for _ in range(10):
        split = 0.5 * (c_lo + c_hi)
        low = marks[marks <= split]
        high = marks[marks > split]
        c_lo = low.mean() if len(low) else c_lo
        c_hi = high.mean() if len(high) else c_hi
    if c_hi > 2.0 * c_lo:          # both clusters present
        dot_n = 0.5 * (c_lo + c_hi / 3.0)
    else:                          # single cluster: dots or dashes?
        dot_n = c_lo if c_lo < 2.5 * np.median(marks) else c_lo / 3.0
    wpm = 1.2 / (dot_n / fs)
    return float(np.clip(wpm, 0.0, max_wpm * 1.5))


@dataclass
class DecodeResult:
    text: str
    wpm: float
    threshold: float
    marks: list  # (start_sample, length_samples) of detected marks
    score: float = 0.0  # per-sample Viterbi log-likelihood (ml path)


def decode_morse(audio: np.ndarray, fs: float, wpm_hint: float = 0.0
                 ) -> DecodeResult:
    """Decode keyed CW audio (real envelope-bearing signal or complex
    baseband) to text.

    Weak-signal path: the power envelope is matched-filtered with a
    half-dot boxcar before thresholding (the matched dash/dot filtering
    idea of cwdetect.c/cwspeed.c) — this decodes down to ~0 dB in-filter
    SNR where a plain envelope threshold fails around +6 dB."""
    env_raw = np.abs(audio)
    wpm = wpm_hint
    if not wpm:
        # speed estimator selection by envelope contrast: with a clean
        # envelope the run-length clustering is exact even on short
        # records; near the noise the runs are chatter and the keying
        # spectrum (which integrates the whole record,
        # evaluate_keying_spectrum coherent.c:77) is the reliable one
        env0 = smooth_envelope(env_raw, fs, 60.0)
        lo0 = np.percentile(env0, 15)
        hi0 = np.percentile(env0, 85)
        run_wpm = detect_cw_speed(env0, fs)
        spec_wpm = 0.0
        freqs, spec = keying_spectrum(env_raw ** 2, fs)
        band = (freqs >= 5.0 / 1.2 / 2.0) & (freqs <= 60.0 / 1.2 / 2.0)
        if np.any(band) and spec[band].max() > 10.0 * np.median(
                spec[band]):
            spec_wpm = 1.2 * 2.0 * freqs[band][np.argmax(spec[band])]
        wpm = (run_wpm if hi0 > 3.0 * lo0 and run_wpm > 0
               else (spec_wpm or run_wpm))
    if wpm <= 0:
        return DecodeResult("", 0.0, 0.0, [])
    dot_s = 1.2 / wpm
    # matched filter: half-dot boxcar over the POWER envelope
    dot_n_mf = max(1, int(dot_s * fs / 2))
    kern = np.ones(dot_n_mf) / dot_n_mf
    env = np.convolve(env_raw.astype(np.float64) ** 2, kern, mode="same")
    # adaptive threshold between the two power modes (geometric mean)
    lo = max(np.percentile(env, 15), 1e-30)
    hi = max(np.percentile(env, 85), 1e-30)
    thr = np.sqrt(lo * hi)
    on = env > thr
    dot_n = dot_s * fs
    runs = _debounce(_runs(on), max(1, int(0.3 * dot_n)))
    text = []
    sym = ""
    marks = []
    pos = 0
    for is_on, length in runs:
        if is_on:
            marks.append((pos, length))
            sym += "." if length < 2.0 * dot_n else "-"
        else:
            if length >= 5.0 * dot_n:     # word gap (7 dots nominal)
                if sym:
                    text.append(MORSE_TABLE.get(sym, "#"))
                    sym = ""
                text.append(" ")
            elif length >= 2.0 * dot_n:   # char gap (3 dots nominal)
                if sym:
                    text.append(MORSE_TABLE.get(sym, "#"))
                    sym = ""
        pos += length
    if sym:
        text.append(MORSE_TABLE.get(sym, "#"))
    return DecodeResult("".join(text).strip(), wpm, thr, marks)


def _derotate_carrier(z: np.ndarray, fs: float
                      ) -> tuple[np.ndarray, float]:
    """Move the strongest spectral line of a complex baseband to DC
    (the residual-carrier removal the reference gets from its AFC +
    coherent carrier filter, mix2.c baseb_carrier).  Returns
    (derotated, offset_hz)."""
    n = len(z)
    pad = 4 if n * 4 <= (1 << 22) else 1
    spec = np.fft.fft(z * np.hanning(n), pad * n)
    mags = np.abs(spec)
    k = int(np.argmax(mags))
    km, kp = (k - 1) % (pad * n), (k + 1) % (pad * n)
    denom = mags[km] - 2 * mags[k] + mags[kp]
    delta = (0.5 * (mags[km] - mags[kp]) / denom) if denom else 0.0
    f = ((k + delta) / (pad * n)) * fs
    if f > fs / 2:
        f -= fs
    return (z * np.exp(-2j * np.pi * f * np.arange(n) / fs)
            ).astype(np.complex64), float(f)


def decode_morse_ml(audio: np.ndarray, fs: float, wpm_hint: float = 0.0,
                    dur_weight: float = 12.0, cells_per_dot: int = 6
                    ) -> DecodeResult:
    """Maximum-likelihood Morse decode: Viterbi over the element grammar.

    The reference decodes by thresholding + region-growing guesses over
    amplitude sequences (cwdetect.c short_region_guesses:113,
    find_good_dashes cwspeed.c:496).  This is the same idea taken to its
    optimum: the power envelope is integrated into half-dot cells and
    the single most likely alternating mark/space element sequence
    (dot, dash / element-, character-, word-gap) is found by dynamic
    programming with Gaussian duration priors around the 1:3:7 Morse
    grid.  No threshold exists: at high SNR the per-cell log-likelihood
    ratios dominate and timing is flexible; near the noise the duration
    prior dominates and the grammar carries the decode.  Measured: equal
    to the matched-filter threshold path at moderate SNR and ~25% fewer
    character errors at its -3 dB failure point (tests).

    With COMPLEX baseband input a coherent scorer also competes: after
    residual-carrier derotation, every candidate mark element is scored
    by its coherent integral |sum z|^2/(d*v) over the element (prefix
    sums make this O(1) per candidate) — the full generalisation of the
    reference's dash template fits (fit_dash cohsub.c:94, which
    coherently integrates only at dash scale).  Coherent dash
    integration is worth ~10*log10(12) dB over quarter-dot envelope
    statistics, extending the decode threshold ~4 dB below the
    incoherent path (WEAK_SIGNAL.md sweep).
    """
    audio = np.asarray(audio)
    is_complex = np.iscomplexobj(audio)
    env_raw = np.abs(audio).astype(np.float64)
    zd = None
    if is_complex:
        zd, _off = _derotate_carrier(audio.astype(np.complex64), fs)
    base = decode_morse(audio, fs, wpm_hint)       # speed + fallback
    wpm = wpm_hint or base.wpm
    if wpm <= 0:
        return base

    def _decode_at(wpm: float, coherent: bool = False):
        dot_s = 1.2 / wpm
        q = int(cells_per_dot)
        cell_n = max(1, int(round(dot_s * fs / q)))    # cells per dot
        ncell = len(env_raw) // cell_n
        if ncell < 2 * q:
            return None
        pwr = env_raw[: ncell * cell_n] ** 2
        x = pwr.reshape(ncell, cell_n).mean(axis=1)
        if coherent:
            cz = zd[: ncell * cell_n].reshape(ncell, cell_n).mean(axis=1)
            cp = np.abs(cz) ** 2
            v = max(float(np.quantile(cp, 0.3)) / 0.357, 1e-30)
            if float(np.quantile(cp, 0.9)) < 2.0 * v:
                return None                 # no coherent keying
            cumz = np.concatenate([[0.0 + 0.0j], np.cumsum(cz)])
            cump = np.concatenate([[0.0], np.cumsum(cp)])
            lam = 4.0   # per-mark model-complexity charge (chi^2_2)
            # mark emission: coherent integral |sum z|^2/(d*v) (prefix
            # sums); space emission: spaces must be QUIET — signal
            # power left inside a claimed gap is charged beyond the 2x
            # noise mean (a dash split into dot+gap+dot leaves its
            # middle third's power unclaimed).  Both vectorised over
            # candidate durations in the DP below.
        else:
            # Gaussian emission model (cells average many power
            # samples): fit the space/mark modes by 2-means, then
            # per-cell LLR under the two fitted Gaussians.  Scale
            # adapts naturally: strong signals give huge |LLR| (timing
            # becomes flexible), weak ones give small |LLR| (the
            # duration grammar carries the decode).
            c0, c1 = float(x.min()), float(x.max())
            for _ in range(16):
                split = 0.5 * (c0 + c1)
                lo_cells = x[x <= split]
                hi_cells = x[x > split]
                c0 = float(lo_cells.mean()) if len(lo_cells) else c0
                c1 = float(hi_cells.mean()) if len(hi_cells) else c1
            lo_cells = x[x <= 0.5 * (c0 + c1)]
            hi_cells = x[x > 0.5 * (c0 + c1)]
            if len(lo_cells) < 2 or len(hi_cells) < 2 or c1 <= 1.2 * c0:
                return None                 # no keying contrast
            v0 = max(float(lo_cells.var()), 1e-4 * (c1 - c0) ** 2,
                     1e-30)
            v1 = max(float(hi_cells.var()), v0)
            llr = (-0.5 * (x - c1) ** 2 / v1 - 0.5 * np.log(v1)
                   + 0.5 * (x - c0) ** 2 / v0 + 0.5 * np.log(v0))
            llr = np.clip(llr, -50.0, 50.0)
            cum = np.concatenate([[0.0], np.cumsum(llr)])
            # mark emission: summed per-cell LLR (prefix sums); spaces
            # score 0 — the LLR is already relative to "off"

        # element grammar: marks and spaces alternate; durations in
        # cells (q per dot) around the 1:3:7 grid — ranges are the
        # quarter-dot-tuned bounds scaled by q/4, with adjacent
        # elements' ranges kept CONTIGUOUS (upper bound = next lower
        # bound - 1): independent rounding leaves coverage gaps (at
        # q=6, an 11-cell mark would fit neither dot nor dash)
        def _sc(x):
            return max(1, int(round(x * q / 4.0)))
        dash_lo, dash_hi = _sc(8), _sc(20)
        word_lo, word_hi = _sc(21), _sc(52)
        MARKS = ((".", _sc(4), (_sc(2), dash_lo - 1)),
                 ("-", _sc(12), (dash_lo, dash_hi)))
        SPACES = (("e", _sc(4), (_sc(2), dash_lo - 1)),
                  ("c", _sc(12), (dash_lo, word_lo - 1)),
                  ("w", _sc(28), (word_lo, word_hi)))
        # duration-prior weight (llr units per squared relative error): must
        # be strong enough that near the noise the 1:3:7 grid, not the
        # per-cell noise, decides segmentation; at high SNR the clipped
        # +/-50 LLRs dominate it regardless
        W = dur_weight

        def durpen(d, nom):
            r = (d - nom) / nom
            return -W * r * r

        neg = -1e18
        # best score of a path ending at cell j having just finished a
        # mark (bm) / space (bs) element.  The per-j duration scans are
        # numpy-vectorised (a python double loop is ~10x slower, which
        # would make 6-cells-per-dot resolution unaffordable).
        bm = np.full(ncell + 1, neg)
        bs = np.full(ncell + 1, neg)
        bs[0] = 0.0    # start in space
        bm[0] = 0.0    # or directly with a mark
        ptr_m = np.zeros((ncell + 1, 2), np.int32)   # (type, dur)
        ptr_s = np.zeros((ncell + 1, 3), np.int32)   # (type, dur, from_space)
        m_tab = [(t, np.arange(dlo, dhi + 1),
                  np.array([durpen(d, nom) for d in range(dlo, dhi + 1)]))
                 for t, (_, nom, (dlo, dhi)) in enumerate(MARKS)]
        s_tab = [(t, np.arange(dlo, dhi + 1),
                  np.array([durpen(d, nom) for d in range(dlo, dhi + 1)]))
                 for t, (_, nom, (dlo, dhi)) in enumerate(SPACES)]

        def mark_sc_vec(j, ds):
            if coherent:
                s = cumz[j] - cumz[j - ds]
                return (np.minimum((s.real * s.real + s.imag * s.imag)
                                   / (ds * v), 50.0 * ds) - lam)
            return cum[j] - cum[j - ds]

        def space_sc_vec(j, ds):
            if coherent:
                excess = (cump[j] - cump[j - ds]) / v - 2.0 * ds
                return -np.minimum(np.maximum(excess, 0.0), 50.0 * ds)
            return 0.0

        for j in range(1, ncell + 1):
            best = neg
            arg = (0, 0)
            for t, ds_full, pen_full in m_tab:
                k = int(np.searchsorted(ds_full, j, side="right"))
                if k == 0:
                    continue
                ds = ds_full[:k]
                scs = bs[j - ds] + mark_sc_vec(j, ds) + pen_full[:k]
                i = int(np.argmax(scs))
                if scs[i] > best:
                    best = float(scs[i])
                    arg = (t, int(ds[i]))
            bm[j] = best
            ptr_m[j] = arg
            best = neg
            arg = (0, 0, 0)
            for t, ds_full, pen_full in s_tab:
                k = int(np.searchsorted(ds_full, j, side="right"))
                if k == 0:
                    continue
                ds = ds_full[:k]
                scs = bm[j - ds] + pen_full[:k] + space_sc_vec(j, ds)
                i = int(np.argmax(scs))
                if scs[i] > best:
                    best = float(scs[i])
                    arg = (t, int(ds[i]), 0)
            # word gaps may chain (space -> space): dead air of any length
            # is spaces, never forced marks (the strict alternation would
            # otherwise have to invent dots to span long silence)
            t_w, ds_full, pen_full = s_tab[-1]
            k = int(np.searchsorted(ds_full, j, side="right"))
            if k > 0:
                ds = ds_full[:k]
                scs = bs[j - ds] + pen_full[:k] + space_sc_vec(j, ds)
                i = int(np.argmax(scs))
                if scs[i] > best:
                    best = float(scs[i])
                    arg = (t_w, int(ds[i]), 1)
            bs[j] = best
            ptr_s[j] = arg
        raw_score = float(max(bm[ncell], bs[ncell]))
        # backtrack from the better terminal state
        j = ncell
        in_mark = bm[j] >= bs[j]
        elems: list[tuple[str, int, int]] = []    # (kind, start_cell, dur)
        while j > 0:
            if in_mark:
                t, d = ptr_m[j]
                if d == 0:
                    break
                elems.append((MARKS[t][0], j - d, d))
                j -= d
                in_mark = False
            else:
                t, d, from_space = ptr_s[j]
                if d == 0:
                    break
                elems.append((SPACES[t][0], j - d, d))
                j -= d
                in_mark = not from_space
        elems.reverse()
        # squelch pass: the grammar happily explains low-level ringing and
        # noise blips in silent stretches (leading/trailing dead air) as
        # isolated dots.  A real message's marks share a power level; drop
        # marks more than 10 dB below the median mark power and return
        # their time to the surrounding space (re-classified by duration).
        mark_p = [float(x[st:st + d].mean()) for k, st, d in elems
                  if k in ".-"]
        if mark_p:
            floor = 0.1 * float(np.median(mark_p))
            cleaned: list[tuple[str, int, int]] = []
            for k, st, d in elems:
                if k in ".-" and float(x[st:st + d].mean()) < floor:
                    k = "e"                      # demoted to space time
                if cleaned and cleaned[-1][0] not in ".-" and k not in ".-":
                    pk, pst, pd = cleaned[-1]    # merge adjacent spaces
                    total = pd + d
                    kind = ("e" if total <= dash_lo - 1 else
                            "c" if total <= word_lo - 1 else "w")
                    cleaned[-1] = (kind, pst, total)
                else:
                    cleaned.append((k, st, d))
            elems = cleaned
        text: list[str] = []
        sym = ""
        marks = []
        for kind, start, d in elems:
            if kind in ".-":
                sym += kind
                marks.append((start * cell_n, d * cell_n))
            elif kind in "cw":
                if sym:
                    text.append(MORSE_TABLE.get(sym, "#"))
                    sym = ""
                if kind == "w":
                    text.append(" ")
        if sym:
            text.append(MORSE_TABLE.get(sym, "#"))
        out = "".join(text).strip()
        # per-sample normalisation with a model-complexity penalty (a
        # BIC-flavoured term): a too-fast speed hypothesis gains
        # emission score by overfitting noise with many short elements;
        # charging ~5 LLR units per element makes hypothesis scores
        # comparable across speeds
        score = (raw_score - 5.0 * len(elems)) / (ncell * cell_n)
        return score, DecodeResult(out, wpm, 0.0, marks, score)

    # multi-hypothesis speed: near the noise the speed estimators fail
    # first (the -4 dB failure mode in the qualification sweep); try
    # the estimate and its 2/3 and 3/2 aliases (dot/dash confusion) and
    # keep the sequence with the best per-cell Viterbi score — the
    # likelihood itself selects the speed, like the reference's
    # find_good_dashes correlation scan selects the dash length
    # (cwspeed.c:496).
    if wpm_hint:
        speeds = [float(wpm_hint)]
    else:
        # near the noise the estimators collapse to harmonics/aliases
        # of the true speed (the -6 dB failure mode: estimate ~3x
        # high); cover the dot/dash confusion aliases AND the
        # harmonic-collapse divisors.  Each coarse hypothesis also gets
        # a FINE grid (+/-8/15%): the measured -6..-10 dB catastrophes
        # were estimates off by 14-20% where every coarse candidate
        # decodes garbage while a +/-10%-correct speed decodes cleanly
        # (speed-grid pinning, the find_good_dashes role cwspeed.c:496)
        # both collapse directions occur: smeared envelopes merge runs
        # (estimate LOW — needs x2/x3) and noise chatter splits them
        # (estimate HIGH — needs /2:/3)
        raw = (wpm, wpm * 2.0 / 3.0, wpm * 1.5, wpm / 2.0, wpm / 3.0,
               wpm * 2.0, wpm * 3.0)
        fine = (1.0, 0.87, 0.93, 1.08, 1.16)
        speeds = []
        for c in raw:
            for f in fine:
                s = c * f
                if 4.0 <= s <= 100.0 and not any(
                        abs(s - t) < 0.04 * t for t in speeds):
                    speeds.append(float(s))
    cands = [(c, False) for c in speeds]
    if is_complex:
        cands += [(c, True) for c in speeds]
    # hypothesis selection by Morse-grid fit: decode each candidate,
    # then measure how tightly its mark durations cluster on the 1:3
    # dot/dash grid AT THAT SPEED (the discriminating statistic behind
    # the reference's find_good_dashes scan, cwspeed.c:496).  Fit-to-
    # data metrics (Viterbi score, waveform correlation) always favour
    # a faster grid that bends short marks around noise spikes; the
    # duration clustering does the opposite — a wrong speed leaves the
    # true keying off-grid (measured ~0.1 vs ~0.25+ mean deviation).
    def _grid_dev(res):
        if not res.marks:
            return 9.9
        dot_n = 1.2 / res.wpm * fs
        devs = [min(abs(d / dot_n - 1.0), abs(d / dot_n - 3.0) / 3.0)
                for _st, d in res.marks]
        return float(np.mean(devs))

    def _key_of(r):
        dev = _grid_dev(r[1])
        # undecodable symbols ('#') mean the mark/space structure is
        # broken even if the durations sit on a grid — charge them
        # (the reference's check_cw plausibility guard, morse.c:77)
        txt = r[1].text
        n_sym = max(len(txt.replace(" ", "")), 1)
        hash_pen = 0.6 * txt.count("#") / n_sym
        # degenerate structure: a wrong (too fast) speed decodes noise
        # as dash-spam ("T T MTT TTTT") whose durations still sit on a
        # grid; real Morse text has a dot/dash mix (~55/45) — charge
        # strongly skewed mark mixes
        if r[1].marks:
            dot_n = 1.2 / r[1].wpm * fs
            n_dash = sum(1 for _st, ln in r[1].marks
                         if ln > 2.0 * dot_n)
            dash_frac = n_dash / len(r[1].marks)
            skew_pen = 0.5 * max(0.0, dash_frac - 0.65) \
                + 0.5 * max(0.0, 0.15 - dash_frac)
        else:
            skew_pen = 0.5
        return dev + hash_pen + skew_pen, dev, hash_pen, skew_pen

    best = None
    dbg = []
    for c, coh in cands:
        r = _decode_at(c, coherent=coh)
        if r is None:
            continue
        key, dev, hash_pen, skew_pen = _key_of(r)
        dbg.append((key, dev, hash_pen, skew_pen, coh, c, r[0], r[1].text))
        if best is None or key < best[0] - 0.02 or (
                abs(key - best[0]) <= 0.02 and r[0] > best[1]):
            best = (key, r[0], r[1], coh)
    # speed-grid refinement from the winning segmentation: re-fit the
    # dot time from the decoded mark durations (dots, dashes/3 — the
    # statistic find_good_dashes pins, cwspeed.c:496) and re-decode at
    # the refined speed; keeps whichever the selector prefers
    if best is not None and best[2].marks:
        r0 = best[2]
        dot_n = 1.2 / r0.wpm * fs
        dots_ln = [ln for _s, ln in r0.marks if ln < 2.0 * dot_n]
        dash_ln = [ln for _s, ln in r0.marks if ln >= 2.0 * dot_n]
        ests = ([float(np.median(dots_ln))] if dots_ln else []) \
            + ([float(np.median(dash_ln)) / 3.0] if dash_ln else [])
        if ests:
            ref_wpm = 1.2 / (float(np.mean(ests)) / fs)
            if (abs(ref_wpm - r0.wpm) > 0.02 * r0.wpm
                    and 4.0 <= ref_wpm <= 100.0):
                r = _decode_at(ref_wpm, coherent=best[3])
                if r is not None:
                    key = _key_of(r)[0]
                    dbg.append((key, "refined", best[3], ref_wpm,
                                r[0], r[1].text))
                    if key < best[0] - 0.02 or (
                            abs(key - best[0]) <= 0.02
                            and r[0] > best[1]):
                        best = (key, r[0], r[1], best[3])
    if "__cw_debug__" in globals() and globals()["__cw_debug__"]:
        for row in sorted(dbg, key=lambda t: t[0]):
            print("cand", row)
    if best is None:
        return base
    return best[2]


def keyed_cw(text: str, fs: float, wpm: float, tone_hz: float,
             amplitude: float = 1.0, rise_s: float = 0.005,
             complex_out: bool = True) -> np.ndarray:
    """Generate keyed CW (the TX-side do_cw_keying analog, tx.c:658,
    with rise-time-shaped edges) — also the test vector generator for
    the decoder."""
    dot = int(round(1.2 / wpm * fs))
    key = []
    for ch in text.upper():
        if ch == " ":
            key.extend([0] * (7 * dot))
            continue
        code = MORSE_ENCODE.get(ch)
        if code is None:
            continue
        for j, s in enumerate(code):
            key.extend([1] * (dot if s == "." else 3 * dot))
            key.extend([0] * dot)
        key.extend([0] * (2 * dot))  # total 3 dots between chars
    key = np.array(key, np.float32)
    # raised-cosine edges
    r = max(1, int(rise_s * fs))
    ramp = 0.5 * (1 - np.cos(np.pi * np.arange(r) / r))
    kernel = np.ones(1)
    shaped = np.convolve(key, np.concatenate([ramp, ramp[::-1]]) / r,
                         mode="same") if r > 1 else key
    shaped = np.clip(shaped, 0, 1)
    t = np.arange(len(shaped)) / fs
    if complex_out:
        return (amplitude * shaped
                * np.exp(2j * np.pi * tone_hz * t)).astype(np.complex64)
    return (amplitude * shaped
            * np.sin(2 * np.pi * tone_hz * t)).astype(np.float32)


def learn_keying_ramp(envelope: np.ndarray, fs: float, dot_s: float,
                      marks: list, max_ramp_s: float = 0.02
                      ) -> np.ndarray:
    """Learn the transmitter's keying edge shape from the signal itself
    (collect_ramp, coherent.c:156): average the envelope around every
    detected mark's rising edge (falling edges are averaged reversed
    into the same template) and normalise to a 0→1 ramp.

    marks: (start_sample, length_samples) list from a decode pass.
    Returns the ramp as a (r,) float array (r = max_ramp_s * fs),
    monotone 0..1."""
    env = np.asarray(envelope, np.float64)
    r = max(2, int(max_ramp_s * fs))
    acc = np.zeros(2 * r)
    n_acc = 0
    for start, length in marks:
        if length < 2 * r:
            continue
        mid = env[start + r: start + length - r]
        if not len(mid):
            continue
        top = np.median(mid)
        if top <= 0:
            continue
        if start - r >= 0:
            acc += env[start - r: start + r] / top
            n_acc += 1
        stop = start + length
        if stop + r <= len(env):
            acc += env[stop + r: stop - r: -1] / top  # reversed falling
            n_acc += 1
    if n_acc == 0:
        # no usable edges: ideal hard keying
        return np.clip(np.arange(2 * r) - r + 1, 0, 1).astype(np.float64)
    ramp = acc / n_acc
    ramp -= ramp.min()
    m = ramp.max()
    if m > 0:
        ramp /= m
    # enforce monotonicity (noise on the average)
    return np.maximum.accumulate(ramp)


def make_ideal_waveform(symbols: str, fs: float, wpm: float,
                        ramp: np.ndarray | None = None) -> np.ndarray:
    """Build the ideal keying envelope for a symbol string ('.', '-',
    ' ' = char gap, '/' = word gap) with the learned edge shape
    (make_ideal_waveform, coherent.c:212) — the template the coherent
    detector correlates against."""
    dot = max(1, int(round(1.2 / wpm * fs)))
    key: list = []
    for s in symbols:
        if s == ".":
            key.extend([1] * dot + [0] * dot)
        elif s == "-":
            key.extend([1] * (3 * dot) + [0] * dot)
        elif s == " ":
            key.extend([0] * (2 * dot))
        elif s == "/":
            key.extend([0] * (6 * dot))
    x = np.array(key, np.float64)
    if ramp is None or len(ramp) < 2:
        return x
    # convolve the hard keying's edges with the learned ramp derivative,
    # compensating the template's group delay (its 50% crossing) so the
    # shaped edges stay centred on the hard-keying transitions
    d = np.diff(ramp, prepend=0.0)
    d = d / max(d.sum(), 1e-12)
    mid = int(np.argmax(ramp >= 0.5))
    y = np.convolve(x, d)[mid: mid + len(x)]
    return np.clip(y, 0.0, 1.0)


def coherent_integrate(baseband: np.ndarray, fs: float, dot_s: float,
                       carrier_phase: np.ndarray | None = None
                       ) -> np.ndarray:
    """Coherent (phase-locked) detection: integrate the in-phase
    component over dot-length windows (coherent_cw_detect,
    coherent.c:283).  With a carrier phase estimate the noise in the
    quadrature channel is discarded — the 3 dB coherent gain."""
    z = baseband
    if carrier_phase is not None:
        z = z * np.exp(-1j * carrier_phase)
    n_dot = max(1, int(round(dot_s * fs / 4)))  # 4 samples per dot
    n = len(z) // n_dot
    segs = np.real(z[: n * n_dot]).reshape(n, n_dot)
    return segs.mean(axis=1)


# ---------------------------------------------------------------------------
# repeated-message stacking (the QRSS / EME deep-integration regime)
# ---------------------------------------------------------------------------

def estimate_repeat_period(envelope: np.ndarray, fs: float,
                           min_s: float = 2.0,
                           max_s: float | None = None) -> float:
    """Repetition period of a repeated keyed message from the envelope
    autocorrelation (the operator's 'same message every N seconds'
    knowledge, automated).  Returns the period in seconds."""
    e = np.asarray(envelope, np.float64)
    e = e - e.mean()
    n = len(e)
    size = 1 << int(np.ceil(np.log2(2 * n)))
    ac = np.fft.irfft(np.abs(np.fft.rfft(e, size)) ** 2)[:n]
    lo = int(min_s * fs)
    hi = int((max_s or (n / 2 / fs)) * fs)
    hi = min(hi, n - 1)
    if hi <= lo:
        raise ValueError("recording shorter than two repeat periods")
    k = lo + int(np.argmax(ac[lo:hi]))
    # harmonic correction: if an integer sub-multiple of the peak lag is
    # nearly as strong, the true period is the sub-multiple (the
    # autocorrelation of a repeated message peaks at every multiple)
    for div in (4, 3, 2):
        ks = k // div
        if ks >= lo and ac[ks] > 0.7 * ac[k]:
            k = ks
            break
    return k / fs


def refine_repeat_period(baseband: np.ndarray, fs: float,
                         period_s: float, search: int = 120) -> float:
    """Sample-accurate repeat period for long coherent stacks: the
    envelope autocorrelation peak is tens of samples broad, and a
    40-sample error smears a 24-repeat coherent stack by a whole dot.
    Search +/-``search`` samples around the estimate for the period
    that maximises the coherent stack's power."""
    z = np.asarray(baseband)
    p0 = int(round(period_s * fs))
    best_p, best_s = p0, -1.0
    for p in range(max(p0 - search, 16), p0 + search + 1):
        reps = len(z) // p
        if reps < 2:
            continue
        st = z[: reps * p].reshape(reps, p).mean(axis=0)
        score = float(np.mean(np.abs(st) ** 2))
        if score > best_s:
            best_s, best_p = score, p
    return best_p / fs


def stack_repeats(baseband: np.ndarray, fs: float, period_s: float,
                  coherent: bool = False) -> np.ndarray:
    """Average repeats of a period-``period_s`` message.

    Incoherent (default): average of per-repeat POWER envelopes — the
    QRSS deep-integration regime (z_MORSE_DECODING.txt; the reference
    reads such signals off multi-minute waterfall averages).  Gains
    ~5·log10(N) dB of envelope SNR per N repeats without any carrier
    phase requirement.

    Coherent: complex mean across repeats (requires the AFC-locked
    carrier to stay phase-stable over the whole recording; 10·log10(N)
    when it does).  Returns one period: envelope power (incoherent) or
    complex baseband (coherent).
    """
    z = np.asarray(baseband)
    per = int(round(period_s * fs))
    reps = len(z) // per
    if reps < 2:
        raise ValueError("need at least two repeats to stack")
    blocks = z[: reps * per].reshape(reps, per)
    if coherent:
        return blocks.mean(axis=0)
    return (np.abs(blocks) ** 2).mean(axis=0)


def decode_stacked(baseband: np.ndarray, fs: float, period_s: float,
                   wpm_hint: float = 0.0,
                   coherent: bool = False) -> "DecodeResult":
    """Decode a repeated message from its stack and run the Viterbi
    grammar decoder on the result.

    Incoherent (default): average of per-repeat power envelopes with
    the noise pedestal subtracted — ~5·log10(N) dB of gain, no phase
    requirement.  Coherent: complex mean (10·log10(N) dB when the
    AFC-locked carrier is phase-stable across the recording — the EME
    coherent-averaging regime, z_MORSE_DECODING.txt / coherent.c)."""
    if coherent:
        # keep the COMPLEX stack: decode_morse_ml's coherent Viterbi
        # scorer then matched-filters every candidate element on the
        # stacked baseband (phase survives the coherent average)
        zs = stack_repeats(baseband, fs, period_s, coherent=True)
        return decode_morse_ml(np.concatenate([zs, zs]), fs,
                               wpm_hint=wpm_hint)
    else:
        pwr = stack_repeats(baseband, fs, period_s, coherent=False)
        # the incoherent stack carries the mean noise power as a
        # pedestal; subtract the space-level estimate so mark/space
        # contrast survives (the reference's waterfall reading does the
        # same via its noise floor normalisation)
        pedestal = float(np.percentile(pwr, 30.0))
        amp = np.sqrt(np.maximum(pwr - pedestal, 0.0))
    # tile twice so a message not aligned to the period boundary is
    # still contiguous somewhere; the decoder's word gaps absorb the
    # duplicate
    return decode_morse_ml(np.concatenate([amp, amp]), fs,
                           wpm_hint=wpm_hint)
