"""Calibration: amplitude/phase response correction and I/Q balance.

TPU-native re-design of the reference calibration subsystem
(calibrate.c / caliq.c / calsub.c; procedure notes z_CALIBRATE.txt):

1. **Amplitude+phase calibration** (``cal_filtercorr`` calibrate.c:376,
   ``final_filtercorr_init`` calibrate.c:50): a pulse generator feeds
   the antenna input; averaged pulse spectra measure the analog
   response H(f); the correction ``fft1_filtercorr = desired(f)/H(f)``
   makes the total response flat with linear phase.  Applied as the
   per-bin complex multiply in fft1_c (ops/fft1.py).

2. **I/Q balance calibration** (``contract_foldcorr``/``expand_foldcorr``
   caliq.c:40-150, ``write_iq_foldcorr`` caliq.c:152): direct-conversion
   gain/phase imbalance leaks a mirror image; the correction is the
   widely-linear per-bin operation  X'[k] = X[k] - c[k]*conj(X[-k]).
   The reference stores c compressed to ``bal_segments`` smooth segments
   (the contract/expand pair); here the same smoothing is a segment
   average + interpolation.

Persistence mirrors the reference's per-mode dsp_<mode>_corr /
dsp_<mode>_iqcorr files (z_CALIBRATE.txt:24-55) as .npz.
"""

from __future__ import annotations

import numpy as np

from .geometry import Geometry


# ---------------------------------------------------------------------------
# amplitude / phase (filtercorr)
# ---------------------------------------------------------------------------

def measure_response(pulse_iq: np.ndarray, geo: Geometry,
                     threshold_rel: float = 0.3) -> np.ndarray:
    """Estimate the system frequency response from a pulse-train
    recording (the cal_iqdata accumulation of calibrate.c).

    pulse_iq: (n, C) complex64 recording of the calibration pulse
    generator.  Pulses are located by envelope peaks, windows of
    fft1_size around each pulse are averaged coherently (aligned to the
    strongest sample, phase-normalised), and the averaged spectrum is
    the response estimate.  Returns (fft1_size, C) complex128."""
    x = np.asarray(pulse_iq)
    if x.ndim == 1:
        x = x[:, None]
    n, c = x.shape
    size = geo.fft1_size
    env = np.abs(x).sum(axis=1)
    thr = threshold_rel * env.max()
    resp = np.zeros((size, c), np.complex128)
    count = 0
    i = size
    while i < n - size:
        if env[i] > thr and env[i] == env[i - size // 4: i + size // 4].max():
            seg = x[i - size // 2: i + size // 2]
            spec = np.fft.fft(np.fft.ifftshift(seg, axes=0), axis=0)
            # normalise the phase so pulses average coherently
            ref = spec[1].copy()
            ref /= np.maximum(np.abs(ref), 1e-30)
            resp += spec * np.conj(ref)[None, :]
            count += 1
            i += size
        else:
            i += 1
    if count == 0:
        raise ValueError("no calibration pulses found")
    return resp / count


def make_filtercorr(response: np.ndarray, desired: np.ndarray | None = None,
                    max_boost: float = 10.0) -> np.ndarray:
    """filtercorr = desired / response with bounded gain
    (final_filtercorr_init, calibrate.c:50; the desired response is the
    target passband, z_CALIBRATE.txt:12-17)."""
    h = np.asarray(response, np.complex128)
    if h.ndim == 1:
        h = h[:, None]
    if desired is None:
        desired = np.ones(h.shape[0])
    mag = np.abs(h)
    ref = np.median(mag[mag > 0.01 * mag.max()])
    floor = ref / max_boost
    corr = desired[:, None] * ref / np.where(mag < floor, np.inf, h)
    corr[~np.isfinite(corr)] = 0.0
    return corr.astype(np.complex64)


# ---------------------------------------------------------------------------
# I/Q balance (foldcorr)
# ---------------------------------------------------------------------------

def estimate_iq_balance(iq: np.ndarray, geo: Geometry,
                        bal_segments: int = 8) -> np.ndarray:
    """Estimate the per-bin image-leakage coefficient c[k].

    For a gain/phase-imbalanced direct-conversion receiver,
    X[k] = S[k] + c[k]*conj(S[-k]); with uncorrelated spectrum content
    the leakage is  c[k] = E{X[k] X[-k]} / E{|X[-k]|^2}  (the
    correlation the reference accumulates in its iq calibration run,
    caliq.c).  Returns (fft1_size, C) complex64, smoothed to
    ``bal_segments`` segments like contract_foldcorr (caliq.c:81-150).
    """
    x = np.asarray(iq)
    if x.ndim == 1:
        x = x[:, None]
    size = geo.fft1_size
    c = x.shape[1]
    nfr = x.shape[0] // size
    frames = x[: nfr * size].reshape(nfr, size, c)
    win = np.hanning(size)[None, :, None]
    spec = np.fft.fft(frames * win, axis=1)
    mirror = np.conj(spec[:, (-np.arange(size)) % size, :])
    # with X[k] = a S[k] + b conj(S[-k]):
    #   E{X[k] X[-k]}        = a b (P_k + P_-k)
    #   E{|X[k]|^2+|X[-k]|^2} ~ |a|^2 (P_k + P_-k)
    # so c = b/conj(a) = E{X[k] X[-k]} / E{|X[k]|^2 + |X[-k]|^2}
    # (the symmetric leakage appears in both factors, hence the joint
    # normaliser — a plain /E{|X[-k]|^2} over-estimates c by 2)
    num = np.mean(spec * np.conj(mirror), axis=0)
    den = (np.mean(np.abs(spec) ** 2, axis=0)
           + np.mean(np.abs(mirror) ** 2, axis=0))
    cc = num / np.maximum(den, 1e-30)
    # segment smoothing (contracted representation)
    seg = max(1, size // bal_segments)
    out = np.empty_like(cc)
    for s in range(0, size, seg):
        out[s: s + seg] = cc[s: s + seg].mean(axis=0, keepdims=True)
    return out.astype(np.complex64)


def apply_iq_correction(spec: np.ndarray, c: np.ndarray) -> np.ndarray:
    """X'[k] = X[k] - c[k] * conj(X[-k])  (expand_foldcorr application).

    spec: (..., fft1_size, C); c: (fft1_size, C)."""
    size = c.shape[0]
    mirror = np.conj(spec[..., (-np.arange(size)) % size, :])
    return spec - c * mirror


def iq_imbalance(iq: np.ndarray, gain: float, phase_rad: float
                 ) -> np.ndarray:
    """Apply a synthetic I/Q gain+phase imbalance (test utility — the
    impairment the calibration corrects)."""
    i = np.real(iq)
    q = np.imag(iq)
    q2 = gain * (np.cos(phase_rad) * q + np.sin(phase_rad) * i)
    return (i + 1j * q2).astype(np.complex64)


# ---------------------------------------------------------------------------
# persistence (dsp_<mode>_corr analogs)
# ---------------------------------------------------------------------------

def save_calibration(path: str, filtercorr: np.ndarray | None = None,
                     iq_corr: np.ndarray | None = None) -> None:
    data = {}
    if filtercorr is not None:
        data["filtercorr"] = filtercorr
    if iq_corr is not None:
        data["iq_corr"] = iq_corr
    np.savez(path, **data)


def load_calibration(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
