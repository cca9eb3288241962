"""ctypes interface to the headless reference DSP core (libref.so).

``RefChain`` wraps setup/feed/run; array accessors return numpy views
into the reference's live buffers.  See build.py for what is compiled.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .build import REF, build_libref

# globdef.h constants
MODE_WCW = 0
MODE_SSB = 3
MODE_AM = 5
DWORD_INPUT = 1
TWO_CHANNELS = 2
IQ_DATA = 4

# genparm indices (globdef.h:288-326)
FIRST_FFT_BANDWIDTH = 0
FIRST_FFT_SINPOW = 1
FIRST_FFT_VERNR = 2
SECOND_FFT_ENABLE = 8
SELLIM_MAXLEVEL = 10
FIRST_BCKFFT_ATT_N = 11
SECOND_FFT_NINC = 12
SECOND_FFT_SINPOW = 13
AFC_ENABLE = 17
MIX1_BANDWIDTH_REDUCTION_N = 23
THIRD_FFT_SINPOW = 25
DA_OUTPUT_SPEED = 28


def available() -> bool:
    return os.path.isdir(REF)


_lib = None


def load():
    global _lib
    if _lib is not None:
        return _lib
    # the reference reads/writes its par_* parameter files in the
    # process cwd (read_modepar_file modesub.c:789); run it from a
    # scratch dir so test/bench runs never litter the repo root
    # (VERDICT r4 #8).  One stable per-user dir (not a fresh mkdtemp
    # per process — those would leak) and a process-global chdir: no
    # repo code depends on a relative cwd (grep-verified; pytest and
    # bench use absolute paths throughout), and the reference writes
    # par_* files at arbitrary later times so a scoped chdir/restore
    # around each call would not contain them.
    import tempfile
    scratch = os.path.join(tempfile.gettempdir(),
                           f"linrad_refharness_cwd_{os.getuid()}")
    os.makedirs(scratch, exist_ok=True)
    os.chdir(scratch)
    lib = ctypes.CDLL(build_libref())
    lib.ref_setup.restype = ctypes.c_int
    lib.ref_setup.argtypes = [ctypes.c_int] * 9
    lib.ref_teardown.restype = None
    lib.ref_set_genparm.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ref_set_hg.argtypes = [ctypes.c_char_p, ctypes.c_double]
    lib.ref_set_wg.argtypes = [ctypes.c_char_p, ctypes.c_double]
    lib.ref_set_bg.argtypes = [ctypes.c_char_p, ctypes.c_double]
    lib.ref_get_hg.argtypes = [ctypes.c_char_p]
    lib.ref_get_hg.restype = ctypes.c_double
    lib.ref_geo.restype = ctypes.c_long
    lib.ref_geo.argtypes = [ctypes.c_char_p]
    lib.ref_geof.restype = ctypes.c_double
    lib.ref_geof.argtypes = [ctypes.c_char_p]
    lib.ref_array.restype = ctypes.c_void_p
    lib.ref_array.argtypes = [ctypes.c_char_p]
    lib.ref_feed.argtypes = [
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.ref_run_wideband.restype = ctypes.c_int
    lib.ref_tune.restype = ctypes.c_int
    lib.ref_tune.argtypes = [ctypes.c_double]
    lib.ref_run_narrowband.restype = ctypes.c_int
    lib.ref_consume_audio.restype = ctypes.c_long
    lib.ref_consume_audio.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.ref_run_output.restype = ctypes.c_int
    lib.ref_consume_daout.restype = ctypes.c_long
    lib.ref_consume_daout.argtypes = [
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.ref_fftforward.restype = ctypes.c_int
    lib.ref_fftforward.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int]
    lib.ref_fftback.restype = ctypes.c_int
    lib.ref_fftback.argtypes = lib.ref_fftforward.argtypes
    lib.ref_fft_real_to_hermitian.restype = ctypes.c_int
    lib.ref_fft_real_to_hermitian.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int]
    lib.ref_set_var.restype = ctypes.c_int
    lib.ref_set_var.argtypes = [ctypes.c_char_p, ctypes.c_double]
    lib.ref_get_var.restype = ctypes.c_double
    lib.ref_get_var.argtypes = [ctypes.c_char_p]
    lib.ref_update_liminfo.restype = ctypes.c_int
    lib.ref_set_liminfo_auto.argtypes = [ctypes.c_int]
    lib.ref_set_pretend_calamp.argtypes = [ctypes.c_int]
    lib.ref_enable_cw_decode.argtypes = [ctypes.c_int]
    lib.ref_enable_spurs.argtypes = [ctypes.c_int]
    lib.ref_spur_scan.restype = ctypes.c_int
    lib.ref_spur_get.restype = ctypes.c_double
    lib.ref_spur_get.argtypes = [ctypes.c_char_p]
    lib.ref_spur_list.restype = ctypes.c_long
    lib.ref_spur_list.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.ref_cw_collect.restype = ctypes.c_int
    lib.ref_cw_collect.argtypes = [ctypes.c_double]
    lib.ref_cw_keying_eval.restype = ctypes.c_double
    lib.ref_cw_speed.restype = ctypes.c_int
    lib.ref_cw_speed.argtypes = [ctypes.c_double]
    lib.ref_cw_get.restype = ctypes.c_double
    lib.ref_cw_get.argtypes = [ctypes.c_char_p]
    lib.ref_cw_dashes.restype = ctypes.c_long
    lib.ref_cw_dashes.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    _lib = lib
    return lib


class RefChain:
    """One configured instance of the reference receiver chain.

    Only one configuration can be live per process (the reference keeps
    all state in globals); re-instantiating reconfigures in place.
    """

    def __init__(self, mode=MODE_SSB, ad_speed=96000, input_mode=IQ_DATA,
                 rf_channels=1, second_fft=0, fft1_bw_centihz=0,
                 fft1_vernr=2, sinpow=2, afc_enable=0, cw_decode=False,
                 max_spurs=0):
        self.lib = load()
        # CW buffers are allocated only when CW_DECODE_ENABLE is set at
        # buffer-allocation time (baseb_graph.c:746) and require AFC
        # (buf.c:840) — must be decided before ref_setup.
        self.lib.ref_enable_cw_decode(1 if cw_decode else 0)
        if cw_decode:
            afc_enable = 1
        # spur machinery likewise (buf.c:837 zeroes MAX_NO_OF_SPURS
        # without AFC; afc_enable=2 is auto spur search)
        self.lib.ref_enable_spurs(int(max_spurs))
        if max_spurs and not afc_enable:
            afc_enable = 2
        # the reference graph-init code reads par_<mode>_* files from cwd
        # if present (wide_graph.c:1675 read_modepar_file) and writes them
        # on setup — remove leftovers so every setup uses defaults and
        # test behavior never depends on a previous run's litter.
        import glob
        for base in ("par_wcw", "par_hsms", "par_ssb", "par_fm", "par_am",
                     "par_qrss", "par_txtest", "par_wse", "par_radar",
                     "par_userdef"):
            for f in glob.glob(base + "*"):
                try:
                    os.remove(f)
                except OSError:
                    pass
        rc = self.lib.ref_setup(mode, ad_speed, input_mode, rf_channels,
                                second_fft, fft1_bw_centihz, fft1_vernr,
                                sinpow, afc_enable)
        if rc != 0:
            raise RuntimeError(f"ref_setup failed rc={rc}")
        self.rf_channels = rf_channels
        self.ad_speed = ad_speed
        self.second_fft = second_fft

    # ---- scalars ----
    def geo(self, name: str) -> int:
        v = self.lib.ref_geo(name.encode())
        if v == -999999:
            raise KeyError(name)
        return int(v)

    def geof(self, name: str) -> float:
        v = self.lib.ref_geof(name.encode())
        if v == -999999.0:
            raise KeyError(name)
        return float(v)

    def set_genparm(self, idx: int, val: int):
        self.lib.ref_set_genparm(idx, val)

    def set_hg(self, name: str, val: float):
        if self.lib.ref_set_hg(name.encode(), float(val)) != 0:
            raise KeyError(name)

    def set_wg(self, name: str, val: float):
        if self.lib.ref_set_wg(name.encode(), float(val)) != 0:
            raise KeyError(name)

    def set_bg(self, name: str, val: float):
        if self.lib.ref_set_bg(name.encode(), float(val)) != 0:
            raise KeyError(name)

    # ---- arrays ----
    def array(self, name: str, count: int, dtype=np.float32) -> np.ndarray:
        ptr = self.lib.ref_array(name.encode())
        if not ptr:
            raise KeyError(name)
        buf = (ctypes.c_char * (count * np.dtype(dtype).itemsize)
               ).from_address(ptr)
        return np.frombuffer(buf, dtype=dtype, count=count)

    # ---- drive ----
    def feed_iq(self, iq: np.ndarray):
        """Feed complex IQ as interleaved int16 (I,Q per channel)."""
        if iq.ndim == 1:
            iq = iq[:, None]
        n, ch = iq.shape
        words = np.empty((n, 2 * ch), np.int16)
        re = np.clip(np.round(iq.real), -32768, 32767).astype(np.int16)
        im = np.clip(np.round(iq.imag), -32768, 32767).astype(np.int16)
        words[:, 0::2] = re
        words[:, 1::2] = im
        flat = np.ascontiguousarray(words.reshape(-1))
        self.lib.ref_feed(flat, flat.size)

    def run_wideband(self) -> int:
        rc = self.lib.ref_run_wideband()
        if rc < 0:
            raise RuntimeError(f"ref_run_wideband err {rc}")
        return rc

    def set_var(self, name: str, val: float):
        if self.lib.ref_set_var(name.encode(), float(val)) != 0:
            raise KeyError(name)

    def get_var(self, name: str) -> float:
        v = self.lib.ref_get_var(name.encode())
        if v == -999999.0:
            raise KeyError(name)
        return float(v)

    def update_liminfo(self):
        rc = self.lib.ref_update_liminfo()
        if rc != 0:
            raise RuntimeError(f"ref_update_liminfo err {rc}")

    def set_liminfo_auto(self, on: bool):
        self.lib.ref_set_liminfo_auto(1 if on else 0)

    def timf2_stream(self, npoints: int, start: int = 0) -> np.ndarray:
        """timf2 as (npoints, 2, channels) complex64 [weak, strong] —
        the 4*channels floats-per-point layout (timf2.c fp_finish)."""
        ch = self.rf_channels
        raw = self.array("timf2_float", (start + npoints) * 4 * ch)
        pts = raw[start * 4 * ch:].reshape(npoints, 2 * ch, 2)
        z = (pts[:, :, 0] + 1j * pts[:, :, 1]).astype(np.complex64)
        # per point: weak ch0 [, weak ch1], strong ch0 [, strong ch1]
        return z.reshape(npoints, 2, ch)

    def tune(self, hz: float):
        rc = self.lib.ref_tune(float(hz))
        if rc != 0:
            raise RuntimeError(f"ref_tune failed rc={rc}")

    def run_narrowband(self):
        rc = self.lib.ref_run_narrowband()
        if rc != 0:
            raise RuntimeError(f"ref_run_narrowband err {rc}")

    def consume_audio(self, max_points=1 << 20) -> np.ndarray:
        buf = np.empty((max_points, 2), np.float32)
        n = self.lib.ref_consume_audio(buf.reshape(-1), max_points)
        return buf[:n]

    def run_output(self):
        """Drive the D/A output stage (make_audio_signal rxout.c:970):
        fractional resampling to DA_OUTPUT_SPEED, AGC gain, BFO product,
        int conversion into daout."""
        rc = self.lib.ref_run_output()
        if rc != 0:
            raise RuntimeError(f"ref_run_output err {rc}")

    def consume_daout(self, max_frames=1 << 19) -> np.ndarray:
        """Drain the D/A ring as (n, 2) int16 L/R frames."""
        buf = np.empty((max_frames, 2), np.int16)
        n = self.lib.ref_consume_daout(buf.reshape(-1), max_frames)
        return buf[:n]

    # ---- machine-Morse front end (see ref_api.c CW driver block) ----
    def cw_collect(self, bitpts: float = 0.0) -> bool:
        """Extend the key-up/key-down ramp over new baseband data, as
        the CWDETECT_CLEARED tick does (coherent.c:290-297); updates
        cwbit_pts first when a positive estimate is given.  Returns
        False when the reference's unbounded ramp walk SPUN (alarm
        guard fired, ref_api.c) — a recordable result at low SNR."""
        rc = self.lib.ref_cw_collect(float(bitpts))
        if rc == -2:
            return False
        if rc != 0:
            raise RuntimeError(f"ref_cw_collect err {rc}")
        return True

    def cw_keying_eval(self) -> float:
        """cwbit length estimate (baseband points) from the accumulated
        keying spectrum, or -1 if nothing accumulated."""
        return float(self.lib.ref_cw_keying_eval())

    def cw_speed(self, bitpts: float) -> int:
        """Run the detect_cw_speed flow from a cwbit guess; returns the
        resulting cw_detect_flag (5 == CWDETECT_WAVEFORM_ESTABLISHED,
        4 == CWDETECT_ERROR, sigdef.h:5-16) or -2 if the reference
        SPUN in one of its unbounded walks (alarm guard)."""
        rc = self.lib.ref_cw_speed(float(bitpts))
        if rc == -2:
            return -2
        if rc < 0:
            raise RuntimeError(f"ref_cw_speed err {rc}")
        return rc

    def cw_get(self, name: str) -> float:
        v = self.lib.ref_cw_get(name.encode())
        if v == -999999.0:
            raise KeyError(name)
        return float(v)

    def cw_dashes(self, maxn: int = 4096):
        mid = np.empty(maxn, np.float32)
        ln = np.empty(maxn, np.int32)
        n = self.lib.ref_cw_dashes(mid, ln, maxn)
        return mid[:n], ln[:n]

    # ---- spur canceller (ref_api.c spur driver block) ----
    def spur_scan(self) -> int:
        """One bounded auto-search pass (spur_removal wcw.c:209-236);
        returns the number of locked spurs."""
        rc = self.lib.ref_spur_scan()
        if rc < 0:
            raise RuntimeError(f"ref_spur_scan err {rc}")
        return rc

    def spur_get(self, name: str) -> float:
        v = self.lib.ref_spur_get(name.encode())
        if v == -999999.0:
            raise KeyError(name)
        return float(v)

    def spur_list(self, maxn: int = 512):
        loc = np.empty(maxn, np.int32)
        freq = np.empty(maxn, np.float32)
        flag = np.empty(maxn, np.int32)
        ampl = np.empty(maxn, np.float32)
        n = self.lib.ref_spur_list(loc, freq, flag, ampl, maxn)
        return loc[:n], freq[:n], flag[:n], ampl[:n]

    # ---- spectra ----
    def fft1_spectra(self, count: int) -> np.ndarray:
        """The most recent `count` fft1 transforms as complex
        (count, channels, fft1_size)."""
        size = self.geo("fft1_size")
        block = self.geo("fft1_block")
        na = self.geo("fft1_na")
        maxn = self.geo("max_fft1n")
        raw = self.array("fft1_float", maxn * block)
        out = np.empty((count, self.rf_channels, size), np.complex64)
        for i in range(count):
            n = (na - count + i) % maxn
            blk = raw[n * block:(n + 1) * block]
            c = blk.reshape(size, 2 * self.rf_channels)
            for ch in range(self.rf_channels):
                out[i, ch] = c[:, 2 * ch] + 1j * c[:, 2 * ch + 1]
        return out
