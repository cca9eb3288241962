"""Build the reference DSP core into a headless shared library.

Compiles the *mounted* reference tree's DSP sources (nothing is copied
into this repo) together with our glue/stubs file ``ref_api.c`` into
``libref.so``, loaded via ctypes.  This is the verification backend for
the golden-parity tests: the acceptance criterion is audio/spectrum
parity of linrad_tpu against output produced by this exact reference
code (SURVEY.md §4, BASELINE.md north star).

Reference entry points used (file:line):
  get_wideband_sizes   buf.c:139     geometry derivation
  get_buffers          buf.c:868     arena allocation + tables
  init_blanker         buf.c:1771    reference-pulse bank
  fft1_b / fft1_c      fft1.c:3302/4085
  fft1_update_liminfo  sellim.c:738
  make_timf2           timf2.c:31
  first_noise_blanker  blank1.c:684
  make_fft2            fft2.c:52
  do_mix1              mix1.c:55
  make_fft3_all        fft3.c:215
  fft3_mix2            mix2.c:83
"""

from __future__ import annotations

import hashlib
import os
import subprocess

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
API_C = os.path.join(HERE, "ref_api.c")

# Reference translation units that form the headless DSP core.  GUI,
# drivers, platform and main() files are excluded; the lir_* primitives
# they would provide are stubbed in ref_api.c.
REF_SOURCES = [
    # compute kernels + wideband chain
    "fft0", "fft1", "fft1_re", "fft1var", "fft2", "fft2var",
    "sellim", "selvar", "timf2", "blank1", "blnkvar",
    # narrowband chain
    "mix1", "fft3", "fft3var", "mix2", "fm",
    # weak-signal layer
    "llsq", "llsqvar", "spur", "spursub", "afcsub", "afc_graph",
    "coherent", "cohsub", "cwdetect", "cwspeed", "morse",
    # calibration
    "calibrate", "caliq", "calsub", "calsub2", "calvar",
    # runtime/geometry + orchestration helpers
    "buf", "modesub", "wcw", "csplit", "timing", "rxout",
    # graphs that own DSP parameters / sizes (headless via stubs)
    "wide_graph", "hires_graph", "baseb_graph", "pol_graph",
    "meter_graph", "coh_osc", "siganal_graph", "allan_graph",
    "freq_control", "eme",
    # global-definition files
    "uivar", "sigvar", "thrvar", "screenvar", "txvar", "powtvar",
    "keyboard_var", "sdrvar", "pavar",
]

CFLAGS = ["-O2", "-fPIC", "-DOSNUM=1", "-DCPU=CPU_INTEL", "-DIA64=1",
          "-w", f"-I{REF}"]


def _digest() -> str:
    h = hashlib.sha256()
    h.update(open(API_C, "rb").read())
    for s in REF_SOURCES:
        p = os.path.join(REF, s + ".c")
        st = os.stat(p)
        h.update(f"{s}:{st.st_mtime_ns}:{st.st_size};".encode())
    h.update(" ".join(CFLAGS).encode())
    return h.hexdigest()[:16]


def build_libref() -> str:
    """Compile (cached) and return the path to libref.so."""
    if not os.path.isdir(REF):
        raise FileNotFoundError(REF)
    tag = _digest()
    outdir = os.path.join("/tmp", f"linrad_refharness_{tag}")
    so = os.path.join(outdir, "libref.so")
    if os.path.exists(so):
        return so
    os.makedirs(outdir, exist_ok=True)
    objs = []
    procs = []
    for s in REF_SOURCES + ["ref_api"]:
        src = API_C if s == "ref_api" else os.path.join(REF, s + ".c")
        obj = os.path.join(outdir, s + ".o")
        objs.append(obj)
        procs.append((s, subprocess.Popen(
            ["gcc", *CFLAGS, "-c", src, "-o", obj],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)))
    errs = []
    for s, p in procs:
        _, err = p.communicate()
        if p.returncode != 0:
            errs.append(f"--- {s}.c ---\n{err.decode()[:2000]}")
    if errs:
        raise RuntimeError("refharness compile failed:\n" + "\n".join(errs))
    r = subprocess.run(["gcc", "-shared", "-o", so, *objs, "-lm"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("refharness link failed:\n" + r.stderr[:4000])
    return so


if __name__ == "__main__":
    print(build_libref())
