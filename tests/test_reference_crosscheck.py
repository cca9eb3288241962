"""Bit-exact cross-checks against the reference implementation.

These tests compile tiny harnesses around actual reference source (read
from /root/reference at test time — nothing is copied into the
framework) and compare outputs bit-for-bit with our implementations.
Skipped when the reference tree is not present."""

import os
import subprocess
import textwrap

import numpy as np
import pytest

from linrad_tpu import runtime

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def test_expand18_matches_reference(tmp_path):
    """Our expand18 must reproduce expand_rawdat (csplit.c:20-70) bit
    for bit, including the 0x20 half-bit dither byte layout."""
    harness = textwrap.dedent("""
        #include <stdio.h>
        #include <stdlib.h>
        #include <string.h>
        // minimal globals the reference routine references
        unsigned char *timf1_char;
        unsigned char *rawsave_tmp;
        int timf1p_pa = 0;
        int rx_read_bytes;
        // reference expand_rawdat body, compiled from the mounted tree
        #define LINRAD_EXPAND_ONLY 1
        %s
        int main(int argc, char **argv) {
            FILE *fi = fopen(argv[1], "rb");
            FILE *fo = fopen(argv[2], "wb");
            fseek(fi, 0, SEEK_END);
            long packed = ftell(fi);
            fseek(fi, 0, SEEK_SET);
            rawsave_tmp = malloc(packed);
            fread(rawsave_tmp, 1, packed, fi);
            long samples = packed / 9 * 4;
            rx_read_bytes = (int)(samples * 4);
            timf1_char = malloc(rx_read_bytes);
            expand_rawdat();
            fwrite(timf1_char, 1, rx_read_bytes, fo);
            return 0;
        }
    """)
    # extract just expand_rawdat from csplit.c (self-contained function)
    src = open(os.path.join(REF, "csplit.c")).read()
    start = src.index("void expand_rawdat(void)")
    depth = 0
    i = src.index("{", start)
    j = i
    while True:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                break
        j += 1
    fn = src[start: j + 1]
    c_path = tmp_path / "harness.c"
    c_path.write_text(harness % fn)
    exe = tmp_path / "harness"
    subprocess.run(["gcc", "-O2", "-o", str(exe), str(c_path)],
                   check=True, capture_output=True)

    rng = np.random.default_rng(0)
    samples = rng.integers(-2 ** 31, 2 ** 31 - 1, size=1024,
                           dtype=np.int64).astype(np.int32)
    packed = runtime.pack18(samples)
    pin = tmp_path / "in.bin"
    pout = tmp_path / "out.bin"
    pin.write_bytes(packed.tobytes())
    subprocess.run([str(exe), str(pin), str(pout)], check=True)
    ref_out = np.frombuffer(pout.read_bytes(), np.int32)
    ours = runtime.expand18(packed)
    np.testing.assert_array_equal(ours, ref_out)


def test_window_formula_matches_reference_constants():
    """Interleave ratios the reference hard-codes (buf.c:113-137)."""
    from linrad_tpu import interleave_ratio
    # values from make_interleave_ratio: N=2 -> 0.5 exactly, N=8 -> 0.8,
    # N=9 -> 0.625
    assert interleave_ratio(2) == pytest.approx(0.5)
    assert interleave_ratio(8) == 0.8
    assert interleave_ratio(9) == 0.625
