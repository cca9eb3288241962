"""Native runtime, raw file, and network tap tests."""

import numpy as np
import pytest

from linrad_tpu import runtime
from linrad_tpu.io.rawfile import RawInfo, read_raw, write_raw
from linrad_tpu.io import taps


class TestPacking:
    def test_native_lib_builds(self):
        # the native path should be available in this image (g++ baked in)
        assert runtime.get_lib() is not None

    def test_pack18_roundtrip_semantics(self):
        rng = np.random.default_rng(0)
        x = rng.integers(-2 ** 31, 2 ** 31 - 1, size=256,
                         dtype=np.int64).astype(np.int32)
        back = runtime.expand18(runtime.pack18(x))
        # truncated to 18 bits + the half-bit dither at bit 13
        # (csplit.c:22-30)
        expect = (x & ~np.int32(0x3FFF)) | np.int32(0x2000)
        np.testing.assert_array_equal(back, expect)

    def test_pack18_native_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.integers(-2 ** 31, 2 ** 31 - 1, size=1024,
                         dtype=np.int64).astype(np.int32)
        if runtime.get_lib() is None:
            pytest.skip("no native lib")
        native_p = runtime.pack18(x)
        # force numpy fallback
        lib = runtime._lib
        runtime._lib = None
        try:
            np_p = runtime.pack18(x)
            np.testing.assert_array_equal(native_p, np_p)
            np_e = runtime.expand18(np_p)
        finally:
            runtime._lib = lib
        np.testing.assert_array_equal(runtime.expand18(native_p), np_e)

    def test_pack24_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-2 ** 31, 2 ** 31 - 1, size=333,
                         dtype=np.int64).astype(np.int32)
        back = runtime.expand24(runtime.pack24(x))
        np.testing.assert_array_equal(back, x & ~np.int32(0xFF))

    def test_i16_to_f32(self):
        x = np.array([-32768, -1, 0, 1, 32767], np.int16)
        y = runtime.i16_to_f32(x, scale=2.0)
        np.testing.assert_allclose(y, x.astype(np.float32) * 2.0)


class TestRing:
    def test_ring_roundtrip(self):
        r = runtime.Ring(1 << 16)
        data = bytes(range(256)) * 10
        r.write(data)
        assert r.read(len(data)) == data
        r.close()

    def test_prefetcher(self, tmp_path):
        path = str(tmp_path / "x.bin")
        payload = np.arange(65536, dtype=np.uint8).tobytes()
        with open(path, "wb") as f:
            f.write(payload)
        pf = runtime.FilePrefetcher(path, block_bytes=4096)
        if runtime.get_lib() is not None:
            # the disk->ring path must be the native C++ thread
            assert pf._h is not None
        got = b""
        while True:
            b = pf.read_block()
            got += b
            if len(b) < 4096:
                break
        assert got == payload

    def test_prefetcher_early_abandon(self, tmp_path):
        """Dropping the prefetcher mid-stream must not hang or leak the
        native reader thread (close unblocks the writer, join reaps)."""
        path = str(tmp_path / "big.bin")
        with open(path, "wb") as f:
            f.write(b"\x01" * (1 << 22))
        pf = runtime.FilePrefetcher(path, block_bytes=4096,
                                    ring_bytes=1 << 14)
        assert len(pf.read_block()) == 4096   # ring is now full/filling
        del pf                                # __del__ joins the thread


class TestRawFile:
    @pytest.mark.parametrize("bits,tol", [(16, 1e-4), (18, 3e-5),
                                          (24, 1e-6)])
    def test_roundtrip(self, tmp_path, bits, tol):
        rng = np.random.default_rng(3)
        iq = (rng.normal(size=(4096, 1)) + 1j * rng.normal(size=(4096, 1))
              ).astype(np.complex64) * 0.3
        path = str(tmp_path / f"t{bits}.raw")
        write_raw(path, iq, 96_000, bits=bits, full_scale=2.0)
        back, info = read_raw(path)
        assert info.bits == bits and info.sample_rate == 96_000
        err = np.abs(back - iq).max()
        assert err < tol * 2.0, err

    def test_headerless(self, tmp_path):
        # reference-style payload without header
        iq = (np.ones((256, 1)) * (0.5 + 0.25j)).astype(np.complex64)
        path = str(tmp_path / "h.raw")
        write_raw(path, iq, 48_000, bits=16)
        with open(path, "rb") as f:
            f.read(8)
            import struct as _s
            (hl,) = _s.unpack("<I", f.read(4))
            f.read(hl)
            payload = f.read()
        path2 = str(tmp_path / "nohdr.raw")
        with open(path2, "wb") as f:
            f.write(payload)
        back, _ = read_raw(path2, headerless=RawInfo(48_000, 1, 16))
        np.testing.assert_allclose(back.real, 0.5, atol=1e-3)


class TestTaps:
    def test_multicast_loopback(self):
        try:
            tx = taps.TapSender(taps.TAP_BASEB)
            rx = taps.TapReceiver(taps.TAP_BASEB, timeout=2.0)
        except OSError:
            pytest.skip("multicast unavailable in sandbox")
        data = np.arange(taps.PAYLOAD_BYTES // 4 * 3, dtype=np.float32)
        tx.header.passband_center = 144.1
        tx.send(data)
        got = rx.recv_array(data.nbytes)
        if not np.any(got):
            pytest.skip("multicast loopback not routed in sandbox")
        np.testing.assert_array_equal(got, data)
        tx.close()
        rx.close()

    def test_control_plane(self):
        try:
            srv = taps.ControlServer(
                {"FREQ": lambda a: f"OK {float(a) + 1}"} , port=0)
        except OSError:
            pytest.skip("sockets unavailable")
        try:
            reply = taps.control_request("FREQ", "144.0",
                                         port=srv.port)
            assert reply == "OK 145.0"
        finally:
            srv.close()
