"""Web GUI server (io/httpd.py — the html_server.c/httpd.c analog)."""

import json
import struct
import urllib.request

import numpy as np
import pytest

from linrad_tpu.io.httpd import WebGui, grayscale_bmp


class _Out:
    """Minimal RxOutputs stand-in for the hook."""

    def __init__(self, n_bins=64, n_audio=128, rng=None):
        rng = rng or np.random.default_rng(0)
        self.fft1_power = rng.random((n_bins, 1)).astype(np.float32)
        self.fft2_power = None
        self.audio = (0.1 * rng.standard_normal((n_audio, 1))
                      ).astype(np.float32)


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.read(), r.headers.get("Content-Type")


class TestBmp:
    def test_header_and_size(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        b = grayscale_bmp(img)
        assert b[:2] == b"BM"
        size, _, _, off = struct.unpack("<IHHI", b[2:14])
        assert size == len(b)
        # 4-wide rows need no padding; 3 rows of 4 bytes
        assert len(b) - off == 12
        # bottom-up: first stored row is the last image row
        assert b[off:off + 4] == bytes(img[2])

    def test_row_padding(self):
        img = np.zeros((2, 5), np.uint8)
        b = grayscale_bmp(img)
        off = struct.unpack("<I", b[10:14])[0]
        assert len(b) - off == 2 * 8  # 5 -> padded to 8


class TestWebGui:
    @pytest.fixture()
    def gui(self):
        g = WebGui(audio_rate=8000)
        port = g.serve()
        yield g, port
        g.close()

    def test_endpoints(self, gui):
        g, port = gui
        rng = np.random.default_rng(1)
        for _ in range(5):
            g(None, _Out(rng=rng))

        body, ctype = _get(port, "/")
        assert ctype.startswith("text/html") and b"waterfall" in body

        bmp, ctype = _get(port, "/waterfall.bmp")
        assert ctype == "image/bmp" and bmp[:2] == b"BM"
        # 5 lines x 64 bins
        w, h = struct.unpack("<ii", bmp[18:26])
        assert (w, h) == (64, 5)

        spec = json.loads(_get(port, "/spectrum.json")[0])
        assert len(spec["db"]) == 64

        st = json.loads(_get(port, "/status.json")[0])
        assert st["steps"] == 5
        assert st["audio_samples"] == 5 * 128
        assert st["s_meter"].startswith("S")

        wav, ctype = _get(port, "/audio.wav")
        assert ctype == "audio/wav" and wav[:4] == b"RIFF"
        n = struct.unpack("<I", wav[40:44])[0] // 2
        assert n == 5 * 128

    def test_audio_stream_live(self, gui):
        g, port = gui
        req = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/audio.stream", timeout=5)
        hdr = req.read(44)
        assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
        g(None, _Out(n_audio=100))
        chunk = req.read(200)  # 100 samples * int16
        assert len(chunk) == 200
        req.close()

    def test_audio_ring_bounded(self):
        g = WebGui(audio_rate=1000, audio_keep_s=0.5)  # keep 500
        for _ in range(10):
            g(None, _Out(n_audio=100))
        assert 500 <= g.status()["audio_samples"] <= 600

    def test_404(self, gui):
        _, port = gui
        with pytest.raises(urllib.error.HTTPError):
            _get(port, "/nope")


class TestReceiverIntegration:
    def test_hook_on_real_receiver(self):
        """WebGui attached to a live Receiver collects real products."""
        from linrad_tpu import RxParams
        from linrad_tpu.pipeline import Receiver
        from linrad_tpu.io.siggen import Tone, tones_iq

        p = RxParams(rx_ad_speed=96_000, first_fft_bandwidth=400.0,
                     second_fft_enable=False, blanker_enable=False,
                     agc_enable=False)
        rx = Receiver(p)
        gui = WebGui()
        gui.attach(rx)
        port = gui.serve()
        try:
            n = 2 * rx.geo.samples_per_step
            iq = tones_iq(96_000.0, n, [Tone(rx.tuned_hz, 0.5)])
            for _ in rx.run(iq):
                pass
            st = json.loads(_get(port, "/status.json")[0])
            assert st["steps"] == 2
            assert st["audio_rate"] == int(
                round(rx.geo.baseband_sampling_speed))
            bmp, _ = _get(port, "/waterfall.bmp")
            assert bmp[:2] == b"BM"
        finally:
            gui.close()
