"""Streamed TX path: disk2tx semantics and tx_total_delay accounting.

Mirrors the reference behaviors of tx.c:211-495 (file streaming with
ring prefill, EOF loop with zero-fill, pilot injection) and
tx.c:501-600 (total buffered-latency accounting across rates).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from linrad_tpu.io.wav import write_wav
from linrad_tpu.tx.stream import (SsbTxStreamer, StageBuffer, TxFormatError,
                                  TxStreamer, WavTxSource)


FS = 48_000
BLOCK = 1024


@pytest.fixture
def iq_wav(tmp_path):
    """A short IQ file: a pure tone, 3.5 blocks long (forces looping)."""
    n = int(3.5 * BLOCK)
    t = np.arange(n)
    iq = (1000.0 * np.exp(2j * np.pi * 1000.0 / FS * t)).astype(
        np.complex64)
    path = str(tmp_path / "tx.wav")
    write_wav(path, iq, FS, bits=16)
    return path, iq


def test_source_header_checks(iq_wav):
    path, _ = iq_wav
    with pytest.raises(TxFormatError):
        WavTxSource(path, expect_rate=96_000)        # tx.c:296-303
    with pytest.raises(TxFormatError):
        WavTxSource(path, expect_channels=4)         # tx.c:286-293
    src = WavTxSource(path, expect_rate=FS, expect_channels=2)
    assert src.info.sample_rate == FS


def test_source_loops_with_zero_fill(iq_wav):
    path, iq = iq_wav
    src = WavTxSource(path)
    blocks = [src.read_block(BLOCK) for _ in range(9)]
    n = len(iq)
    # blocks 0-2 are the file start; block 3 is the half block
    # zero-filled (tx.c:420-428); block 4 restarts from the top
    assert np.allclose(blocks[0], iq[:BLOCK], atol=1.5)
    tail = n - 3 * BLOCK
    assert np.allclose(blocks[3][:tail], iq[3 * BLOCK:], atol=1.5)
    assert np.all(blocks[3][tail:] == 0)
    assert np.allclose(blocks[4], iq[:BLOCK], atol=1.5)
    assert src.loops == 2


def test_streamer_prefill_pilot_and_delay(iq_wav):
    path, _ = iq_wav
    src = WavTxSource(path)
    tx = TxStreamer(src, fs=FS, block=BLOCK, ring_blocks=8,
                    pilot_hz=6000.0, pilot_level=500.0)
    # prefill = ring_blocks-2 blocks (tx.c:392-398): that IS the delay
    assert tx.txout.occupancy == 6 * BLOCK
    assert tx.total_delay() == pytest.approx(6 * BLOCK / FS)

    played = []
    tx.run(8, played.append)
    out = np.concatenate(played)
    # steady state: one in, one out -> the delay never drifts
    assert tx.total_delay() == pytest.approx(6 * BLOCK / FS)

    # pilot tone present at 6 kHz with phase continuity across blocks:
    # a discontinuity would smear the line over many bins
    spec = np.abs(np.fft.fft(out * np.hanning(len(out))))
    freqs = np.fft.fftfreq(len(out), 1.0 / FS)
    kp = np.argmin(np.abs(freqs - 6000.0))
    k1 = np.argmin(np.abs(freqs - 1000.0))
    floor = np.median(spec)
    assert spec[kp] > 100 * floor
    assert spec[k1] > 100 * floor
    # contiguous-phase pilot: neighbours 10 bins away are way down
    assert spec[kp] > 50 * spec[kp + 10]


def test_stage_buffer_accounting():
    s = StageBuffer("x", 1000.0)
    s.written += 500
    s.read += 100
    assert s.occupancy == 400
    assert s.delay_s == pytest.approx(0.4)


def test_ssb_streamer_delay_and_spectrum():
    fs_ad, fs_da = 12_000, 48_000
    tx = SsbTxStreamer(fs_ad, fs_da, block=1024)
    t = np.arange(6 * 1024)
    mic = np.sin(2 * np.pi * 700.0 / fs_ad * t).astype(np.float32)

    tx.push_mic(mic[: 3 * 1024])
    # 3 blocks buffered and unprocessed: delay = mic occupancy +
    # processor tail + streaming-Hilbert half block
    d0 = tx.total_delay()
    assert d0 == pytest.approx(3 * 1024 / fs_ad + 1024 / fs_ad)

    tx.pump()
    # mic drained into the output ring at the DA rate (4x as many
    # samples, same duration); spproc tail still held
    assert tx.mic.occupancy == 0
    assert tx.txout.occupancy == 3 * 4096
    assert tx.total_delay() == pytest.approx(
        3 * 4096 / fs_da + 1024 / fs_ad)

    blocks = []
    while (b := tx.pop_dac()) is not None:
        blocks.append(b)
    assert tx.total_delay() == pytest.approx(1024 / fs_ad)
    out = np.concatenate(blocks)
    assert len(out) == 3 * 4096

    # USB modulation: energy at +700 Hz, image rejected
    tx.push_mic(mic)
    tx.pump()
    out = np.concatenate([tx.pop_dac() for _ in range(6)])
    spec = np.abs(np.fft.fft(out[4096:] * np.hanning(len(out) - 4096)))
    freqs = np.fft.fftfreq(len(out) - 4096, 1.0 / fs_da)
    kp = np.argmin(np.abs(freqs - 700.0))
    km = np.argmin(np.abs(freqs + 700.0))
    assert spec[kp] > 30 * spec[km]


def test_streamer_rejects_tiny_ring(iq_wav):
    path, _ = iq_wav
    with pytest.raises(ValueError):
        TxStreamer(WavTxSource(path), fs=FS, block=BLOCK, ring_blocks=2)
    with pytest.raises(ValueError):
        TxStreamer(WavTxSource(path), fs=FS, block=BLOCK, ring_blocks=6)
