"""Failure-detection surfaces: overrun counters, heartbeat watchdog,
real-time margin (reference analogs: no_of_rx_overrun_errors
lsetad.c:1088-1096, thread_status_flag thrdef.h, z_TIMING.txt)."""

import time

import numpy as np
import pytest

from linrad_tpu.errors import LirError
from linrad_tpu.runtime.watchdog import (OverrunCounter, RealTimeMonitor,
                                         Watchdog)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestOverrunCounter:
    def test_counts_and_banner(self):
        c = OverrunCounter("RX")
        assert c.record(480) == "RX overrun error 1"
        c.record(480)
        assert c.events == 2
        assert c.units_lost == 960
        c.raise_if_over(5)         # under limit: fine
        with pytest.raises(LirError) as e:
            c.raise_if_over(1)
        assert e.value.code == 9006


class TestWatchdog:
    def test_stall_detection(self):
        clk = FakeClock()
        wd = Watchdog(timeout_s=1.0, clock=clk)
        wd.beat("fft1")
        wd.beat("blanker")
        clk.t = 0.5
        wd.beat("fft1")
        assert wd.stalled() == []
        clk.t = 1.4                # blanker age 1.4s, fft1 age 0.9s
        assert wd.stalled() == ["blanker"]
        with pytest.raises(LirError) as e:
            wd.check()
        assert e.value.code == 9005
        assert "blanker" in str(e.value)
        wd.beat("blanker")
        wd.check()                 # recovered
        wd.remove("fft1")
        clk.t = 10.0
        assert wd.stalled() == ["blanker"]

    def test_background_thread_reports_once(self):
        wd = Watchdog(timeout_s=0.05)
        hits = []
        wd.beat("rx")
        wd.start(hits.append, interval_s=0.02)
        try:
            time.sleep(0.2)
        finally:
            wd.stop()
        assert hits == [["rx"]]    # one transition report, not a flood


class TestRealTimeMonitor:
    def test_margin_accounting(self):
        clk = FakeClock()
        m = RealTimeMonitor(rate_hz=96000, headroom_s=0.25, clock=clk)
        assert not m.behind()
        m.advance(96000)           # 1 s of stream at t=0
        clk.t = 0.5
        assert m.margin_s == pytest.approx(1.0 - 0.5 + 0.25)
        m.check()
        clk.t = 1.5                # wall caught up + headroom gone
        assert m.margin_s == pytest.approx(-0.25)
        assert m.behind()
        with pytest.raises(LirError) as e:
            m.check()
        assert e.value.code == 9007

    def test_receiver_integration(self):
        from linrad_tpu import RxParams, derive_geometry
        from linrad_tpu.pipeline import Receiver

        p = RxParams(fft1_n_override=9, agc_enable=False)
        geo = derive_geometry(p)
        rx = Receiver(p)
        wd = Watchdog(timeout_s=30.0)
        mon = RealTimeMonitor(rate_hz=geo.rx_ad_speed, headroom_s=10.0)
        iq = np.zeros(2 * geo.samples_per_step, np.complex64)
        outs = list(rx.run(iq, watchdog=wd, monitor=mon))
        assert len(outs) == 2
        assert wd.stalled() == []
        assert mon.samples == 2 * geo.samples_per_step
        mon.check()
