"""Error system — numeric codes with text, raised as exceptions.

The reference maps numeric error codes to text from errors.lir (1210
lines) and any thread calling ``lirerr(code)`` triggers an orderly
teardown (lxsys.c:495-505, thread_kill_all :784).  In a functional
pipeline errors are exceptions; the numeric-code surface is kept for
familiarity and for the codes the tests/tools reference."""

from __future__ import annotations

ERROR_TEXT = {
    1002: "buffers already allocated (get_wideband_sizes re-entered)",
    1061: "out of memory for blanker arrays",
    1209: "a processing thread failed to start in time",
    1450: "input thread did not become active (no input device/data)",
    1458: "OpenCL selected but not active",
    1459: "OpenCL selected but support not compiled in",
    1460: "CUDA selected but support not compiled in",
    # framework-specific codes start at 9000
    9001: "input block size does not match samples_per_step",
    9002: "geometry not divisible by the requested shard count",
    9003: "calibration table size does not match fft1_size",
    9004: "unsupported raw-file bit depth",
    9005: "processing stalled (watchdog heartbeat timeout)",
    9006: "input overrun: data lost faster than it could be consumed",
    9007: "processing is slower than real time (margin exhausted)",
}


class LirError(RuntimeError):
    """lirerr() analog: numeric code + text."""

    def __init__(self, code: int, extra: str = ""):
        self.code = code
        text = ERROR_TEXT.get(code, "unknown error")
        super().__init__(f"error {code}: {text}"
                         + (f" ({extra})" if extra else ""))


def lirerr(code: int, extra: str = "") -> None:
    raise LirError(code, extra)
