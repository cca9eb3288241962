"""Weak-signal layer: AFC, spur cancellation, coherent CW processing,
Morse decoding, EME/moon tracking, dual-polarization adaptation — the L6
layer of the reference (SURVEY.md §1, §2.4).

Per SURVEY.md §7, these state machines run at ~Hz control rates on
device-computed spectra summaries: host-side numpy logic steering the
jitted per-sample chain (e.g. AFC feeds per-frame mix1 centre bins)."""
