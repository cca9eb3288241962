"""Compute kernels for the signal chain (the L3/L4/L5 layers of the
reference, SURVEY.md §1)."""
