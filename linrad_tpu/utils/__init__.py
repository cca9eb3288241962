"""Shared numeric utilities (least squares, associative recurrences)."""
