"""Benchmark utilities: inference timing stats + roofline accounting."""

from .timestat import Timestat

__all__ = ["Timestat"]
