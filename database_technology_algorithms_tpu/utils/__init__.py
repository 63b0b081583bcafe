"""Utilities: roofline audit, profiling, stage checkpoints."""

from .profiling import annotate, timed, trace
from .roofline import audit, chip_hbm_gbps, report

__all__ = ["audit", "chip_hbm_gbps", "report", "timed", "trace", "annotate"]
