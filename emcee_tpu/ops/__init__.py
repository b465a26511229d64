"""Compute kernels and diagnostics (XLA + Pallas)."""

from . import autocorr

__all__ = ["autocorr"]
