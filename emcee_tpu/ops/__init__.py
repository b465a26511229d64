"""Compute kernels and diagnostics (fused XLA)."""

from . import autocorr

__all__ = ["autocorr"]
