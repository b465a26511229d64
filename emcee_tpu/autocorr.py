"""Public autocorrelation module (mirrors ``emcee.autocorr``).

Implementation lives in :mod:`emcee_tpu.ops.autocorr` (batched on-device
FFTs); this alias preserves the reference import path
``from emcee_tpu import autocorr``.
"""

from .ops.autocorr import (  # noqa: F401
    AutocorrError,
    ess,
    function_1d,
    integrated_time,
    next_pow_two,
    rhat,
)

__all__ = [
    "function_1d",
    "integrated_time",
    "ess",
    "rhat",
    "AutocorrError",
    "next_pow_two",
]
