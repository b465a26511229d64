"""Progress-bar selection (reference ``/root/reference/src/emcee/pbar.py``).

tqdm when requested and available, silent no-op otherwise.  Progress ticks
happen per device dispatch (chunk), not per step — the chain advances inside
jitted scans, so per-step host callbacks would serialize the device.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

try:
    import tqdm
    import tqdm.auto
except ImportError:
    tqdm = None

__all__ = ["get_progress_bar"]


class _NoOpPBar:
    """Placeholder progress bar with the tqdm subset we use."""

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass

    def update(self, count):
        pass


def get_progress_bar(display, total, **kwargs):
    """Get a progress bar interface.

    Args:
        display: ``False`` for none, ``True`` for default tqdm, or a string
            selecting a tqdm submodule (e.g. ``"notebook"``).
        total: expected number of proposal steps, or None.
    """
    if not display:
        return _NoOpPBar()
    if tqdm is None:
        logger.warning(
            "install the tqdm library to use progress indicators"
        )
        return _NoOpPBar()
    if display is True:
        # tqdm.auto picks the notebook widget under Jupyter, the async
        # terminal bar otherwise (reference pbar.py:53-57).
        return tqdm.auto.tqdm(total=total, **kwargs)
    import importlib

    sub = importlib.import_module(f"tqdm.{display}")
    return sub.tqdm(total=total, **kwargs)
