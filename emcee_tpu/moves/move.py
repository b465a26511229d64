"""Import-path alias for reference compatibility.

The reference keeps the move base class in ``emcee.moves.move``
(``/root/reference/src/emcee/moves/move.py:5``); here it lives in
``moves/base.py``.  This alias keeps ``from emcee.moves.move import
Move``-style imports working after a package rename.
"""

from .base import Move

__all__ = ["Move"]
