"""Proposal moves.

Public surface mirrors the reference (``/root/reference/src/emcee/moves/
__init__.py:3-11``): ``Move``, ``RedBlueMove``, ``MHMove`` bases and the
concrete ``StretchMove``, ``WalkMove``, ``DEMove``, ``DESnookerMove``,
``KDEMove``, ``GaussianMove``.  Beyond the reference: ``SideMove``,
``BlendedMove`` (fused mixtures), ``EnsembleSliceMove`` (zeus-style
rejection-free slice sampling — see ``moves/slice.py``), and the
gradient-based family ``MALAMove`` / ``HMCMove`` / ``EnsembleMALAMove``
/ ``EnsembleHMCMove`` (JAX autodiff — see ``moves/gradient.py``), and
``DIMEMove`` (adaptive-independence + DE mixture for multimodal targets
— see ``moves/dime.py``).
"""

from .base import Move
from .blended import BlendedMove
from .de import DEMove
from .de_snooker import DESnookerMove
from .de_z import DEZMove
from .dime import DIMEMove
from .gradient import (
    ChEESHMCMove,
    EnsembleHMCMove,
    EnsembleMALAMove,
    HMCMove,
    MALAMove,
)
from .side import SideMove
from .slice import EnsembleSliceMove
from .gaussian import GaussianMove
from .kde import KDEMove
from .mh import MHMove
from .red_blue import RedBlueMove
from .stretch import StretchMove
from .walk import WalkMove

__all__ = [
    "Move",
    "MHMove",
    "GaussianMove",
    "RedBlueMove",
    "StretchMove",
    "WalkMove",
    "KDEMove",
    "DEMove",
    "DESnookerMove",
    "DEZMove",
    "DIMEMove",
    "SideMove",
    "EnsembleSliceMove",
    "BlendedMove",
    "MALAMove",
    "HMCMove",
    "ChEESHMCMove",
    "EnsembleMALAMove",
    "EnsembleHMCMove",
]
