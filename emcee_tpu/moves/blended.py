"""Blended red-blue move: a weighted mixture fused into one proposal.

The generic mixture machinery dispatches whole move programs through
``jax.lax.switch`` (reference semantics, ``ensemble.py:406``).  That is
correct for arbitrary moves, but for red-blue moves sharing the same
split structure it pays twice: XLA copies live buffers at the branch
boundary every step, and each branch carries its own log-prob
evaluation.

:class:`BlendedMove` instead computes *every* sub-move's proposal for
the split, selects one by a per-step categorical draw, and runs a single
shared log-prob + Metropolis accept.  Statistically identical to the
switch mixture (one i.i.d.-chosen move per step — the selection is
exogenous and each sub-proposal uses its own key stream); faster
whenever the log-prob evaluation or the switch overhead dominates the
extra proposal math.  This is the workload-3 performance configuration:

    BlendedMove([
        (DEMove(pair_mode="roll"), 0.8),
        (DESnookerMove(pair_mode="roll", nsplits=2), 0.2),
    ], randomize_split=False)

No counterpart exists in the reference (its mixtures are object-level,
``ensemble.py:115-129``); capability-wise it is the same mixture surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .red_blue import RedBlueMove

__all__ = ["BlendedMove"]


class BlendedMove(RedBlueMove):
    """Fused weighted mixture of red-blue moves.

    Args:
        moves: ``[(move, weight), ...]`` (or a plain list for equal
            weights).  Every move must be a :class:`RedBlueMove` with the
            same ``nsplits``.
        randomize_split / live_dangerously: as for any red-blue move
            (overrides the sub-moves' settings — the split is owned by
            the blend).
    """

    def __init__(self, moves, mode="select", **kwargs):
        if mode not in ("select", "switch"):
            raise ValueError(f"unknown mode: {mode!r}")
        self.mode = mode
        moves = list(moves)
        if all(hasattr(m, "__len__") and len(m) == 2 for m in moves):
            self._moves, w = map(list, zip(*moves))
            weights = np.asarray(w, dtype=float)
        else:
            self._moves = moves
            weights = np.ones(len(moves))
        if len(self._moves) < 2:
            raise ValueError("BlendedMove needs at least two moves")
        for m in self._moves:
            if not isinstance(m, RedBlueMove):
                raise ValueError(
                    "BlendedMove blends red-blue moves only; got "
                    f"{type(m).__name__}"
                )
            if not m.blendable:
                raise ValueError(
                    f"{type(m).__name__} cannot be blended: its update "
                    "is not a (q, factors) proposal sharing one "
                    "log-prob evaluation — use it in a sampler-level "
                    "move mixture instead"
                )
        nsplits = {m.nsplits for m in self._moves}
        if len(nsplits) != 1:
            raise ValueError(
                f"all blended moves must share nsplits; got {nsplits}"
            )
        if np.any(weights < 0) or weights.sum() == 0:
            raise ValueError("invalid mixture weights")
        self._weights = weights / weights.sum()
        kwargs.setdefault("nsplits", nsplits.pop())
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model, extra=None):
        n = len(self._moves)
        keys = jax.random.split(key, n + 1)
        idx = jax.random.choice(
            keys[0], n, p=jnp.asarray(self._weights)
        )
        if self.mode == "switch":
            # One sub-proposal computed per step via lax.switch scoped to
            # the proposal alone (the log-prob/accept stay shared outside)
            # — the branch payload is just (s, c_parts), far smaller than
            # switching whole move programs at the sampler level.
            def make_branch(i):
                def branch(operand):
                    s_, cp = operand
                    q, f = self._moves[i].get_proposal(
                        keys[1 + i], s_, cp, model
                    )
                    return q, jnp.broadcast_to(f, (s_.shape[0],))

                return branch

            return jax.lax.switch(
                idx,
                [make_branch(i) for i in range(n)],
                (s, tuple(c_parts)),
            )
        qs, fs = [], []
        for m, k in zip(self._moves, keys[1:]):
            q, f = m.get_proposal(k, s, c_parts, model)
            qs.append(q)
            fs.append(jnp.broadcast_to(f, (s.shape[0],)))
        q = jnp.stack(qs, axis=0)[idx]
        factors = jnp.stack(fs, axis=0)[idx]
        return q, factors
