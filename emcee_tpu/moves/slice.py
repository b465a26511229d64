"""Ensemble slice sampling (zeus-style).

Implements the differential ensemble slice move of Karamanis & Beutler
(2021), "Ensemble slice sampling" (Stat. Comput. 31, 61; the ``zeus``
sampler): each red-blue group slice-samples along a direction drawn as
the difference of two complementary walkers,

    eta = mu * (c_i - c_j),      X(t) = x + t * eta,

using Neal (2003) stepping-out + shrinkage on the 1-D slice
``{t : log pi(X(t)) > y}`` with level ``y = log pi(x) + log U``.  The
ensemble supplies the direction geometry (affine invariant, like
stretch/DE), and slice sampling removes the accept/reject step — every
proposal moves, with step length adapted automatically to the local
slice width.  No counterpart exists in the reference (emcee is
Metropolis-only); ``zeus`` is the companion package that popularized
this move for the same ensemble layout.

TPU execution model: slice sampling has a data-dependent evaluation
count per walker (expansions + shrinks), which is why NUTS was rejected
(``docs/moves.md``) — but unlike NUTS the slice loops are *short,
bounded, and convergent* (shrinkage halves the interval per rejection),
so the SPMD cost model works: the whole group iterates a masked
``lax.while_loop`` until every walker has landed, each iteration one
batched log-prob evaluation.  Typical cost is ~4-8 evaluations per
walker per half-step on unimodal targets — and every one of them is a
kept move, so the effective-samples bill is usually *lower* than a
random-walk move's despite the extra evaluations.

Direction-scale tuning (``tune_mu=True`` + ``run_mcmc(..., tune=True)``)
adapts ``mu`` by Robbins-Monro so stepping-out expansions balance
shrinkage contractions (the zeus tuning criterion): too-small ``mu``
wastes evaluations expanding, too-large wastes them shrinking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import robbins_monro_step, tree_where
from .red_blue import RedBlueMove

__all__ = ["EnsembleSliceMove"]


class EnsembleSliceMove(RedBlueMove):
    """Differential ensemble slice move (Karamanis & Beutler 2021).

    Args:
        mu: direction-scale multiplier on the walker-difference vector
            (the initial slice window is ``|mu * (c_i - c_j)|`` long).
            1.0 is the zeus default and right for near-Gaussian targets.
        max_steps: total stepping-out expansion budget per walker per
            half-step, apportioned randomly between the two ends
            (Neal 2003's ``J ~ U{0..m-1}, K = m-1-J`` scheme, which
            keeps the update exact even when the budget binds); the
            loop exits as soon as every walker's interval brackets its
            slice.
        max_shrink: cap on shrinkage iterations (shrinkage converges
            geometrically, so the cap is effectively unreachable; a
            walker that somehow hits it stays put and is reported
            unaccepted).
        tune_mu: adapt ``mu`` under ``run_mcmc(..., tune=True)`` so
            expansions balance contractions (Robbins-Monro on the
            expansion fraction with a ``tune_rate / sqrt(t)`` step).
        tune_rate: adaptation rate for ``tune_mu``.
        nsplits / randomize_split / live_dangerously: standard red-blue
            controls.

    Notes:
        Slice moves always move (acceptance ~ 1), so acceptance-rate
        targeting (``tune_target``) is meaningless here and rejected;
        ``tune_mu`` is the slice-native tuning knob.  Parameter-axis
        sharding is unsupported: the slice level compares *global*
        log-probs inside the shrink loop, which would put a psum inside
        a while_loop whose trip count diverges across shards.
    """

    tunable = True  # reuse the carry->scale plumbing for the tuned mu.
    blendable = False  # no (q, factors) proposal to share an eval with.

    def __init__(self, mu=1.0, max_steps=100, max_shrink=100,
                 tune_mu=False, **kwargs):
        if kwargs.get("tune_target") is not None:
            raise ValueError(
                "EnsembleSliceMove has no accept/reject step, so "
                "acceptance targeting (tune_target) does not apply; "
                "use tune_mu=True to adapt the direction scale"
            )
        self.mu = float(mu)
        if self.mu <= 0:
            raise ValueError("mu must be positive")
        self.max_steps = int(max_steps)
        self.max_shrink = int(max_shrink)
        self.tune_mu = bool(tune_mu)
        super().__init__(**kwargs)

    # -- mu adaptation via the standard carry protocol ------------------
    # The carry reuses the family's {log_adj, t} keys so RedBlueMove's
    # propose() hands exp(log_adj) to _inner as the `scale` kwarg; tune()
    # targets a balanced expansion fraction instead of an acceptance rate.
    # The per-split (nexp, ncon) counts ride _inner's stats return slot
    # (the engine hands them to _fold_split_stats) — never object state.

    def init_carry(self, nwalkers, ndim):
        if not self.tune_mu:
            return ()
        return {
            "log_adj": jnp.zeros((), dtype=jnp.float32),
            "t": jnp.zeros((), dtype=jnp.int32),
            "frac_expand": jnp.full((), 0.5, dtype=jnp.float32),
        }

    def _fold_split_stats(self, carry, stats, model):
        if not (self.tune_mu and isinstance(carry, dict)):
            return carry
        nexp = sum(s[0] for s in stats)
        ncon = sum(s[1] for s in stats)
        frac = nexp / jnp.maximum(nexp + ncon, 1.0)
        if model.axis_name is not None:
            frac = jax.lax.pmean(frac, model.axis_name)
        return {**carry, "frac_expand": frac.astype(jnp.float32)}

    def tune(self, carry, state, accepted, model=None):
        if not self.tune_mu or not isinstance(carry, dict):
            return carry
        # frac_expand > 1/2 means the initial window is too narrow
        # (expansions dominate) -> grow mu, and vice versa.
        err = 2.0 * (carry["frac_expand"] - 0.5)
        return robbins_monro_step(carry, err, self.tune_rate)

    # -- the slice update ------------------------------------------------
    # Overrides the propose/evaluate/accept body: slice sampling is not a
    # (q, factors) proposal, it is its own rejection-free update with a
    # data-dependent number of log-prob evaluations.

    def get_proposal(self, key, s, c_parts, model, scale=None):
        raise AssertionError(
            "unreachable: EnsembleSliceMove overrides _inner"
        )  # pragma: no cover

    def _inner(self, k, s, c_parts, lp_s, blobs_s, log_u, model,
               extra=None, scale=None, carry=None):
        # carry is part of the RedBlueMove._inner contract (adaptive
        # moves); the slice move does not use it.
        if model.param_axis is not None:
            raise NotImplementedError(
                "EnsembleSliceMove does not support parameter-axis "
                "sharding (the slice loop compares global log-probs "
                "per iteration)"
            )
        if model.axis_name is not None:
            c_parts = tuple(
                jax.lax.all_gather(c, model.axis_name, axis=0, tiled=True)
                for c in c_parts
            )
        c = jnp.concatenate(c_parts, axis=0)
        ns, _ = s.shape
        nc = c.shape[0]
        dtype = s.dtype

        mu = jnp.asarray(self.mu, dtype=dtype)
        if scale is not None:
            mu = mu * scale

        k_i, k_j, k_off, k_budget, k_shrink = jax.random.split(k, 5)
        i = jax.random.randint(k_i, (ns,), 0, nc)
        j = jax.random.randint(k_j, (ns,), 0, nc - 1)
        j = jnp.where(j >= i, j + 1, j)  # uniform ordered pairs, i != j
        eta = mu * (c[i] - c[j])  # (ns, nd) slice directions

        # Slice level: y = log pi(x) + log U, reusing the engine's
        # pre-drawn per-walker log-uniform.
        y = lp_s + log_u

        # Does the model produce blobs?  (Trace-time probe, no FLOPs.)
        # Same error contract as the rest of the red-blue family when
        # the state arrived without them.
        _, blobs_shape = jax.eval_shape(model.compute_log_prob, s)
        has_blobs = blobs_shape is not None
        if has_blobs and blobs_s is None:
            raise ValueError(
                "If you start sampling with a given log_prob, you "
                "also need to provide the current list of blobs at "
                "that position."
            )

        # Stepping out (Neal 2003, w = 1 in t-units = one eta length):
        # initial window [L, L+1] containing t=0, expand each end while
        # it still lies inside the slice.  The total expansion budget
        # max_steps is apportioned randomly between the ends
        # (J ~ U{0..m-1} left, m-1-J right) so the update stays exact
        # (reversible) even when the budget binds — a deterministic cap
        # would center bound intervals on the current point and bias
        # wide-slice (heavy-tail) regions.  One batched evaluation of
        # both stacked endpoints per iteration.
        u0 = jax.random.uniform(k_off, (ns,), dtype=dtype)
        L0 = -u0
        R0 = L0 + 1.0
        jL = jax.random.randint(k_budget, (ns,), 0, self.max_steps)
        jR = (self.max_steps - 1) - jL

        def out_cond(st):
            _, _, expL, expR, _, _, _, it = st
            return (it < self.max_steps) & (
                jnp.any(expL) | jnp.any(expR)
            )

        def out_body(st):
            L, R, expL, expR, cntL, cntR, nexp, it = st
            both = jnp.concatenate(
                [s + L[:, None] * eta, s + R[:, None] * eta], axis=0
            )
            lp2, _ = model.compute_log_prob(both)
            inL = expL & (lp2[:ns] > y) & (cntL < jL)
            inR = expR & (lp2[ns:] > y) & (cntR < jR)
            nexp = (
                nexp
                + jnp.sum(inL, dtype=jnp.float32)
                + jnp.sum(inR, dtype=jnp.float32)
            )
            return (
                jnp.where(inL, L - 1.0, L),
                jnp.where(inR, R + 1.0, R),
                inL,
                inR,
                cntL + inL.astype(cntL.dtype),
                cntR + inR.astype(cntR.dtype),
                nexp,
                it + 1,
            )

        expand0 = jnp.ones((ns,), dtype=bool)
        cnt0 = jnp.zeros((ns,), dtype=jnp.int32)
        L, R, _, _, _, _, nexp, _ = jax.lax.while_loop(
            out_cond,
            out_body,
            (L0, R0, expand0, expand0, cnt0, cnt0,
             jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        )

        # Shrinkage: sample t ~ U(L, R); accept if inside the slice,
        # otherwise move the violated end to t.  Converges geometrically
        # (t=0 is always acceptable), so every walker lands well before
        # max_shrink.  The accepted draw's log-prob AND blobs ride the
        # loop carry — no extra evaluation afterwards.
        blobs0 = blobs_s if has_blobs else None

        def shr_cond(st):
            _, _, _, _, _, _, done, _, it = st
            return (it < self.max_shrink) & jnp.any(~done)

        def shr_body(st):
            key, L, R, t_acc, lp_acc, blobs_acc, done, ncon, it = st
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (ns,), dtype=dtype)
            t = L + u * (R - L)
            lp_t, blobs_t = model.compute_log_prob(
                s + t[:, None] * eta
            )
            ok = lp_t > y
            newly = ok & ~done
            t_acc = jnp.where(newly, t, t_acc)
            lp_acc = jnp.where(newly, lp_t, lp_acc)
            if has_blobs:
                blobs_acc = tree_where(newly, blobs_t, blobs_acc)
            miss = ~ok & ~done
            ncon = ncon + jnp.sum(miss, dtype=jnp.float32)
            L = jnp.where(miss & (t < 0), t, L)
            R = jnp.where(miss & (t >= 0), t, R)
            return (
                key, L, R, t_acc, lp_acc, blobs_acc, done | ok, ncon,
                it + 1,
            )

        (_, _, _, t_acc, lp_acc, sel_blobs, done, ncon, _) = (
            jax.lax.while_loop(
                shr_cond,
                shr_body,
                (
                    k_shrink,
                    L,
                    R,
                    jnp.zeros((ns,), dtype=dtype),
                    lp_s,
                    blobs0,
                    jnp.zeros((ns,), dtype=bool),
                    jnp.zeros((), jnp.float32),
                    jnp.zeros((), jnp.int32),
                ),
            )
        )

        q = jnp.where(done[:, None], s + t_acc[:, None] * eta, s)
        sel_lp = jnp.where(done, lp_acc, lp_s)
        if not has_blobs:
            sel_blobs = blobs_s
        return q, sel_lp, sel_blobs, done, (nexp, ncon)
