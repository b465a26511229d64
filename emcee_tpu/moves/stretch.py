"""Goodman & Weare (2010) stretch move.

Behavioral parity with the reference (``/root/reference/src/emcee/moves/
stretch.py:10-33``): draw ``z`` from g(z) ∝ 1/sqrt(z) on [1/a, a] via the
inverse CDF ``z = ((a-1)U + 1)^2 / a``, pair each walker with a uniformly
random member of the complement, propose ``q = c_r - (c_r - s) * z`` and
carry the affine-invariance Hastings factor ``(ndim-1) log z``.

The whole proposal is a handful of fused elementwise ops plus one gather —
XLA fuses it into the surrounding accept/select program.  (Hand-written
Pallas variants were built and measured in rounds 1-2 and lost to this
XLA pipeline on every tested shape; see docs/performance.md "Why there is
no Pallas engine".)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .red_blue import RedBlueMove

__all__ = ["StretchMove"]


class StretchMove(RedBlueMove):
    """The affine-invariant stretch move.

    Args:
        a: stretch scale parameter (default 2.0, reference ``stretch.py:22``).
        pair_mode: how each walker picks its complement partner.
            ``"random"`` (default, reference-faithful): an independent
            uniform partner per walker — a random-index row gather.
            ``"roll"``: partner ``c[(i + shift) % nc]`` with one uniform
            random shift per half-step — a contiguous circular shift, no
            gather.  The partner choice is exogenous randomness independent
            of the chain state, so detailed balance is preserved; marginally
            each partner is still uniform over the complement.  This is the
            TPU performance configuration (random-row gathers are
            latency-bound on TPU).
    """

    tunable = True

    def __init__(self, a=2.0, pair_mode="random", **kwargs):
        self.a = float(a)
        if pair_mode not in ("random", "roll"):
            raise ValueError(f"unknown pair_mode: {pair_mode!r}")
        self.pair_mode = pair_mode
        super().__init__(**kwargs)

    def n_extra_uniforms(self, ng, nc):
        # Roll mode folds its z-draw + shift into the engine's single
        # per-step RNG kernel (every launch costs ~55 us on this runtime).
        if self.pair_mode == "roll":
            return ng + 1
        return 0

    def get_proposal(self, key, s, c_parts, model, extra=None, scale=None):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        # Acceptance-targeted tuning adapts the stretch range: a_eff - 1 =
        # (a - 1) * scale keeps a_eff > 1 (z-support [1/a, a] stays valid).
        a = self.a if scale is None else 1.0 + (self.a - 1.0) * scale
        if self.pair_mode == "roll":
            if extra is not None:
                u = extra[:ns]
                shift_u = extra[ns]
            else:
                u_all = jax.random.uniform(key, (ns + 1,), dtype=s.dtype)
                u = u_all[:ns]
                shift_u = u_all[ns]
            shift = (shift_u * nc).astype(jnp.int32)
            cr = jnp.roll(c, -shift, axis=0)[:ns]
        else:
            key_z, key_r = jax.random.split(key)
            u = jax.random.uniform(key_z, (ns,), dtype=s.dtype)
            rint = jax.random.randint(key_r, (ns,), 0, nc)
            cr = c[rint]
        zz = ((a - 1.0) * u + 1.0) ** 2 / a
        factors = (model.global_ndim(ndim) - 1.0) * jnp.log(zz)
        q = cr - (cr - s) * zz[:, None]
        return q, factors
