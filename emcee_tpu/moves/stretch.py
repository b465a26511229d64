"""Goodman & Weare (2010) stretch move.

Behavioral parity with the reference (``/root/reference/src/emcee/moves/
stretch.py:10-33``): draw ``z`` from g(z) ∝ 1/sqrt(z) on [1/a, a] via the
inverse CDF ``z = ((a-1)U + 1)^2 / a``, pair each walker with a uniformly
random member of the complement, propose ``q = c_r - (c_r - s) * z`` and
carry the affine-invariance Hastings factor ``(ndim-1) log z``.

The whole proposal is a handful of fused elementwise ops plus one gather —
XLA fuses it into the surrounding accept/select program.  A hand-written
Pallas variant lives in ``emcee_tpu.ops.stretch_kernel`` for the fully fused
proposal+accept inner loop.
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
    """

    def __init__(self, a=2.0, **kwargs):
        self.a = float(a)
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        key_z, key_r = jax.random.split(key)
        u = jax.random.uniform(key_z, (ns,), dtype=s.dtype)
        zz = ((self.a - 1.0) * u + 1.0) ** 2 / self.a
        factors = (ndim - 1.0) * jnp.log(zz)
        rint = jax.random.randint(key_r, (ns,), 0, nc)
        cr = c[rint]
        q = cr - (cr - s) * zz[:, None]
        return q, factors
