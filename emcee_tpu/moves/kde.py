"""Gaussian-KDE ensemble move.

Matches the reference (``/root/reference/src/emcee/moves/kde.py:16-43``),
which fits ``scipy.stats.gaussian_kde`` to the complement, resamples
proposals from it, and uses ``logpdf(s) - logpdf(q)`` as the Hastings
factor.  TPU-native implementation with no scipy dependency:

* bandwidth: Scott's rule ``nc**(-1/(d+4))`` (scipy's default), Silverman's
  rule, or a scalar — the KDE kernel covariance is
  ``factor^2 * Cov(complement)`` exactly as ``gaussian_kde`` computes it;
* resampling: pick a random complement point, add correlated Gaussian noise
  through the Cholesky factor of the kernel covariance;
* logpdf: ``logsumexp`` over the complement of the kernel log-densities —
  an O(n_eval * nc) pairwise quadratic form evaluated as two MXU matmuls.

The logpdf cost is quadratic in the ensemble size; ``max_complement``
subsamples the complement (uniformly, fresh each call) to bound it for very
large ensembles — the reference has no such control and simply OOMs/crawls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .red_blue import RedBlueMove

__all__ = ["KDEMove"]


class KDEMove(RedBlueMove):
    """Proposal from a Gaussian KDE of the complementary ensemble.

    Args:
        bw_method: ``None``/"scott", "silverman", or a scalar bandwidth
            factor (same contract as ``scipy.stats.gaussian_kde``).
        max_complement: optional cap on complement points used for the KDE.
    """

    def __init__(self, bw_method=None, max_complement=None, **kwargs):
        self.bw_method = bw_method
        self.max_complement = max_complement
        super().__init__(**kwargs)

    def _factor(self, nc, d):
        if self.bw_method is None or self.bw_method == "scott":
            return nc ** (-1.0 / (d + 4))
        if self.bw_method == "silverman":
            return (nc * (d + 2) / 4.0) ** (-1.0 / (d + 4))
        return float(self.bw_method)

    def get_proposal(self, key, s, c_parts, model):
        if model.param_axis is not None:
            raise NotImplementedError(
                "KDEMove does not support parameter-axis sharding (its "
                "covariance couples all dimensions); use Stretch/DE/"
                "Snooker/Gaussian moves for long-ndim runs"
            )
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        k_sub, k_pick, k_noise = jax.random.split(key, 3)
        if (
            self.max_complement is not None
            and c.shape[0] > self.max_complement
        ):
            sub = jax.random.choice(
                k_sub, c.shape[0], (self.max_complement,), replace=False
            )
            c = c[sub]
        nc = c.shape[0]

        factor = self._factor(nc, ndim)
        cm = jnp.mean(c, axis=0, keepdims=True)
        cc = c - cm
        data_cov = (cc.T @ cc) / (nc - 1)
        kcov = (factor**2) * data_cov
        chol = jnp.linalg.cholesky(kcov)

        # Resample: random kernel center + correlated noise.
        pick = jax.random.randint(k_pick, (ns,), 0, nc)
        noise = jax.random.normal(k_noise, (ns, ndim), dtype=s.dtype)
        q = c[pick] + noise @ chol.T

        logpdf_s = self._logpdf(s, c, chol)
        logpdf_q = self._logpdf(q, c, chol)
        return q, logpdf_s - logpdf_q

    @staticmethod
    def _logpdf(x, c, chol):
        """log KDE density of rows of x under kernels centered at rows of c."""
        ndim = x.shape[1]
        nc = c.shape[0]
        # Whiten both sets: quadratic form becomes a plain squared distance,
        # computed via ||a||^2 + ||b||^2 - 2 a.b (one MXU matmul).
        xw = jax.scipy.linalg.solve_triangular(chol, x.T, lower=True).T
        cw = jax.scipy.linalg.solve_triangular(chol, c.T, lower=True).T
        x2 = jnp.sum(xw**2, axis=1)[:, None]
        c2 = jnp.sum(cw**2, axis=1)[None, :]
        d2 = x2 + c2 - 2.0 * (xw @ cw.T)
        logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
        lognorm = (
            jnp.log(jnp.asarray(nc, x.dtype))
            + 0.5 * ndim * jnp.log(2.0 * jnp.pi)
            + logdet
        )
        return jax.scipy.special.logsumexp(-0.5 * d2, axis=1) - lognorm
