"""DIME: differential-evolution + adaptive-independence mixture move.

In the spirit of Boehl (2022), "Ensemble MCMC Sampling for Robust Bayesian
Inference" (the ``dime_sampler`` emcee plug-in): each walker proposes, with
probability ``aimh_prob``, from an *adaptive independence* multivariate
Student-t distribution whose moments track the sampled ensemble, and
otherwise takes a standard differential-evolution step.  The independence
component jumps between distant modes once the proposal distribution has
learned them — the regime where purely local ensemble moves (stretch, DE)
mix exponentially slowly.

Validity: the per-walker kernel choice is state-independent, so the move is
a mixture of two pi-invariant kernels — the DE component is the symmetric
:class:`DEMove` proposal (zero Hastings factor), and the independence
component carries the exact independence-MH correction
``log t(s) - log t(q)``.  Unlike the original DIME (which fits on the full
current ensemble), the proposal moments here pool the *frozen complement*
groups of the red-blue split with an exponentially-decayed history of past
ensembles (decay ``rho``), so each walker's proposal never depends on its
own current position — the same argument that makes :class:`KDEMove`
exact, plus Holden-style adaptation-on-history.

No reference counterpart (``/root/reference`` ships neither DIME nor any
adaptive move); the red-blue skeleton matches
``/root/reference/src/emcee/moves/red_blue.py:11-106``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .red_blue import RedBlueMove

__all__ = ["DIMEMove"]


def _centered_moments(x):
    """Population mean and centered covariance of ``x`` (n, d).

    Centered accumulation on purpose: forming ``E[xx^T] - mu mu^T``
    cancels catastrophically in float32 once ``|mu| >> sigma`` (the
    absolute error of E[xx^T] scales with mu^2 and swamps the true
    variance), yielding an indefinite matrix and a NaN Cholesky.
    """
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    return mean, (xc.T @ xc) / x.shape[0]


class DIMEMove(RedBlueMove):
    """Differential-Independence Mixture Ensemble proposal.

    Args:
        sigma: stddev of the gamma jitter of the DE component.
        gamma0: DE mean stretch factor; default ``2.38 / sqrt(2 ndim)``.
        aimh_prob: per-walker probability of an adaptive-independence
            proposal instead of a DE step (default 0.1).
        df: degrees of freedom of the Student-t independence proposal
            (default 10; must be > 2 so the shape matrix is defined).
            ``df=None`` uses a *Gaussian* independence proposal instead —
            no chi2 draws, ~2x cheaper per step, the right choice once
            the target is known to be light-tailed (heavy t tails only
            buy robustness while the moments are still being learned).
        rho: per-proposal decay of the historical-moment weight
            (default 0.999 — long memory, slow drift).
    """

    wants_carry = True
    # Per-walker kernel mixing with its own Hastings factors does not fit
    # BlendedMove's shared-evaluation contract.
    blendable = False
    _param_shard_ok = False

    def __init__(self, sigma=1.0e-5, gamma0=None, aimh_prob=0.1, df=10.0,
                 rho=0.999, **kwargs):
        self.sigma = float(sigma)
        self.gamma0 = gamma0
        self.aimh_prob = float(aimh_prob)
        if not 0.0 <= self.aimh_prob <= 1.0:
            raise ValueError("aimh_prob must be in [0, 1]")
        self.df = None if df is None else float(df)
        if self.df is not None and self.df <= 2.0:
            raise ValueError("df must be > 2 (or None for Gaussian)")
        self.rho = float(rho)
        if not 0.0 <= self.rho < 1.0:
            raise ValueError("rho must be in [0, 1)")
        super().__init__(**kwargs)

    def init_carry(self, nwalkers, ndim):
        # Cold start: w == 0 means the first proposals use pure
        # complement moments (the pooled history weight vanishes).
        return {
            "mean": jnp.zeros((ndim,), dtype=jnp.float32),
            "cov": jnp.eye(ndim, dtype=jnp.float32),
            "w": jnp.zeros((), dtype=jnp.float32),
        }

    def _pooled(self, carry, mean_b, cov_b, n, dtype):
        """Pool decayed history moments with a fresh batch's centered
        (mean, cov, n) via the parallel-combine recursion (never forms
        raw second moments — see ``_centered_moments``).

        Returns (mean, cov, total_weight) in ``dtype``.
        """
        wh = self.rho * carry["w"].astype(dtype)
        total = wh + n
        mean_h = carry["mean"].astype(dtype)
        cov_h = carry["cov"].astype(dtype)
        delta = mean_b - mean_h
        mean = mean_h + delta * (n / total)
        cov = (wh * cov_h + n * cov_b) / total + (
            wh * n / (total * total)
        ) * jnp.outer(delta, delta)
        return mean, cov, total

    def _t_shape_chol(self, cov, ndim, dtype):
        """Cholesky of the proposal shape matrix: ``cov * (df-2)/df``
        for the Student-t (so its covariance equals ``cov``), or ``cov``
        itself for the Gaussian (``df=None``)."""
        scale = 1.0 if self.df is None else (self.df - 2.0) / self.df
        eps = 1e-6 * (jnp.trace(cov) / ndim) + 1e-12
        S = cov * scale + eps * jnp.eye(ndim, dtype=dtype)
        return jnp.linalg.cholesky(S)

    @staticmethod
    def _t_quad(L_inv, x, mean):
        """Mahalanobis quadratic form of rows of x under chol(S)^-1.

        ``L_inv`` is the (ndim, ndim) inverse Cholesky factor, inverted
        once per split so the per-walker work is a single MXU matmul —
        a triangular solve with nwalkers right-hand sides is sequential
        over ndim and leaves the systolic array idle.  HIGHEST matmul
        precision: this enters the independence-MH acceptance factor,
        and the MXU's default bf16 input rounding would bias it at the
        percent level on ill-conditioned targets (the matrices are tiny,
        so full precision costs nothing).
        """
        y = jnp.dot(
            x - mean, L_inv.T, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.sum(y * y, axis=-1)

    def get_proposal(self, key, s, c_parts, model, carry=None):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        dtype = s.dtype

        # Proposal moments: frozen complement pooled with decayed history.
        mean_c, cov_c = _centered_moments(c)
        mean, cov, _ = self._pooled(carry, mean_c, cov_c, nc, dtype)
        L = self._t_shape_chol(cov, ndim, dtype)
        L_inv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(ndim, dtype=dtype), lower=True
        )

        key_sel, key_z, key_g, key_i, key_j, key_dg = jax.random.split(
            key, 6
        )

        # Independence component: x = mu + (z L^T) * sqrt(df / chi2_df)
        # (t), or plain x = mu + z L^T (Gaussian, df=None).
        z = jax.random.normal(key_z, (ns, ndim), dtype=dtype)
        if self.df is None:
            q_t = mean + z @ L.T
        else:
            chi2 = 2.0 * jax.random.gamma(
                key_g, self.df / 2.0, (ns,), dtype=dtype
            )
            t_scale = jnp.sqrt(self.df / chi2)
            q_t = mean + (z @ L.T) * t_scale[:, None]

        if self.aimh_prob >= 1.0:
            # Pure independence sampler: no DE branch to compute.
            q = q_t
            use_t = jnp.ones((ns,), dtype=bool)
        else:
            # DE component (DEMove's O(ns) distinct-pair draw,
            # de.py:72-83).
            g0 = self.gamma0
            if g0 is None:
                g0 = 2.38 / jnp.sqrt(2.0 * model.global_ndim(ndim))
            i = jax.random.randint(key_i, (ns,), 0, nc)
            j = jax.random.randint(key_j, (ns,), 0, nc - 1)
            j = jnp.where(j >= i, j + 1, j)
            gamma = g0 * (
                1.0
                + self.sigma
                * jax.random.normal(key_dg, (ns, 1), dtype=dtype)
            )
            q_de = s + gamma * (c[j] - c[i])

            # State-independent per-walker kernel choice.
            use_t = jax.random.uniform(key_sel, (ns,), dtype=dtype) < (
                self.aimh_prob
            )
            q = jnp.where(use_t[:, None], q_t, q_de)

        # Independence-MH factor log p(s) - log p(q); the normalizing
        # constants cancel, leaving only the quadratic-form terms.
        m_s = self._t_quad(L_inv, s, mean)
        m_q = self._t_quad(L_inv, q_t, mean)
        if self.df is None:
            f_t = 0.5 * (m_q - m_s)
        else:
            f_t = (-(self.df + ndim) / 2.0) * (
                jnp.log1p(m_s / self.df) - jnp.log1p(m_q / self.df)
            )
        factors = jnp.where(use_t, f_t, jnp.zeros_like(f_t))
        return q, factors

    def update_carry(self, carry, state, model):
        """Fold the post-accept ensemble into the decayed history moments
        (runs once per proposal; cross-shard centered moments via two
        psums — mean first, then the globally-centered scatter)."""
        coords = state.coords
        dtype = coords.dtype
        if model.axis_name is not None:
            n = model.nwalkers
            mean_b = (
                jax.lax.psum(jnp.sum(coords, axis=0), model.axis_name)
                / n
            )
            xc = coords - mean_b
            cov_b = jax.lax.psum(xc.T @ xc, model.axis_name) / n
        else:
            n = coords.shape[0]
            mean_b, cov_b = _centered_moments(coords)
        mean, cov, total = self._pooled(carry, mean_b, cov_b, n, dtype)
        return {
            "mean": mean.astype(jnp.float32),
            "cov": cov.astype(jnp.float32),
            "w": total.astype(jnp.float32),
        }
