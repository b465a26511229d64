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
        n_components: number of components of the independence proposal
            (default 1 — the classic single global Student-t).  With
            well-separated modes of *unequal shape*, one global
            covariance mis-serves every mode (its spread is dominated by
            the inter-mode separation, so draws rarely land inside a
            narrow mode); ``n_components=K`` keeps K per-mode moment
            sets, assigns ensemble points to the nearest component mean,
            and proposes from the weighted t-mixture with the exact
            mixture-density independence-MH factor.

            Exactness (same argument as the single-component case,
            extended): the proposal distribution — component means,
            shapes, weights, and the hard assignment they derive from —
            is a deterministic function of the frozen complement groups
            and the decayed history carry only, never of the walker
            being updated, so it is a valid independence proposal; the
            Hastings factor uses the full mixture density
            ``log q(s) - log q(x')`` in which the component-independent
            Student-t normalizing constant cancels (shared ``df`` and
            dimension), leaving ``logsumexp_k [log w_k - log|L_k| -
            (df+d)/2 log1p(m_k/df)]`` — MXU matmuls per component, no
            per-walker gathers of (d, d) matrices.
    """

    wants_carry = True
    # Per-walker kernel mixing with its own Hastings factors does not fit
    # BlendedMove's shared-evaluation contract.
    blendable = False
    _param_shard_ok = False

    def __init__(self, sigma=1.0e-5, gamma0=None, aimh_prob=0.1, df=10.0,
                 rho=0.999, n_components=1, **kwargs):
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
        self.n_components = int(n_components)
        if self.n_components < 1:
            raise ValueError("n_components must be >= 1")
        super().__init__(**kwargs)

    def init_carry(self, nwalkers, ndim):
        # Cold start: w == 0 means the first proposals use pure
        # complement moments (the pooled history weight vanishes).
        if self.n_components == 1:
            return {
                "mean": jnp.zeros((ndim,), dtype=jnp.float32),
                "cov": jnp.eye(ndim, dtype=jnp.float32),
                "w": jnp.zeros((), dtype=jnp.float32),
            }
        K = self.n_components
        return {
            "mean": jnp.zeros((K, ndim), dtype=jnp.float32),
            "cov": jnp.broadcast_to(
                jnp.eye(ndim, dtype=jnp.float32), (K, ndim, ndim)
            ),
            "w": jnp.zeros((K,), dtype=jnp.float32),
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

    # -- K-component machinery (n_components > 1) ----------------------

    def _assign_means(self, carry, x, model, local=False):
        """Component identities for the hard assignment.

        Normally the carry means; at cold start (total history weight
        zero, means all at the origin) the assignment would tie, so the
        components are seeded from K strided rows of the batch instead.
        ``local=True`` marks ``x`` as a shard-local block (the
        update_carry path): the seed rows are then all-gathered and the
        same K global rows chosen everywhere, so the replicated carry
        stays bit-identical across shards.  In get_proposal the
        complement arrives already globally gathered (``local=False``).
        """
        K = self.n_components
        n = x.shape[0]
        idx = (jnp.arange(K) * max(1, n // K)) % n
        seed_rows = x[idx]
        if local and model is not None and model.axis_name is not None:
            seed_rows = jax.lax.all_gather(
                seed_rows, model.axis_name, axis=0, tiled=True
            )[:K]
        cold = jnp.sum(carry["w"]) == 0.0
        return jnp.where(
            cold, seed_rows.astype(jnp.float32), carry["mean"]
        )

    def _masked_moments(self, x, assign_means, model, local=False):
        """Per-component (count, mean, centered cov) of ``x`` under a
        nearest-mean hard assignment.  With ``local=True`` (shard-local
        ``x``) the reductions complete cross-shard via psums (counts,
        first moments, then the globally-centered scatter) so no shard
        ever gathers the full ensemble."""
        K = self.n_components
        dtype = x.dtype
        sharded = (
            local and model is not None and model.axis_name is not None
        )
        mu = assign_means.astype(dtype)
        d2 = (
            jnp.sum(x * x, axis=1)[:, None]
            - 2.0 * x @ mu.T
            + jnp.sum(mu * mu, axis=1)[None, :]
        )
        onehot = jax.nn.one_hot(jnp.argmin(d2, axis=1), K, dtype=dtype)
        n_k = jnp.sum(onehot, axis=0)  # (K,)
        s1 = onehot.T @ x  # (K, d)
        if sharded:
            n_k = jax.lax.psum(n_k, model.axis_name)
            s1 = jax.lax.psum(s1, model.axis_name)
        safe = jnp.maximum(n_k, 1.0)
        means = s1 / safe[:, None]
        xc = x[None, :, :] - means[:, None, :]  # (K, n_local, d)
        covs = jnp.einsum("nk,kni,knj->kij", onehot, xc, xc)
        if sharded:
            covs = jax.lax.psum(covs, model.axis_name)
        covs = covs / safe[:, None, None]
        return n_k, means, covs

    def _pooled_k(self, carry, n_k, means_b, covs_b, dtype):
        """Vectorized parallel-combine of decayed per-component history
        with a fresh batch (the K-axis analogue of :meth:`_pooled`).
        Components with no assigned points keep their history moments.
        """
        wh = self.rho * carry["w"].astype(dtype)  # (K,)
        total = wh + n_k
        safe = jnp.maximum(total, 1e-12)
        mean_h = carry["mean"].astype(dtype)
        cov_h = carry["cov"].astype(dtype)
        delta = means_b - mean_h
        mean = mean_h + delta * (n_k / safe)[:, None]
        cov = (
            wh[:, None, None] * cov_h + n_k[:, None, None] * covs_b
        ) / safe[:, None, None] + (
            (wh * n_k) / (safe * safe)
        )[:, None, None] * jnp.einsum("ki,kj->kij", delta, delta)
        return mean, cov, total

    def _mixture_quantities(self, carry, c, model, dtype):
        """Pooled per-component (means, chols, inverse chols, log-weights,
        log-dets) for the proposal, derived from the frozen complement +
        history only."""
        ndim = c.shape[1]
        assign_means = self._assign_means(carry, c, model)
        n_k, mb, cb = self._masked_moments(c, assign_means, model)
        means, covs, wk = self._pooled_k(carry, n_k, mb, cb, dtype)
        L = jax.vmap(lambda S: self._t_shape_chol(S, ndim, dtype))(covs)
        eye = jnp.eye(ndim, dtype=dtype)
        L_inv = jax.vmap(
            lambda Lk: jax.scipy.linalg.solve_triangular(
                Lk, eye, lower=True
            )
        )(L)
        # Weight floor: a dead component keeps a vanishing (never -inf)
        # density contribution and is effectively never drawn.
        w_floor = wk + 1e-6 * jnp.sum(wk) + 1e-30
        logw = jnp.log(w_floor) - jnp.log(jnp.sum(w_floor))
        logdet = jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=1, axis2=2)), axis=1
        )
        return means, L, L_inv, logw, logdet

    def _mixture_logq(self, x, means, L_inv, logw, logdet, ndim):
        """Mixture log-density up to the component-independent Student-t
        (or Gaussian) normalizing constant, which cancels in the
        ``log q(s) - log q(x')`` Hastings difference (shared df and
        dimension)."""
        m_k = jax.vmap(
            lambda Li, mu: self._t_quad(Li, x, mu)
        )(L_inv, means)  # (K, m)
        if self.df is None:
            comp = logw[:, None] - logdet[:, None] - 0.5 * m_k
        else:
            comp = (
                logw[:, None]
                - logdet[:, None]
                - ((self.df + ndim) / 2.0) * jnp.log1p(m_k / self.df)
            )
        return jax.scipy.special.logsumexp(comp, axis=0)

    def get_proposal(self, key, s, c_parts, model, carry=None):
        if self.n_components > 1:
            return self._get_proposal_mixture(key, s, c_parts, model, carry)
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

    def _get_proposal_mixture(self, key, s, c_parts, model, carry):
        """K-component independence + DE mixture proposal."""
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        dtype = s.dtype
        K = self.n_components

        means, L, L_inv, logw, logdet = self._mixture_quantities(
            carry, c, model, dtype
        )

        (
            key_sel, key_comp, key_z, key_g, key_i, key_j, key_dg
        ) = jax.random.split(key, 7)

        # Component draw, then the component's t (or Gaussian) draw.
        # All K per-walker draws are computed as K (ns, d) MXU matmuls
        # and masked — a per-walker gather of (d, d) Cholesky factors
        # would materialize an (ns, d, d) intermediate instead.
        comp = jax.random.categorical(key_comp, logw, shape=(ns,))
        z = jax.random.normal(key_z, (ns, ndim), dtype=dtype)
        draws_k = means[:, None, :] + jnp.einsum(
            "ni,kji->knj", z, L
        )  # (K, ns, d)
        sel = jax.nn.one_hot(comp, K, dtype=dtype)  # (ns, K)
        q_t = jnp.einsum("nk,knj->nj", sel, draws_k)
        if self.df is not None:
            chi2 = 2.0 * jax.random.gamma(
                key_g, self.df / 2.0, (ns,), dtype=dtype
            )
            t_scale = jnp.sqrt(self.df / chi2)
            mean_sel = sel @ means  # (ns, d)
            q_t = mean_sel + (q_t - mean_sel) * t_scale[:, None]

        if self.aimh_prob >= 1.0:
            q = q_t
            use_t = jnp.ones((ns,), dtype=bool)
        else:
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
            use_t = jax.random.uniform(key_sel, (ns,), dtype=dtype) < (
                self.aimh_prob
            )
            q = jnp.where(use_t[:, None], q_t, q_de)

        # Exact mixture-density independence-MH factor (the shared
        # normalizing constant cancels between the two evaluations).
        lq_s = self._mixture_logq(s, means, L_inv, logw, logdet, ndim)
        lq_q = self._mixture_logq(q_t, means, L_inv, logw, logdet, ndim)
        f_t = lq_s - lq_q
        factors = jnp.where(use_t, f_t, jnp.zeros_like(f_t))
        return q, factors

    def update_carry(self, carry, state, model):
        """Fold the post-accept ensemble into the decayed history moments
        (runs once per proposal; cross-shard centered moments via two
        psums — mean first, then the globally-centered scatter)."""
        coords = state.coords
        dtype = coords.dtype
        if self.n_components > 1:
            assign_means = self._assign_means(
                carry, coords, model, local=True
            )
            n_k, mb, cb = self._masked_moments(
                coords, assign_means, model, local=True
            )
            mean, cov, total = self._pooled_k(carry, n_k, mb, cb, dtype)
            return {
                "mean": mean.astype(jnp.float32),
                "cov": cov.astype(jnp.float32),
                "w": total.astype(jnp.float32),
            }
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
