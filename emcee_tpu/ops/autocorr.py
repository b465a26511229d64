"""Integrated autocorrelation time estimation.

Same estimator as the reference (``/root/reference/src/emcee/autocorr.py``):
FFT-based normalized ACF per (walker, dim) series, walker-averaged, then
Sokal's automated windowing ``tau = taus[argmin(arange < c * taus)]`` with a
``tol * tau > n`` convergence check.  Differences:

* the per-dim / per-walker Python loops (``autocorr.py:99-103``) are one
  batched ``jnp.fft`` over the full ``(steps, walkers, dims)`` block — on
  TPU this runs on-device and feeds the built-in convergence monitor;
* windows are selected vectorized over dims.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["function_1d", "integrated_time", "ess", "rhat", "AutocorrError"]

logger = logging.getLogger(__name__)


class AutocorrError(Exception):
    """Raised when the chain is too short for a reliable tau estimate.

    The current estimate is available as the ``tau`` attribute (same
    contract as the reference, ``autocorr.py:126-136``).
    """

    def __init__(self, tau, *args, **kwargs):
        self.tau = tau
        super().__init__(*args, **kwargs)


def next_pow_two(n: int) -> int:
    i = 1
    while i < n:
        i <<= 1
    return i


def _acf_batched(x):
    """Normalized autocorrelation functions along axis 0.

    x: (n, ...) real array -> (n, ...) ACFs, each normalized to acf[0]=1.
    """
    n = x.shape[0]
    m = next_pow_two(n)
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    f = jnp.fft.rfft(xc, n=2 * m, axis=0)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=2 * m, axis=0)[:n]
    return acf / acf[:1]


def function_1d(x):
    """Normalized ACF of a 1-D series (reference ``autocorr.py:20-39``)."""
    x = jnp.atleast_1d(jnp.asarray(x))
    if x.ndim != 1:
        raise ValueError("invalid dimensions for 1D autocorrelation function")
    return np.asarray(_acf_batched(x))


def _mean_acf(x):
    """(n_t, n_w_chunk, n_d) -> walker-summed ACF (n_t, n_d)."""
    return jnp.sum(_acf_batched(x), axis=1)


_mean_acf_jit = jax.jit(_mean_acf)


def _tau_from_f(f, c, n_t):
    """Sokal windowing from the walker-averaged ACF (n_t, n_d)."""
    taus = 2.0 * jnp.cumsum(f, axis=0) - 1.0
    steps = jnp.arange(n_t, dtype=taus.dtype)[:, None]
    mask = steps < c * taus
    # auto_window: first index where the mask fails, else n_t - 1.
    windows = jnp.where(
        jnp.any(mask, axis=0), jnp.argmin(mask, axis=0), n_t - 1
    )
    tau_est = jnp.take_along_axis(taus, windows[None, :], axis=0)[0]
    return tau_est, windows


_tau_from_f_jit = jax.jit(_tau_from_f, static_argnums=(1, 2))


def _walker_mean_acf(x):
    """(n_t, n_w, n_d) -> walker-averaged ACF (n_t, n_d), chunked.

    The padded FFT intermediates are ~``2 * next_pow_two(n_t)`` floats per
    (walker, dim) series; at 1e5 walkers that is multiple GB, so the
    walker-average accumulates chunk-by-chunk instead of one giant batch.
    """
    n_t, n_w, n_d = x.shape
    m = next_pow_two(n_t)
    # Budget ~256 MB of FFT scratch per chunk.
    per_walker = 2 * m * n_d * 8
    chunk = max(1, min(n_w, (256 << 20) // max(per_walker, 1)))
    f = None
    for lo in range(0, n_w, chunk):
        part = _mean_acf_jit(x[:, lo : lo + chunk, :])
        f = part if f is None else f + part
    return f / n_w


def _tau_estimates(x, c):
    n_t = x.shape[0]
    return _tau_from_f_jit(_walker_mean_acf(x), float(c), n_t)


@jax.jit
def _tau_geyer_device(f):
    """Geyer (1992) initial-monotone-sequence tau from the
    walker-averaged ACF ``f`` (n_t, n_d) — the Stan / arviz convention.

    Adjacent-lag pair sums ``G_k = rho_{2k} + rho_{2k+1}`` of a
    reversible chain are positive and decreasing; truncate at the first
    non-positive pair, enforce monotonicity with a running minimum, and
    ``tau = -1 + 2 * sum_k G_k``.

    Runs jitted on whatever device holds ``f`` — with a
    :class:`DeviceBackend` the chain-sized data never leaves HBM (only
    the final ``(n_d,)`` tau does, if the caller fetches it).
    """
    npairs = f.shape[0] // 2
    g = f[0 : 2 * npairs : 2] + f[1 : 2 * npairs : 2]
    pos = g > 0.0
    k_stop = jnp.where(
        jnp.any(~pos, axis=0), jnp.argmin(pos, axis=0), npairs
    )
    g_mono = jax.lax.cummin(g, axis=0)
    keep = jnp.arange(npairs)[:, None] < k_stop[None, :]
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(keep, g_mono, 0.0), axis=0)
    # Antithetic chains can push the raw estimate to (or below) zero,
    # which would make ESS negative/infinite downstream; floor at
    # Stan's convention (ESS capped at N * log10(N), i.e.
    # tau >= 1 / log10(N)).
    n_t = f.shape[0]
    return jnp.maximum(tau, 1.0 / np.log10(max(float(n_t), 10.0)))


def _tau_geyer(f):
    if f.shape[0] // 2 < 1:
        return np.full(f.shape[1:], np.nan)
    return _tau_geyer_device(f)


def integrated_time(x, c=5, tol=50, quiet=False, has_walkers=True,
                    method="sokal"):
    """Estimate the integrated autocorrelation time.

    Accepts ``(n_step,)``, ``(n_step, n_walker)`` (or ``(n_step, n_param)``
    with ``has_walkers=False``), or ``(n_step, n_walker, n_param)`` arrays;
    same semantics, tolerances, and error behavior as the reference
    (``autocorr.py:49-123``).

    ``method`` selects the truncation rule applied to the walker-averaged
    ACF: ``"sokal"`` (the reference's automated window, ``c * tau``) or
    ``"geyer"`` (initial monotone sequence — the Stan / arviz
    convention; ``c`` is ignored).  Both agree within MC error on
    well-behaved chains; Geyer is the more conservative choice on short
    or noisy ones.
    """
    x = jnp.atleast_1d(jnp.asarray(x))
    if x.ndim == 1:
        x = x[:, None, None]
    elif x.ndim == 2:
        x = x[:, None, :] if not has_walkers else x[:, :, None]
    if x.ndim != 3:
        raise ValueError("invalid dimensions")

    n_t = x.shape[0]
    if method == "sokal":
        tau_est, _ = _tau_estimates(x, float(c))
    elif method == "geyer":
        tau_est = _tau_geyer(_walker_mean_acf(x))
    else:
        raise ValueError(f"unknown method: {method!r}")
    tau_est = np.asarray(tau_est, dtype=np.float64)

    flag = tol * tau_est > n_t
    if np.any(flag):
        msg = (
            "The chain is shorter than {0} times the integrated "
            "autocorrelation time for {1} parameter(s). Use this estimate "
            "with caution and run a longer chain!\n"
        ).format(tol, np.sum(flag))
        msg += "N/{0} = {1:.0f};\ntau: {2}".format(tol, n_t / tol, tau_est)
        if not quiet:
            raise AutocorrError(tau_est, msg)
        logger.warning(msg)

    return tau_est


def ess(x, c=5, tol=50, quiet=False, has_walkers=True, method="sokal"):
    """Effective sample size per parameter.

    ``n_step * n_walker / tau`` with tau from :func:`integrated_time` —
    the number of independent draws the chain is worth.  Same input
    layouts, tolerances, and error behavior as ``integrated_time`` (the
    reference exposes only tau, ``autocorr.py:49-123``; this is the
    derived quantity the BASELINE "effective samples/sec" metric uses).
    """
    x = jnp.atleast_1d(jnp.asarray(x))
    tau = integrated_time(
        x, c=c, tol=tol, quiet=quiet, has_walkers=has_walkers,
        method=method,
    )
    n_t = x.shape[0]
    n_w = x.shape[1] if (x.ndim >= 2 and has_walkers) else 1
    return n_t * n_w / tau


def _psrf_device(x):
    """Plain PSRF of an (n, m, d) block, traceable."""
    n = x.shape[0]
    means = x.mean(axis=0)
    between = n * means.var(axis=0, ddof=1)
    within = x.var(axis=0, ddof=1).mean(axis=0)
    var_hat = (n - 1) / n * within + between / n
    return jnp.sqrt(var_hat / within)


def _avg_ranks_1d(v):
    """Average (tie-sharing) ranks of a 1-D vector, traceable.

    Equal-value runs share the mean of their ordinal positions —
    matching ``scipy.stats.rankdata(method="average")``, which the
    degenerate-ensemble behavior of rank-normalized R-hat depends on
    (see :func:`_rank_normalize`)."""
    s = v.shape[0]
    order = jnp.argsort(v)
    sv = v[order]
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), sv[1:] != sv[:-1]]
    )
    gid = jnp.cumsum(new_group) - 1
    pos = jnp.arange(1, s + 1, dtype=sv.dtype)
    gsum = jax.ops.segment_sum(pos, gid, num_segments=s)
    gcnt = jax.ops.segment_sum(
        jnp.ones_like(pos), gid, num_segments=s
    )
    avg = gsum / jnp.maximum(gcnt, 1)
    ranks_sorted = avg[gid]
    return jnp.zeros_like(v).at[order].set(ranks_sorted)


@jax.jit
def _rhat_device(x, folded_median):
    """Rank-normalized max(bulk, tail) R-hat of an (n, m, d) block,
    fully on-device (the convergence monitor runs this against a
    :class:`DeviceBackend` chain without fetching it)."""
    from jax.scipy.special import ndtri

    n, m, d = x.shape

    def rank_norm(block):
        flat = block.reshape(n * m, d)
        ranks = jax.vmap(_avg_ranks_1d, in_axes=1, out_axes=1)(flat)
        z = ndtri((ranks - 0.375) / (n * m + 0.25))
        return z.reshape(n, m, d)

    bulk = _psrf_device(rank_norm(x))
    folded = jnp.abs(x - folded_median)
    tail = _psrf_device(rank_norm(folded))
    return jnp.maximum(bulk, tail)


def _psrf(x):
    """Plain potential scale reduction factor of an (n, m, d) block."""
    n = x.shape[0]
    means = x.mean(axis=0)  # (m, d)
    between = n * means.var(axis=0, ddof=1)  # (d,)
    within = x.var(axis=0, ddof=1).mean(axis=0)  # (d,)
    var_hat = (n - 1) / n * within + between / n
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(var_hat / within)


def _rank_normalize(x):
    """Map an (n, m, d) block to normal scores of its pooled ranks.

    Average ranks (``scipy.stats.rankdata`` ``method="average"``) across
    the pooled sample per parameter, then the inverse-normal transform
    ``Phi^{-1}((r - 3/8) / (S + 1/4))`` (Blom offsets) — Vehtari et al.
    2021, eq. (14).  Average ties matter in the degenerate regimes this
    diagnostic exists to catch: a fully collapsed ensemble (all walkers
    tied) gets one shared rank per draw — zero within- and
    between-chain variance, so R-hat surfaces the degeneracy as NaN —
    where ordinal ranks would fabricate distinct scores and report a
    healthy-looking R-hat.
    """
    from scipy.special import ndtri
    from scipy.stats import rankdata

    n, m, d = x.shape
    flat = x.reshape(n * m, d)
    ranks = rankdata(flat, axis=0, method="average")
    z = ndtri((ranks - 0.375) / (n * m + 0.25))
    return z.reshape(n, m, d)


def rhat(x, split=True, rank_normalized=True):
    """Potential scale reduction factor R-hat, per parameter.

    By default this is the modern rank-normalized split-R-hat of
    Vehtari, Gelman, Simpson, Carpenter & Buerkner (2021): each chain is
    split in half, the pooled draws are rank-normalized (so heavy tails
    and scale changes register), and the reported value is the max of
    the bulk statistic and the same statistic on the *folded* draws
    ``|x - median|`` (which catches tail-variance disagreement).  With
    ``rank_normalized=False`` it reduces to the classic Gelman-Rubin
    split-R-hat on the raw draws.

    Args:
        x: ``(n_step, n_chain)`` or ``(n_step, n_chain, n_param)`` chain
            (the ``get_chain()`` layout, walkers as chains).
        split: split each chain into halves first (split-R-hat), so
            within-chain drift registers too.  Default True.
        rank_normalized: apply rank-normalization and report
            ``max(bulk, tail)`` R-hat.  Default True.

    Returns:
        ``(n_param,)`` array; values near 1 indicate the between-chain
        and within-chain variances agree.  The usual threshold is
        R-hat < 1.01.

    Note: ensemble walkers are *dependent* chains (every proposal uses
    the complementary walkers), so on a single ensemble this is a rough
    stuck-mode / non-stationarity diagnostic rather than a strict
    convergence proof — the same caveat as running arviz on reference
    emcee output.  For a strict R-hat, pass chains from independently
    seeded runs.  No counterpart exists in the reference (its only
    diagnostic is ``integrated_time``); this extends the toolkit.
    """
    on_device = isinstance(x, jax.Array)
    if not on_device:
        x = np.asarray(x, dtype=np.float64)
    if x.ndim == 2:
        x = x[:, :, None]
    if x.ndim != 3:
        raise ValueError("invalid dimensions")
    n = x.shape[0]
    if split:
        h = n // 2
        if h < 2:
            raise ValueError("need at least 4 steps for split R-hat")
        xp = jnp if on_device else np
        x = xp.concatenate([x[:h], x[n - h :]], axis=1)
        n = h
    if x.shape[1] < 2:
        raise ValueError("R-hat needs at least 2 chains")
    if on_device:
        # Fully on-device (jitted): with a DeviceBackend chain nothing
        # chain-sized crosses to the host — only the (n_param,) result
        # if the caller fetches it.
        if not rank_normalized:
            return jax.jit(_psrf_device)(x)
        med = jnp.median(x.reshape(-1, x.shape[-1]), axis=0)
        return _rhat_device(x, med)
    if not rank_normalized:
        return _psrf(x)
    bulk = _psrf(_rank_normalize(x))
    folded = np.abs(x - np.median(x.reshape(-1, x.shape[-1]), axis=0))
    tail = _psrf(_rank_normalize(folded))
    return np.maximum(bulk, tail)
