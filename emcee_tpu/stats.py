"""Posterior summary table and arviz export.

The reference ships only ``integrated_time`` and points users at arviz
for everything else (``docs/tutorials/autocorr.ipynb`` imports it).
Here the standard per-parameter report — mean, sd, HDI, Monte-Carlo
standard error, effective sample size, rank-normalized split R-hat,
integrated autocorrelation time — is built in (host-side numpy over the
stored chain; nothing here touches the device), and a one-call arviz
``InferenceData`` bridge is provided for users who have arviz installed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from .ops import autocorr

__all__ = ["hdi", "summary", "Summary", "to_inference_data"]


def hdi(samples, prob: float = 0.94):
    """Highest-density interval of flat samples.

    Args:
        samples: ``(n,)`` or ``(n, d)`` array of draws.
        prob: probability mass of the interval (default 0.94, the arviz
            convention).

    Returns:
        ``(2,)`` or ``(2, d)`` array ``[low, high]`` — the narrowest
        contiguous interval containing ``prob`` of the draws per column.
    """
    x = np.asarray(samples, dtype=np.float64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n = x.shape[0]
    k = max(1, int(np.floor(prob * n)))
    if k >= n:
        lo, hi = x.min(axis=0), x.max(axis=0)
    else:
        s = np.sort(x, axis=0)
        widths = s[k:] - s[: n - k]
        i = np.argmin(widths, axis=0)
        cols = np.arange(x.shape[1])
        lo, hi = s[i, cols], s[i + k, cols]
    out = np.stack([lo, hi])
    return out[:, 0] if squeeze else out


@dataclass
class Summary:
    """Per-parameter posterior summary; ``print()`` renders a table."""

    names: List[str]
    stats: Dict[str, np.ndarray]
    hdi_prob: float

    def to_dict(self) -> Dict[str, Dict[str, float]]:
        """``{param: {stat: value}}`` nested mapping."""
        return {
            name: {k: float(v[i]) for k, v in self.stats.items()}
            for i, name in enumerate(self.names)
        }

    def __getitem__(self, stat: str) -> np.ndarray:
        return self.stats[stat]

    def __repr__(self) -> str:
        lo = 100 * (1 - self.hdi_prob) / 2
        labels = {
            "hdi_lo": f"hdi{lo:.0f}%",
            "hdi_hi": f"hdi{100 - lo:.0f}%",
        }
        cols = list(self.stats)
        widths = {}
        body = {}
        for c in cols:
            vals = [_fmt(v) for v in self.stats[c]]
            body[c] = vals
            widths[c] = max(len(labels.get(c, c)), *(len(v) for v in vals))
        name_w = max(len(n) for n in self.names)
        lines = [
            " " * name_w
            + "  "
            + "  ".join(labels.get(c, c).rjust(widths[c]) for c in cols)
        ]
        for i, name in enumerate(self.names):
            lines.append(
                name.ljust(name_w)
                + "  "
                + "  ".join(body[c][i].rjust(widths[c]) for c in cols)
            )
        return "\n".join(lines)


def _fmt(v: float) -> str:
    if not np.isfinite(v):
        return "nan"
    a = abs(v)
    if a != 0 and (a >= 1e5 or a < 1e-3):
        return f"{v:.2e}"
    return f"{v:.3f}"


def _resolve_names(obj, ndim: int) -> Optional[List[str]]:
    """Parameter labels from a sampler's ``parameter_names``, if any."""
    settings = getattr(obj, "_lp_settings", None)
    if not settings:
        return None
    pn = settings.get("parameter_names")
    if pn is None:
        return None
    if isinstance(pn, (list, tuple)):
        return [str(p) for p in pn]
    names = [""] * ndim
    for name, idx in pn.items():
        ii = np.atleast_1d(np.asarray(idx))
        for j, i in enumerate(ii):
            names[int(i)] = name if ii.size == 1 else f"{name}[{j}]"
    return names


def summary(
    obj,
    *,
    var_names: Optional[List[str]] = None,
    discard: int = 0,
    thin: int = 1,
    hdi_prob: float = 0.94,
    tau_method: str = "sokal",
) -> Summary:
    """Standard posterior report over the stored chain.

    Args:
        obj: an ``EnsembleSampler`` / backend (anything with
            ``get_chain``), or a raw ``(nsteps, nwalkers, ndim)`` chain.
        var_names: parameter labels; defaults to the sampler's
            ``parameter_names`` when available, else ``x0, x1, ...``.
        discard, thin: forwarded to ``get_chain`` (ignored for raw
            arrays — slice those yourself).
        hdi_prob: mass of the highest-density interval column.
        tau_method: autocorrelation-time truncation rule — ``"sokal"``
            (the reference's window, default) or ``"geyer"`` (initial
            monotone sequence, the Stan/arviz convention).

    Returns:
        :class:`Summary` with columns ``mean, sd, hdi_lo, hdi_hi,
        mcse_mean, ess, rhat, tau``.  ``rhat`` is the rank-normalized
        split R-hat over walkers-as-chains (NaN when the chain is too
        short); ``tau`` is in kept steps, matching
        ``get_autocorr_time``'s units times ``thin``.
    """
    if hasattr(obj, "get_chain"):
        chain = np.asarray(obj.get_chain(discard=discard, thin=thin))
    else:
        chain = np.asarray(obj)
    if chain.ndim == 2:
        chain = chain[:, :, None]
    if chain.ndim != 3:
        raise ValueError(
            "expected a (nsteps, nwalkers, ndim) chain, got shape "
            f"{chain.shape}"
        )
    n, nw, ndim = chain.shape
    flat = chain.reshape(n * nw, ndim).astype(np.float64)

    mean = flat.mean(axis=0)
    sd = flat.std(axis=0, ddof=1) if n * nw > 1 else np.full(ndim, np.nan)
    lo, hi = hdi(flat, prob=hdi_prob)
    tau = np.asarray(
        autocorr.integrated_time(chain, quiet=True, method=tau_method)
    )
    ess = np.where(tau > 0, n * nw / tau, np.nan)
    mcse = sd / np.sqrt(np.maximum(ess, 1.0))
    if n >= 8 and nw >= 2:
        rhat = autocorr.rhat(chain)
    else:
        rhat = np.full(ndim, np.nan)

    names = var_names
    if names is None and hasattr(obj, "get_chain"):
        names = _resolve_names(obj, ndim)
    if names is None:
        names = [f"x{i}" for i in range(ndim)]
    if len(names) != ndim:
        raise ValueError(
            f"var_names has {len(names)} entries for {ndim} parameters"
        )

    return Summary(
        names=list(names),
        stats={
            "mean": mean,
            "sd": sd,
            "hdi_lo": lo,
            "hdi_hi": hi,
            "mcse_mean": mcse,
            "ess": ess,
            "rhat": np.asarray(rhat, dtype=np.float64),
            "tau": tau * thin,
        },
        hdi_prob=hdi_prob,
    )


def _posterior_dict(sampler, discard=0, thin=1):
    """arviz-layout dicts: posterior vars (chain, draw, ...) + stats."""
    chain = np.asarray(sampler.get_chain(discard=discard, thin=thin))
    ndim = chain.shape[-1]
    names = _resolve_names(sampler, ndim)
    # arviz dims: (chain, draw) leading — walkers are the chains.
    per_param = np.moveaxis(chain, (0, 1), (1, 0))
    if names is None:
        posterior = {"x": per_param}
    else:
        posterior = {
            name: per_param[:, :, i] for i, name in enumerate(names)
        }
    lp = np.asarray(sampler.get_log_prob(discard=discard, thin=thin))
    sample_stats = {"lp": np.moveaxis(lp, 0, 1)}
    return posterior, sample_stats


def to_inference_data(sampler, *, discard: int = 0, thin: int = 1):
    """Export the stored chain as an ``arviz.InferenceData``.

    Walkers become arviz chains (the convention arviz's own
    ``from_emcee`` uses for the reference sampler); named parameters
    become named posterior variables, the rest a single ``x`` variable
    with a trailing parameter axis.  ``sample_stats.lp`` carries the
    stored log-probabilities.  Requires arviz.
    """
    try:
        import arviz
    except ImportError as e:  # pragma: no cover - arviz optional
        raise ImportError(
            "to_inference_data requires arviz (pip install arviz)"
        ) from e
    posterior, sample_stats = _posterior_dict(
        sampler, discard=discard, thin=thin
    )
    return arviz.from_dict(
        posterior=posterior, sample_stats=sample_stats
    )
