"""The five BASELINE.json workloads, one harness.

BASELINE.json names five reference workloads; bench.py's headline covers
the walker-scaling axis, this module measures every config end to end
(walker-steps/s with storage, tau, effective samples/s) and returns one
dict keyed per workload — recorded in BENCH_r*.json under "workloads".

1. quickstart    — 5D Gaussian, 32 walkers, StretchMove (docs example).
2. line_fit      — 3-parameter linear model, Gaussian likelihood, blobs
                   (the line-fit tutorial; blob = per-walker log-prior).
3. corr100d      — 100D correlated Gaussian, 1e4 walkers, DE+Snooker
                   mixture (the workload3 configuration).
4. pt_multimodal — 5D two-mode Gaussian mixture (8 sigma apart),
                   16-rung parallel tempering; cold-rung ESS.
5. hierarchical  — 1026-dim funnel-free Gaussian hierarchy (256 objects
                   x 4 latents + 2 globals), gradient move (MALA);
                   single-chip here — the multi-host sharding of this
                   workload is exercised by tests/unit/test_multihost.py
                   and benchmarks/scaling.py (pod hardware is gated).

Standalone: ``python benchmarks/workloads5.py [--quick]`` prints one
JSON line.  ``--quick`` shrinks shapes for CPU smoke runs.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x))


def _np_tau_max(chain, thin_by):
    """Host Sokal tau (max over dims), in proposal units."""
    from emcee_tpu.ops.autocorr import integrated_time

    tau = np.asarray(
        integrated_time(np.asarray(chain), quiet=True), np.float64
    )
    return float(np.max(tau)) * thin_by


def _timed_run(sampler, state, kept, thin_by, reps=2, warm_tune=False):
    """Warm (compile) + best-of-``reps`` timed run_mcmc; returns
    (final_state, seconds, chain).  ``warm_tune`` runs the warm-up with
    tune=True (Robbins-Monro acceptance targeting); the adapted scale
    carries into the timed production runs (reset keeps carries)."""
    st = sampler.run_mcmc(
        state, kept, thin_by=thin_by, skip_initial_state_check=True,
        tune=warm_tune,
    )
    _sync(st.log_prob)
    best = float("inf")
    for _ in range(reps):
        sampler.reset()
        t0 = time.perf_counter()
        st = sampler.run_mcmc(
            st, kept, thin_by=thin_by, skip_initial_state_check=True
        )
        _sync(st.log_prob)
        best = min(best, time.perf_counter() - t0)
    return st, best, sampler.get_chain()


def _result(nwalkers, kept, thin_by, dt, chain, extra=None):
    proposals = kept * thin_by
    tau = _np_tau_max(chain, thin_by)
    span = proposals / tau if np.isfinite(tau) and tau > 0 else 0.0
    out = {
        "walker_steps_per_sec": round(nwalkers * proposals / dt, 1),
        "ess_per_sec": round(nwalkers * (proposals / dt) / tau, 1)
        if span
        else float("nan"),
        "tau_proposals": round(tau, 2),
        "tau_reliable": bool(span >= 30.0),
        "proposals": proposals,
        "nwalkers": nwalkers,
    }
    if extra:
        out.update(extra)
    return out


def quickstart(quick=False):
    from emcee_tpu import EnsembleSampler, moves
    from emcee_tpu.backends import DeviceBackend

    nwalkers, ndim = 32, 5
    kept, thin_by = (100, 4) if quick else (400, 10)

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s = EnsembleSampler(
        nwalkers, ndim, log_prob, vectorize=True, seed=0,
        backend=DeviceBackend(),
        moves=moves.StretchMove(),
    )
    p0 = np.random.default_rng(0).normal(size=(nwalkers, ndim)).astype(
        np.float32
    )
    st, dt, chain = _timed_run(s, p0, kept, thin_by)
    return _result(nwalkers, kept, thin_by, dt, chain)


def line_fit(quick=False):
    from emcee_tpu import EnsembleSampler
    from emcee_tpu.backends import DeviceBackend

    rng = np.random.default_rng(42)
    x = np.sort(10 * rng.random(50))
    m_true, b_true, f_true = -0.9594, 4.294, 0.534
    yerr = 0.1 + 0.5 * rng.random(50)
    y = m_true * x + b_true
    y += np.abs(f_true * y) * rng.normal(size=50)
    y += yerr * rng.normal(size=50)
    xj, yj, ej = (jnp.asarray(v, jnp.float32) for v in (x, y, yerr))

    def log_prob(theta):
        m, b, log_f = theta[0], theta[1], theta[2]
        in_bounds = (
            (-5.0 < m) & (m < 0.5)
            & (0.0 < b) & (b < 10.0)
            & (-10.0 < log_f) & (log_f < 1.0)
        )
        model = m * xj + b
        sigma2 = ej**2 + model**2 * jnp.exp(2 * log_f)
        ll = -0.5 * jnp.sum((yj - model) ** 2 / sigma2 + jnp.log(sigma2))
        lp = jnp.where(in_bounds, 0.0, -jnp.inf)
        # blob: the log-prior (the tutorial's blobs pattern)
        return lp + ll, lp

    nwalkers, ndim = 32, 3
    kept, thin_by = (100, 4) if quick else (300, 12)
    s = EnsembleSampler(
        nwalkers, ndim, log_prob, seed=1, backend=DeviceBackend()
    )
    p0 = np.array([m_true, b_true, np.log(f_true)]) + 1e-4 * rng.normal(
        size=(nwalkers, ndim)
    )
    st, dt, chain = _timed_run(s, p0.astype(np.float32), kept, thin_by)
    assert s.get_blobs() is not None
    return _result(
        nwalkers, kept, thin_by, dt, chain, {"blobs": "log-prior"}
    )


def corr100d(quick=False):
    from emcee_tpu import EnsembleSampler, moves
    from emcee_tpu.backends import DeviceBackend

    ndim = 20 if quick else 100
    nwalkers = 512 if quick else 10_000
    rng = np.random.default_rng(3)
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.5 * np.eye(ndim)
    W = jnp.asarray(
        np.linalg.cholesky(np.linalg.inv(cov)), dtype=jnp.float32
    )

    def log_prob(x):
        z = x @ W
        return -0.5 * jnp.sum(z**2, axis=-1)

    s = EnsembleSampler(
        nwalkers, ndim, log_prob, vectorize=True, seed=2,
        backend=DeviceBackend(),
        moves=[(moves.DEMove(), 0.8), (moves.DESnookerMove(), 0.2)],
        mixture_block=32,
        # unroll 4: the remote compile helper has been seen OOM-killed
        # on the unroll-8 mixture program at this shape (SIGKILL in
        # tpu_compile_helper); throughput difference is within noise
        # (round-4 sweep).
        scan_unroll=4,
        io_chunk_bytes=1 << 28,
    )
    chol = np.linalg.cholesky(cov)
    p0 = (rng.normal(size=(nwalkers, ndim)) @ chol.T).astype(np.float32)
    # span >= 30*tau for the honesty flag (mixture tau ~275 proposals)
    kept, thin_by = (64, 4) if quick else (576, 16)
    st, dt, chain = _timed_run(s, p0, kept, thin_by)
    return _result(nwalkers, kept, thin_by, dt, chain)


def pt_multimodal(quick=False):
    from emcee_tpu import PTSampler
    from emcee_tpu.backends.pt import PTDeviceBackend

    ndim = 5
    ntemps = 4 if quick else 16
    nwalkers = 64 if quick else 256
    sep = 4.0  # per-coordinate: 8 sigma between the mode centers

    def log_like(x):
        a = -0.5 * jnp.sum((x - sep) ** 2)
        b = -0.5 * jnp.sum((x + sep) ** 2)
        return jnp.logaddexp(a, b + jnp.log(0.5))

    def log_prior(x):
        return jnp.where(jnp.all(jnp.abs(x) < 50.0), 0.0, -jnp.inf)

    pt = PTSampler(
        ntemps, nwalkers, ndim, log_like, log_prior, seed=4,
        backend=PTDeviceBackend(),
    )
    rng = np.random.default_rng(5)
    p0 = rng.normal(size=(ntemps, nwalkers, ndim)).astype(np.float32)
    p0 += sep * rng.choice([-1.0, 1.0], size=(ntemps, nwalkers, 1))
    kept, thin_by = (64, 2) if quick else (512, 4)

    st = pt.run_mcmc(
        p0, kept, thin_by=thin_by, skip_initial_state_check=True
    )
    _sync(st.log_like)
    best = float("inf")
    for _ in range(2):
        pt.reset()
        t0 = time.perf_counter()
        st = pt.run_mcmc(
            st, kept, thin_by=thin_by, skip_initial_state_check=True
        )
        _sync(st.log_like)
        best = min(best, time.perf_counter() - t0)
    cold = pt.get_chain(temp=0)
    proposals = kept * thin_by
    tau = _np_tau_max(cold, thin_by)
    stats = pt.last_run_stats
    swap_acc = pt.tswap_acceptance_fraction
    out = {
        # every rung's walkers advance per proposal
        "walker_steps_per_sec": round(
            ntemps * nwalkers * proposals / best, 1
        ),
        "ess_per_sec_cold": round(
            nwalkers * (proposals / best) / tau, 1
        ),
        "tau_proposals_cold": round(tau, 2),
        "tau_reliable": bool(proposals / tau >= 30.0),
        "ntemps": ntemps,
        "nwalkers_per_rung": nwalkers,
        "swap_acceptance_mean": round(
            float(np.mean(np.asarray(swap_acc))), 3
        ),
        "proposals": proposals,
    }
    # Mode balance on the cold rung: tempering must actually mix modes.
    frac = float(np.mean(np.asarray(cold)[..., 0] > 0))
    out["cold_mode_fraction"] = round(frac, 3)
    return out


def hierarchical(quick=False):
    from emcee_tpu import EnsembleSampler, moves
    from emcee_tpu.backends import DeviceBackend

    n_obj = 32 if quick else 256
    k = 4
    ndim = n_obj * k + 2
    nwalkers = 256 if quick else 2048
    rng = np.random.default_rng(7)
    obs = jnp.asarray(
        rng.normal(size=(n_obj, k)).astype(np.float32)
    )

    def log_prob(theta):
        mu = theta[0]
        log_tau = theta[1]
        lat = theta[2:].reshape(n_obj, k)
        tau = jnp.exp(log_tau)
        lp = -0.5 * (mu**2 / 25.0) - 0.5 * (log_tau**2)
        lp += jnp.sum(
            -0.5 * ((lat - mu) ** 2) / (tau**2) - jnp.log(tau)
        )
        lp += jnp.sum(-0.5 * (obs - lat) ** 2)
        return lp

    # Diagonal preconditioner: the globals' posterior scales shrink
    # like 1/N relative to the latents (the classic hierarchical-scale
    # problem); an isotropic proposal would accept ~0 at 1026 dims.
    # HMC with a dozen leapfrog steps crosses the log_tau <-> latents
    # coupling that MALA diffuses through (MALA tau on log_tau read
    # ~450 proposals here; HMC reads ~35).
    N = n_obj * k
    cov = np.concatenate(
        [[2.0 / N, 1.0 / N], 0.5 * np.ones(N)]
    ).astype(np.float32)
    # Leapfrog step scales as d^(-1/4) for constant acceptance
    # (Neal 2011); 0.25 at 130 dims reads ~0.46 acceptance, the same
    # scaled step holds that at 1026 dims.
    step = 0.9 * ndim ** (-0.25)
    s = EnsembleSampler(
        nwalkers, ndim, log_prob, seed=6, backend=DeviceBackend(),
        moves=moves.HMCMove(step, n_leapfrog=12, jitter=0.3, cov=cov),
    )
    p0 = 0.1 * rng.normal(size=(nwalkers, ndim)).astype(np.float32)
    p0[:, 1] += 0.5
    kept, thin_by = (64, 2) if quick else (512, 8)
    st, dt, chain = _timed_run(s, p0, kept, thin_by)
    return _result(
        nwalkers, kept, thin_by, dt, chain,
        {"ndim": ndim, "move": "HMC(12)",
         "sharding": "single-chip here; multi-host machinery covered "
         "by tests/unit/test_multihost.py + benchmarks/scaling.py"},
    )


WORKLOADS = {
    "quickstart": quickstart,
    "line_fit": line_fit,
    "corr100d": corr100d,
    "pt_multimodal": pt_multimodal,
    "hierarchical": hierarchical,
}


def run_all(quick=False, phase=lambda msg: None):
    out = {}
    for name, fn in WORKLOADS.items():
        phase(f"workload {name} start")
        try:
            out[name] = fn(quick=quick)
        except Exception as e:  # noqa: BLE001 - the bench line must
            # always be emitted; a single workload failure (e.g. a
            # transient remote-compile kill) is recorded, not fatal.
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        phase(f"workload {name} done")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", choices=sorted(WORKLOADS), default=None)
    args = ap.parse_args()
    if args.only:
        res = {args.only: WORKLOADS[args.only](quick=args.quick)}
    else:
        res = run_all(quick=args.quick)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
