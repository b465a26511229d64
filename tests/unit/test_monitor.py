"""Convergence-monitor tests (the reference monitor-tutorial pattern)."""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import ConvergenceMonitor, EnsembleSampler, run_until_converged


def normal_log_prob(params):
    return -0.5 * jnp.sum(params**2)


def test_run_until_converged():
    nwalkers, ndim = 32, 2
    sampler = EnsembleSampler(nwalkers, ndim, normal_log_prob, seed=0)
    coords = np.asarray(
        jax.random.normal(jax.random.key(0), (nwalkers, ndim))
    )
    monitor = ConvergenceMonitor(tau_factor=50.0, dtau_rel=0.05)
    state, monitor = run_until_converged(
        sampler,
        coords,
        max_steps=20_000,
        check_every=2_000,
        monitor=monitor,
    )
    assert monitor.tau is not None
    # Converged: chain length exceeded tau_factor * tau.
    assert np.all(monitor.tau * 50.0 < sampler.iteration)
    # And the posterior is right.
    chain = sampler.get_chain(
        flat=True, discard=int(3 * monitor.tau.max())
    )
    assert np.all(np.abs(chain.mean(0)) < 0.1)


def test_monitor_not_converged_short():
    monitor = ConvergenceMonitor(tau_factor=100.0)
    rng = np.random.default_rng(0)
    # A strongly autocorrelated short chain cannot converge.
    n = 200
    x = np.cumsum(rng.normal(size=(n, 4, 2)), axis=0)
    assert not monitor.update(x)


def test_monitor_rhat_gate_blocks_stuck_chain():
    """A chain with one stuck walker can have a stable finite tau but
    must fail the R-hat gate."""
    rng = np.random.default_rng(0)
    n, nw, nd = 4000, 8, 2
    x = rng.normal(size=(n, nw, nd))
    # One walker frozen at an offset mode: between-chain variance blows
    # up the split R-hat while per-walker tau stays tiny.
    x[:, 0, :] = 5.0 + 0.01 * rng.normal(size=(n, nd))
    gated = ConvergenceMonitor(tau_factor=10.0, rhat_threshold=1.01)
    ungated = ConvergenceMonitor(tau_factor=10.0)
    assert ungated.update(x)  # tau alone is fooled
    assert not gated.update(x)
    assert gated.rhat is not None and np.any(gated.rhat > 1.01)


def test_monitor_rhat_gate_passes_good_chain():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4000, 8, 2))
    m = ConvergenceMonitor(tau_factor=10.0, rhat_threshold=1.01)
    assert m.update(x)
    assert np.all(m.rhat < 1.01)


def test_monitor_rhat_short_chain_skipped():
    """Threshold set but the chain is too short for split R-hat: the
    update must not crash and must not report convergence."""
    rng = np.random.default_rng(2)
    m = ConvergenceMonitor(tau_factor=1.0, rhat_threshold=1.01)
    assert not m.update(rng.normal(size=(6, 8, 2)))
    assert m.rhat is None


def test_run_stats():
    from emcee_tpu.profiling import RunStats

    sampler = EnsembleSampler(16, 2, normal_log_prob, seed=0)
    coords = np.asarray(
        jax.random.normal(jax.random.key(0), (16, 2))
    )
    sampler.run_mcmc(coords, 20, thin_by=2)
    stats = sampler.last_run_stats
    assert isinstance(stats, RunStats)
    assert stats.nsteps == 20
    assert stats.nproposals == 40
    assert stats.nwalkers == 16
    assert stats.walltime_s > 0
    assert stats.walker_steps_per_sec > 0
    assert "walker-steps/s" in stats.summary()


def test_functional_kernel_api():
    """build_kernel: pure init/step composable into a user scan."""
    from emcee_tpu.kernels import build_kernel

    nw, nd = 32, 3
    init, step = build_kernel(normal_log_prob, nwalkers=nw)
    coords = jax.random.normal(jax.random.key(0), (nw, nd))
    state, carry = init(coords, jax.random.key(1))

    def body(sc, _):
        state, accepted, carry = step(*sc)
        return (state, carry), (state.coords, accepted)

    (state, carry), (chain, accs) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=1500)
    )((state, carry))
    chain = np.asarray(chain[500:]).reshape(-1, nd)
    assert np.all(np.abs(chain.mean(0)) < 0.1)
    assert np.all(np.abs(chain.std(0) - 1) < 0.08)
    acc_rate = np.asarray(accs).mean()
    assert 0.1 < acc_rate < 0.9


def test_profiler_trace_smoke(tmp_path):
    from emcee_tpu.profiling import trace

    sampler = EnsembleSampler(8, 2, normal_log_prob, seed=0)
    coords = np.asarray(jax.random.normal(jax.random.key(0), (8, 2)))
    with trace(str(tmp_path)):
        sampler.run_mcmc(coords, 5, skip_initial_state_check=True)
    # A profile directory must have been produced.
    produced = list(tmp_path.rglob("*"))
    assert produced, "no trace output written"


def test_run_until_converged_device_backend():
    """The monitor loop with an HBM-resident chain: tau is estimated from
    the device-resident store (no host streaming during the run)."""
    from emcee_tpu import EnsembleSampler, backends, run_until_converged

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = EnsembleSampler(
        32, 2, lp, backend=backends.DeviceBackend(), seed=0
    )
    p0 = np.random.default_rng(0).normal(size=(32, 2))
    state, monitor = run_until_converged(
        s, p0, max_steps=30_000, check_every=1_000
    )
    assert monitor.tau is not None
    assert np.all(np.isfinite(np.asarray(monitor.tau)))
    # converged well before max_steps (tau ~ 10 for stretch on 2-D)
    assert s.iteration < 30_000
    assert isinstance(s.get_chain(), jax.Array)


def test_kernel_api_with_gradient_move():
    """build_kernel drives a MALA step inside a user lax.scan."""
    from emcee_tpu.kernels import build_kernel
    from emcee_tpu import moves

    nw, nd = 32, 2

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    init, step = build_kernel(lp, nwalkers=nw, move=moves.MALAMove(1.0))
    coords = jnp.asarray(
        np.random.default_rng(0).normal(size=(nw, nd))
    )
    state, carry = init(coords, jax.random.key(1))

    def body(c, _):
        state, carry = c
        state, accepted, carry = step(state, carry)
        return (state, carry), accepted

    (state, carry), acc = jax.lax.scan(
        body, (state, carry), None, length=300
    )
    chain_std = float(jnp.std(state.coords))
    assert 0.6 < chain_std < 1.5, chain_std
    assert 0.2 < float(jnp.mean(acc)) < 0.95


def test_run_until_converged_pt():
    """run_until_converged drives a PTSampler, judging the cold rung."""
    import emcee_tpu
    from emcee_tpu import ConvergenceMonitor, run_until_converged

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return 0.0

    pt = emcee_tpu.PTSampler(3, 32, 2, ll, lp, seed=0)
    c0 = np.asarray(jax.random.normal(jax.random.key(1), (3, 32, 2)))
    state, mon = run_until_converged(
        pt,
        c0,
        max_steps=3000,
        check_every=500,
        monitor=ConvergenceMonitor(tau_factor=50.0, dtau_rel=0.05),
    )
    assert mon.tau is not None and mon.tau.shape == (2,)
    # stopped early = the criterion fired on the cold-rung chain
    assert pt.backend.iteration < 3000
    # the judged chain was the cold rung
    assert pt.get_chain(temp=0).ndim == 3
