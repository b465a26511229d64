"""Headline benchmark: walker-steps/sec/chip on the BASELINE.json workload.

Workload: 5D unit Gaussian, 1e5 walkers, StretchMove (the north-star config
from BASELINE.json).  Prints ONE JSON line.

``vs_baseline``: the reference publishes no hardware benchmarks
(BASELINE.md); the only documented throughput anchor for a cheap model is
the interpreted-Python ceiling of ~140 it/s at 32 walkers = 4,480
walker-steps/s (monitor.ipynb, reference ``docs/tutorials/monitor.ipynb``).
We report our measured walker-steps/s/chip divided by that anchor.
"""

import json
import logging
import os
import sys
import time

_T0 = time.perf_counter()


def _phase(msg):
    if os.environ.get("BENCH_DEBUG"):
        print(f"[{time.perf_counter() - _T0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, State
from emcee_tpu import moves

BASELINE_WALKER_STEPS_PER_SEC = 140.0 * 32.0  # reference monitor.ipynb anchor


def _np_integrated_time(x, c=5):
    """Sokal-windowed integrated autocorrelation time, pure numpy.

    Same algorithm as ``emcee_tpu.autocorr.integrated_time`` (walker-mean
    FFT ACF + auto-window), kept host-side so the benchmark issues no
    extra device compiles.  ``x``: (nsteps, nwalkers, ndim).
    """
    try:
        from scipy import fft as _fft

        def _rfft(a, m):
            return _fft.rfft(a, n=m, axis=-1, workers=-1)

        def _irfft(a, m):
            return _fft.irfft(a, n=m, axis=-1, workers=-1)

    except ImportError:  # numpy fallback (promotes to f64, single thread)
        def _rfft(a, m):
            return np.fft.rfft(a, n=m, axis=-1)

        def _irfft(a, m):
            return np.fft.irfft(a, n=m, axis=-1)

    n, nw, nd = x.shape
    m = 1 << (2 * n - 1).bit_length()
    # One real-input FFT over all (walker, dim) series at once, laid out
    # (series, time) so the transform runs along the contiguous axis;
    # scipy keeps float32 (complex64 spectra) and multithreads.  The
    # power spectrum is handed to irfft as a REAL array: passing the
    # complex f*conj(f) (zero imaginary part) hits a ~100x-slower path.
    y = np.ascontiguousarray(
        (x - x.mean(axis=0)).reshape(n, nw * nd).T.astype(np.float32)
    )
    f = _rfft(y, m)
    per_series = _irfft(f.real**2 + f.imag**2, m)[:, :n]
    # Normalize each walker's ACF before averaging (reference
    # function_1d semantics), then average over walkers per dim.
    per_series /= per_series[:, :1]
    acf = per_series.reshape(nw, nd, n).mean(axis=0).T  # (n, nd)
    t = 2.0 * np.cumsum(acf, axis=0) - 1.0
    taus = np.empty(nd)
    for d in range(nd):
        windows = np.arange(n) >= c * t[:, d]
        taus[d] = t[windows.argmax(), d] if windows.any() else t[-1, d]
    return taus


def main():
    # The short-chain tau caution (quiet=True path) logs a warning; keep
    # stdout/stderr to exactly the one JSON line the driver parses.
    logging.getLogger("emcee_tpu.ops.autocorr").setLevel(logging.ERROR)
    nwalkers, ndim = 100_000, 5
    # Chunk length sweep (docs/performance.md): per-dispatch overhead on
    # the tunneled runtime is large enough that 512-step chunks leave
    # ~35% on the table (2.0e9) vs 4096-step chunks (3.18e9); 8192 reads
    # 3.29e9 and the curve plateaus at 16384 (3.33e9; 32768 flat, unroll
    # 8/16/32/64 within noise — round-4 sweep).
    nsteps = 16384

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    # Performance configuration (see docs/performance.md): fixed-split
    # blocked engine (gather/sort-free, the original Goodman & Weare
    # parallel algorithm) + contiguous roll pairing + scan unrolling +
    # the TPU hardware RNG (prng="rbg"; the fused per-step uniform draw
    # is the largest remaining kernel, and rbg cuts it ~1.4x vs
    # threefry).  Statistical correctness of this configuration is
    # enforced by the integration test suite.
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        seed=0,
        prng="rbg",
        moves=moves.StretchMove(randomize_split=False, pair_mode="roll"),
        scan_unroll=16,
    )
    _phase("init")
    # numpy init: an eager jax.random.normal costs a full remote compile
    coords = np.random.default_rng(1).normal(size=(nwalkers, ndim)).astype(
        np.float32
    )
    state = sampler._prepare_state(
        State(coords, random_state=jax.random.key(2, impl="rbg")), True
    )

    _phase("state prepared")
    # PUBLIC-API headline (round 5): run_mcmc(store=False) auto-lifts
    # the dispatch cap to 16384 kept steps — the same jitted chunk the
    # private runner used to be needed for.  One warm call pays the
    # compile; each timed call is exactly one 16384-step dispatch.
    st = sampler.run_mcmc(
        state, nsteps, store=False, skip_initial_state_check=True
    )
    # Forced sync: block_until_ready can return early on the tunneled
    # runtime; fetching a scalar that depends on the full computation
    # forces completion without paying a multi-MB host transfer.
    float(jnp.sum(st.log_prob))

    _phase("headline chunk compiled+warm")
    # Two timed blocks of 3 chunks, keep the faster: the tunneled runtime
    # shows occasional multi-hundred-ms service hiccups that would
    # otherwise punish a single timing window.
    reps = 6
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        # One call, reps*nsteps steps: the run loop dispatches the six
        # 16384-step chunks back-to-back (no sync between them), so the
        # only fixed cost in the window is run_mcmc's single closing
        # block_until_ready (~27 ms tunnel roundtrip — <1% of a 3 s
        # window; it amortizes the same way in real runs).
        st = sampler.run_mcmc(
            None, reps * nsteps, store=False,
            skip_initial_state_check=True,
        )
        float(jnp.sum(st.log_prob))
        dt = min(dt, time.perf_counter() - t0)

    # Sanity: the chain must actually be sampling (acceptance ~0.5-0.6
    # for a=2 stretch on a Gaussian; mean log-prob ~ -ndim/2).
    mean_lp = float(jnp.mean(st.log_prob))
    assert -0.7 * ndim < mean_lp < -0.3 * ndim, mean_lp

    steps_per_sec = reps * nsteps / dt
    walker_steps_per_sec = steps_per_sec * nwalkers

    # Second BASELINE headline: effective samples/sec, measured honestly
    # with chain storage ON (device->host streaming included) and tau
    # estimated from the stored chain.  thin_by ~ tau/2 is the reference's
    # own storage practice (monitor.ipynb thins by tau_min/2 = 24), keeps
    # the stored samples long enough for a reliable Sokal estimate
    # (kept * thin ~ 45 * tau), and reflects how a converged production
    # run actually stores.  Timing: one warm-up run pays the XLA compile,
    # the second (timed) run measures the steady state incl. the full
    # device->host chain stream.  A separate sampler with a small
    # scan_unroll keeps this chunk shape's XLA compile short (the remote
    # compiler charges minutes for large unrolled store=True programs).
    _phase("headline measured")
    thin_by, kept = 20, 100
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        seed=1,
        moves=moves.StretchMove(randomize_split=False, pair_mode="roll"),
        scan_unroll=4,
        # 32MB chunks + the async device->host DMA kick pipeline the
        # chain stream with the next chunk's compute: measured 2.96e7
        # streamed walker-steps/s vs 1.94e7 for a single 512MB chunk
        # with blocking fetches (same session; docs/performance.md).
        io_chunk_bytes=1 << 25,
    )
    _phase("ess sampler built")
    st = sampler.run_mcmc(
        st, kept, thin_by=thin_by, skip_initial_state_check=True
    )
    _phase("ess warm-up run done (compile paid)")
    # Best-of-2, same policy as the other timings (tunnel hiccups).
    dt_store = float("inf")
    for _ in range(2):
        sampler.reset()
        t1 = time.perf_counter()
        st = sampler.run_mcmc(
            st, kept, thin_by=thin_by, skip_initial_state_check=True
        )
        dt_store = min(dt_store, time.perf_counter() - t1)
    _phase("ess runs done")
    # Host-numpy Sokal tau (same estimator as emcee_tpu.autocorr): the
    # device FFT path would add several eager compiles, each a remote
    # round trip that can cost minutes when the compile service is busy.
    chain = np.asarray(sampler.get_chain())  # (kept, nw, nd)
    tau = _np_integrated_time(chain) * thin_by  # -> proposal units
    tau_max = float(np.max(tau))
    _phase("tau done")
    proposals_per_sec = kept * thin_by / dt_store
    ess_host_stream = nwalkers * proposals_per_sec / tau_max

    # Device-resident storage (DeviceBackend): the chain lands in HBM with
    # no device->host stream, which is the framework's native storage mode
    # on TPU (diagnostics run on device; download-on-demand).  tau is
    # reused from the identically-configured host-streamed chain.  The
    # chunk budget is per-stage: the host-stream stage wants small (32MB)
    # chunks so transfers pipeline, but with no transfer to overlap the
    # device path prefers fewer, larger dispatches — sweep (round 4):
    # 2^25 -> 1.28e9, 2^28 -> 1.36e9 stored ws/s, 2^30 regresses (8.6e8,
    # compile/HBM pressure), unroll 4 vs 16 within noise.
    from emcee_tpu.backends import DeviceBackend

    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        seed=1,
        prng="rbg",
        moves=moves.StretchMove(randomize_split=False, pair_mode="roll"),
        scan_unroll=4,
        io_chunk_bytes=1 << 28,
    )
    sampler.backend = DeviceBackend()
    sampler.backend.reset(nwalkers, ndim)
    st2 = sampler.run_mcmc(
        st, kept, thin_by=thin_by, skip_initial_state_check=True
    )
    float(jnp.sum(st2.log_prob))  # forced sync (see note above)
    _phase("device-backend warm run done")
    dt_dev = float("inf")
    for _ in range(3):
        sampler.backend.reset(nwalkers, ndim)
        t2 = time.perf_counter()
        st2 = sampler.run_mcmc(
            st2, kept, thin_by=thin_by, skip_initial_state_check=True
        )
        float(jnp.sum(st2.log_prob))  # per-run forced sync
        dt_dev = min(dt_dev, time.perf_counter() - t2)
    _phase("device-backend timed runs done")
    dev_proposals_per_sec = kept * thin_by / dt_dev
    ess_per_sec = nwalkers * dev_proposals_per_sec / tau_max

    # Gradient-move headline (beyond the BASELINE-prescribed StretchMove):
    # MALA on the same target.  Two fused gradient evaluations per step
    # cost ~1.5x a stretch step while tau drops ~15x, so this is the
    # framework's best effective-samples rate; reported as an extra key.
    _phase("mala stage start")
    mala = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        seed=2,
        prng="rbg",
        moves=moves.MALAMove(1.0),
        scan_unroll=8,
        backend=DeviceBackend(),
        io_chunk_bytes=1 << 30,
    )
    # Same measurement basis as ess_per_sec above: timed through run_mcmc
    # with DeviceBackend storage (the save is a device-array append; the
    # chain stays in HBM).  The warm-up run doubles as the tau source —
    # MALA tau ~ 3 proposals, so 120 kept rows x thin 2 span ~80 tau.
    m_kept, m_thin = 500, 2
    m_st = mala.run_mcmc(
        State(coords, random_state=jax.random.key(3, impl="rbg")),
        m_kept,
        thin_by=m_thin,
        skip_initial_state_check=True,
    )
    _phase("mala compiled+warm")
    m_chain = np.asarray(mala.get_chain()[:120])  # pull only what tau needs
    tau_mala = max(float(np.max(_np_integrated_time(m_chain))) * m_thin, 1.0)
    _phase("mala tau done")
    dt_m = float("inf")
    for _ in range(2):
        mala.backend.reset(nwalkers, ndim)
        t3 = time.perf_counter()
        m_st = mala.run_mcmc(
            m_st, m_kept, thin_by=m_thin, skip_initial_state_check=True
        )
        float(jnp.sum(m_st.log_prob))
        dt_m = min(dt_m, time.perf_counter() - t3)
    mala_steps_per_sec = m_kept * m_thin / dt_m
    ess_mala = nwalkers * mala_steps_per_sec / tau_mala
    _phase("mala stage done")

    # Gradient-free ESS headline: DIME with a pure Gaussian adaptive
    # independence proposal (df=None).  Once the proposal moments have
    # locked onto the target, draws are near-iid (probe: tau 1.0,
    # acceptance 0.9998, 3.1e8 ESS/s — above MALA's 2.2e8 and 13x the
    # stretch ESS rate).  Honest caveat: a Gaussian target is this
    # proposal's best case (docs/performance.md).
    _phase("dime stage start")
    dime = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        seed=3,
        moves=moves.DIMEMove(
            aimh_prob=1.0, df=None, randomize_split=False
        ),
        scan_unroll=8,
        backend=DeviceBackend(),
        io_chunk_bytes=1 << 30,
    )
    d_kept, d_thin = 400, 1
    d_st = dime.run_mcmc(
        State(coords, random_state=jax.random.key(4)),
        d_kept,
        thin_by=d_thin,
        skip_initial_state_check=True,
    )
    _phase("dime compiled+warm")
    d_chain = np.asarray(dime.get_chain()[:, :512, :])
    tau_dime = max(
        float(np.max(_np_integrated_time(d_chain))) * d_thin, 1.0
    )
    _phase("dime tau done")
    dt_d = float("inf")
    for _ in range(2):
        dime.backend.reset(nwalkers, ndim)
        t4 = time.perf_counter()
        d_st = dime.run_mcmc(
            d_st, d_kept, thin_by=d_thin, skip_initial_state_check=True
        )
        float(jnp.sum(d_st.log_prob))
        dt_d = min(dt_d, time.perf_counter() - t4)
    dime_steps_per_sec = d_kept * d_thin / dt_d
    ess_dime = nwalkers * dime_steps_per_sec / tau_dime
    _phase("dime stage done")

    # Non-Gaussian DIME stage (bench honesty): the Gaussian-target number
    # above is the adaptive independence proposal's best case.  This
    # stage runs the hard case — an asymmetric bimodal (equal-mass modes
    # of 5x different scale, 12 sigma apart) with the K=2 mixture
    # proposal — so the headline cannot be mistaken for the general
    # case.  Same measurement basis (run_mcmc through DeviceBackend).
    _phase("dime bimodal stage start")
    b_ndim, b_sep, b_small = 3, 6.0, 0.2

    def log_prob_bimodal(x):
        a = -0.5 * jnp.sum((x + b_sep) ** 2, axis=-1)
        b = (
            -0.5 * jnp.sum((x - b_sep) ** 2, axis=-1) / b_small**2
            - b_ndim * np.log(b_small)
        )
        return jnp.logaddexp(a, b)

    dime_b = EnsembleSampler(
        nwalkers,
        b_ndim,
        log_prob_bimodal,
        vectorize=True,
        seed=5,
        moves=moves.DIMEMove(
            aimh_prob=0.3, n_components=2, randomize_split=False
        ),
        scan_unroll=8,
        backend=DeviceBackend(),
        io_chunk_bytes=1 << 30,
    )
    rngb = np.random.default_rng(6)
    coords_b = np.concatenate(
        [
            rngb.normal(size=(nwalkers // 2, b_ndim)) - b_sep,
            rngb.normal(size=(nwalkers // 2, b_ndim)) * b_small + b_sep,
        ]
    ).astype(np.float32)
    b_kept, b_thin = 400, 2
    b_st = dime_b.run_mcmc(
        State(coords_b, random_state=jax.random.key(7)),
        b_kept,
        thin_by=b_thin,
        skip_initial_state_check=True,
    )
    _phase("dime bimodal compiled+warm")
    b_chain = np.asarray(dime_b.get_chain()[:, :512, :])
    tau_dime_b = max(
        float(np.max(_np_integrated_time(b_chain))) * b_thin, 1.0
    )
    # Sanity: both modes occupied with the right masses.
    frac_b = float((b_chain[b_kept // 2:, :, 0] > 0).mean())
    assert 0.4 < frac_b < 0.6, frac_b
    _phase("dime bimodal tau done")
    dt_b = float("inf")
    for _ in range(2):
        dime_b.backend.reset(nwalkers, b_ndim)
        t5 = time.perf_counter()
        b_st = dime_b.run_mcmc(
            b_st, b_kept, thin_by=b_thin, skip_initial_state_check=True
        )
        float(jnp.sum(b_st.log_prob))
        dt_b = min(dt_b, time.perf_counter() - t5)
    ess_dime_bimodal = (
        nwalkers * (b_kept * b_thin / dt_b) / tau_dime_b
    )
    _phase("dime bimodal stage done")

    # The five BASELINE.json workload configs, one keyed entry each
    # (walker-steps/s + ESS/s + tau honesty flag); see
    # benchmarks/workloads5.py.  BENCH_SKIP_WORKLOADS=1 opts out for
    # quick headline-only runs.
    workloads = None
    if os.environ.get("BENCH_SKIP_WORKLOADS") != "1":
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"
            ),
        )
        from workloads5 import run_all as _run_workloads

        workloads = _run_workloads(phase=_phase)

    print(
        json.dumps(
            {
                "metric": "walker_steps_per_sec_per_chip",
                "value": round(walker_steps_per_sec, 1),
                "unit": "walker-steps/s",
                "vs_baseline": round(
                    walker_steps_per_sec / BASELINE_WALKER_STEPS_PER_SEC, 2
                ),
                "ess_per_sec": round(ess_per_sec, 1),
                "ess_per_sec_mala": round(ess_mala, 1),
                "ess_per_sec_dime": round(ess_dime, 1),
                "dime_tau_proposals": round(tau_dime, 2),
                "dime_walker_steps_per_sec": round(
                    nwalkers * dime_steps_per_sec, 1
                ),
                "dime_basis": "gradient-free adaptive independence "
                "(DIMEMove df=None), DeviceBackend, same basis as "
                "ess_per_sec; Gaussian target = proposal's best case",
                "ess_per_sec_dime_bimodal": round(ess_dime_bimodal, 1),
                "dime_bimodal_tau_proposals": round(tau_dime_b, 2),
                "dime_bimodal_basis": "asymmetric bimodal (5x scale "
                "ratio, 12 sigma), DIMEMove n_components=2 "
                "aimh_prob=0.3, same DeviceBackend basis — the "
                "non-best-case DIME number",
                "ess_mala_basis": "run_mcmc through DeviceBackend, "
                "same as ess_per_sec",
                "mala_walker_steps_per_sec": round(
                    nwalkers * mala_steps_per_sec, 1
                ),
                "mala_tau_proposals": round(tau_mala, 2),
                "ess_storage": "device-HBM (DeviceBackend)",
                "ess_per_sec_host_stream": round(ess_host_stream, 1),
                "ess_tau_max_proposals": round(tau_max, 2),
                "stored_walker_steps_per_sec": round(
                    nwalkers * dev_proposals_per_sec, 1
                ),
                "host_streamed_walker_steps_per_sec": round(
                    nwalkers * proposals_per_sec, 1
                ),
                **(
                    {"workloads": workloads}
                    if workloads is not None
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
