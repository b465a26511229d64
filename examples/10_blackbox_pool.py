"""Black-box Python likelihoods: ``host_callback=True`` + ``pool``.

The reference's parallelization tutorial (``docs/tutorials/parallel.ipynb``)
fans per-walker calls of an expensive *non-vectorizable* Python likelihood
over ``multiprocessing.Pool``.  The TPU-native equivalent: the sampler's
chain machinery stays jitted on the device, and only the likelihood hops
to the host through ``jax.pure_callback``, where a thread/process pool
fans the per-walker calls out (``emcee_tpu/model.py``; reference
``ensemble.py:489-496``).

Blobs work on this path too — their structure is declared up front
(``host_callback_blobs``) because shapes under jit are static.  Strings
ride as fixed-width bytes (``utils.encode_str_blob``).

Use this pattern ONLY when the likelihood truly cannot be written in
JAX (licensed C code, a legacy simulator binary, ...); a JAX rewrite on
a single chip beats any pool by orders of magnitude (docs/parallel.md).
"""

import time

import numpy as np

from emcee_tpu import EnsembleSampler

nwalkers, ndim = 32, 3
nsteps = 40
workers = 4
call_cost_s = 0.0  # set to e.g. 0.005 to see the pool speedup


def simulator_log_like(theta):
    """Stand-in for a black-box model: plain numpy in, float out.

    Anything can happen in here — ctypes into Fortran, a subprocess,
    file IO.  It releases the GIL during numpy work, so the internal
    thread pool parallelizes it; for pure-Python compute pass a
    ``multiprocessing.Pool`` as ``pool=`` instead.
    """
    theta = np.asarray(theta)
    if call_cost_s:
        time.sleep(call_cost_s)  # emulate an expensive simulator
    chi2 = float(np.sum((theta - 1.0) ** 2))
    # log-prob first, then blobs (declared below): the per-walker chi2.
    return -0.5 * chi2, np.float32(chi2)


def main():
    p0 = 1.0 + 0.1 * np.random.default_rng(0).normal(
        size=(nwalkers, ndim)
    ).astype(np.float32)

    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        simulator_log_like,
        host_callback=True,          # not JAX-traceable -> host hop
        pool=workers,                # internal thread pool (or any .map)
        host_callback_blobs=[np.float32],
        seed=0,
    )
    t0 = time.perf_counter()
    sampler.run_mcmc(p0, nsteps, progress=False)
    dt = time.perf_counter() - t0

    chain = np.asarray(sampler.get_chain(discard=nsteps // 2, flat=True))
    chi2 = np.asarray(sampler.get_blobs())
    print(f"{nsteps} steps x {nwalkers} walkers in {dt:.2f}s "
          f"({workers} workers)")
    print("posterior mean:", chain.mean(axis=0), "(target: 1.0)")
    print("mean chi2 blob:", float(chi2.mean()))
    assert np.all(np.abs(chain.mean(axis=0) - 1.0) < 0.5)
    return sampler


if __name__ == "__main__":
    main()
