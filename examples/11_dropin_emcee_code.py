"""Drop-in emcee code: untraceable functions and dynamic blobs.

Reference-style numpy log-probs — data-dependent ``if``s, ``float()``
casts, string/object blobs — now work UNCHANGED: the sampler probes
traceability at construction (one abstract trace) and, when the
function cannot trace, falls back to per-walker host evaluation — the
reference's own execution model — with full dynamic-blob support
(``emcee_tpu/hostblobs.py``; reference ``ensemble.py:486-547``).

The conformance proof lives in ``reference_suite/``: the reference's
own test modules run against this package (143 passed, 19 justified
skips — docs/migrating.md).

Expect the host path to be ~the reference's speed (it IS per-walker
Python); write the log-prob in JAX for the 10^5-10^6x TPU numbers.
"""

import numpy as np

from emcee_tpu import EnsembleSampler

nwalkers, ndim = 32, 3
nsteps = 200


# Classic emcee-tutorial style: numpy, a hard prior bound via a Python
# branch, and two blobs — one of them a *string*.
def log_prob(theta):
    if np.any(np.abs(theta) > 10.0):       # data-dependent branch
        return -np.inf, -np.inf, "out-of-bounds"
    log_prior = -0.5 * float(np.sum(theta**2)) / 25.0   # float() cast
    log_like = -0.5 * float(np.sum(theta**2))
    return log_like + log_prior, log_prior, "ok"


def main():
    sampler = EnsembleSampler(nwalkers, ndim, log_prob)
    print("evaluation mode:", sampler._evaluation_mode)  # host-fallback
    assert sampler._evaluation_mode == "host-fallback"

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(nwalkers, ndim))
    sampler.run_mcmc(p0, nsteps)

    # Blobs come back with the reference's object-array semantics: one
    # (steps, walkers, 2) object array holding (log_prior, status).
    blobs = sampler.get_blobs()
    print("blobs:", blobs.shape, blobs.dtype)
    assert blobs.dtype == np.dtype("object")
    print("statuses seen:", sorted({b for b in blobs[..., 1].ravel()}))
    print("acceptance:", float(np.mean(sampler.acceptance_fraction)))

    # Legacy unpack works on returned states too (4 elements here
    # because this state carries blobs; blob-less states unpack as 3):
    coords, log_p, rstate, final_blobs = sampler.run_mcmc(None, 10)
    print("resumed; final coords:", coords.shape)
    return sampler


if __name__ == "__main__":
    main()
