"""Moves-tutorial tau oracle (reference ``docs/tutorials/moves.ipynb``).

On a bimodal 1D mixture (modes at +-2), the reference measures integrated
autocorrelation time ~40 for the plain StretchMove and ~6.5 for the
DE(0.8)+Snooker(0.2) mixture.  Reproducing that ordering (and rough
magnitudes) validates the statistical behavior of the move family end to
end — the BASELINE correctness anchor for workload-style mixing claims.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves


def logprob(x):
    # Mixture of N(-2, 1) and N(2, 1) (reference moves.ipynb cell 1).
    return jnp.sum(
        jnp.logaddexp(-0.5 * (x - 2) ** 2, -0.5 * (x + 2) ** 2)
        - 0.5 * jnp.log(2 * jnp.pi)
        - jnp.log(2.0)
    )


def _tau(move, nsteps=5000, seed=589):
    nwalkers, ndim = 32, 1
    coords = 4.0 * np.asarray(
        jax.random.normal(jax.random.key(seed), (nwalkers, ndim))
    )
    sampler = EnsembleSampler(
        nwalkers, ndim, logprob, moves=move, seed=seed
    )
    sampler.run_mcmc(coords, nsteps)
    return float(
        sampler.get_autocorr_time(discard=500, quiet=True)[0]
    )


def test_de_mixture_beats_stretch():
    tau_stretch = _tau(moves.StretchMove())
    tau_mix = _tau(
        [(moves.DEMove(), 0.8), (moves.DESnookerMove(), 0.2)]
    )
    # Reference values: ~40 vs ~6.5.  Allow generous windows; the
    # ordering and a >2.5x improvement are the real assertions.
    assert 15 < tau_stretch < 90, tau_stretch
    assert 3 < tau_mix < 16, tau_mix
    assert tau_mix * 2.5 < tau_stretch


def test_dime_beats_de_mixture_on_bimodal():
    """On the same bimodal oracle target, DIME's independence component
    should mix at least as fast as the DE+Snooker mixture once adapted
    (the reference's best config reads tau ~6.5 here)."""
    tau_mix = _tau([(moves.DEMove(), 0.8), (moves.DESnookerMove(), 0.2)])
    tau_dime = _tau(moves.DIMEMove(aimh_prob=0.25))
    assert tau_dime < 16, tau_dime
    assert tau_dime < tau_mix * 1.5, (tau_dime, tau_mix)
