"""User-defined moves through both extension points (docs/moves.md
"Writing your own move"): a custom MHMove proposal function and a
RedBlueMove subclass, each held to the standard statistical oracle.

Reference pattern: the moves tutorial's custom-proposal example and
``emcee.moves.MHMove`` / ``RedBlueMove`` subclassing
(``/root/reference/src/emcee/moves/mh.py``, ``red_blue.py:47-50``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves

from .test_proposal import _test_normal, normal_log_prob


def test_custom_mh_proposal():
    def my_proposal(key, coords):
        q = coords + 0.7 * jax.random.normal(key, coords.shape)
        return q, jnp.zeros(coords.shape[0])

    _test_normal(moves.MHMove(my_proposal), nsteps=4000)


def test_custom_mh_proposal_with_carry():
    """3-arg signature: explicit move state threads through the scan."""

    def my_proposal(key, coords, carry):
        # Alternate between two step sizes by parity of the carried count.
        step = jnp.where(carry["t"] % 2 == 0, 0.5, 0.9)
        q = coords + step * jax.random.normal(key, coords.shape)
        return q, jnp.zeros(coords.shape[0]), {"t": carry["t"] + 1}

    mv = moves.MHMove(my_proposal)
    mv.init_carry = lambda nw, nd: {"t": jnp.zeros((), jnp.int32)}
    _test_normal(mv, nsteps=4000)


class MyStretch(moves.RedBlueMove):
    """The docs example: a from-scratch Goodman-Weare stretch."""

    def __init__(self, a=2.0, **kwargs):
        self.a = a
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model):
        c = jnp.concatenate(c_parts, axis=0)
        k_pair, k_z = jax.random.split(key)
        partners = c[
            jax.random.randint(k_pair, (s.shape[0],), 0, c.shape[0])
        ]
        u = jax.random.uniform(k_z, (s.shape[0],))
        z = ((self.a - 1.0) * u + 1.0) ** 2 / self.a
        q = partners - z[:, None] * (partners - s)
        return q, (model.global_ndim(s.shape[1]) - 1.0) * jnp.log(z)


def test_custom_red_blue_subclass():
    _test_normal(MyStretch(), ndim=3, nsteps=2000)


def test_custom_move_in_mixture():
    """Custom moves compose with the mixture machinery like built-ins."""
    _test_normal(
        [(MyStretch(), 0.5), (moves.DEMove(), 0.5)], ndim=2, nsteps=2000
    )
