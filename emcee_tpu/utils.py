"""Walker-initialization helpers.

Key-based equivalents of the reference's deprecated ``sample_ball`` /
``sample_ellipsoid`` initializers (``/root/reference/src/emcee/utils.py:31-62``)
— the tutorials' ``p0 + std * randn`` ball-init pattern, kept first-class.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_ball", "sample_ellipsoid"]


def sample_ball(key, p0, std, size=1):
    """Produce a ball of walkers around an initial parameter value.

    Args:
        key: PRNG key.
        p0: ``(ndim,)`` center.
        std: ``(ndim,)`` axis-aligned scatter.
        size: number of walkers.
    """
    p0 = jnp.asarray(p0)
    std = jnp.asarray(std)
    return p0 + std * jax.random.normal(key, (size, p0.shape[0]), dtype=p0.dtype)


def sample_ellipsoid(key, p0, covmat, size=1):
    """Produce an ellipsoid of walkers around an initial parameter value.

    Args:
        key: PRNG key.
        p0: ``(ndim,)`` center.
        covmat: ``(ndim, ndim)`` covariance of the scatter.
        size: number of walkers.
    """
    p0 = jnp.asarray(p0)
    return jax.random.multivariate_normal(
        key, p0, jnp.asarray(covmat), (size,), dtype=p0.dtype
    )
