"""Walker-init and MAP-finder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import utils

try:
    import optax  # noqa: F401

    HAS_OPTAX = True
except ImportError:  # pragma: no cover
    HAS_OPTAX = False
needs_optax = pytest.mark.skipif(
    not HAS_OPTAX, reason="optax not installed (pip install emcee-tpu[optim])"
)


def test_sample_ball_shape_and_scatter():
    p0 = jnp.array([1.0, -2.0, 3.0])
    std = jnp.array([0.1, 0.2, 0.3])
    ball = utils.sample_ball(jax.random.key(0), p0, std, size=4096)
    assert ball.shape == (4096, 3)
    assert np.allclose(np.asarray(ball).mean(0), p0, atol=0.02)
    assert np.allclose(np.asarray(ball).std(0), std, rtol=0.1)


def test_sample_ellipsoid_cov():
    cov = jnp.array([[1.0, 0.7], [0.7, 1.0]])
    pts = utils.sample_ellipsoid(
        jax.random.key(1), jnp.zeros(2), cov, size=20_000
    )
    emp = np.cov(np.asarray(pts).T)
    assert np.allclose(emp, cov, atol=0.05)


@needs_optax
def test_find_map_quadratic():
    mu = jnp.array([2.0, -1.0, 0.5])

    def lp(x):
        return -0.5 * jnp.sum((x - mu) ** 2)

    x_map, v = utils.find_map(lp, jnp.zeros(3), steps=2000)
    assert np.allclose(np.asarray(x_map), mu, atol=1e-2)
    assert abs(float(v)) < 1e-3


@needs_optax
def test_find_map_multistart_picks_global_mode():
    # Two Gaussian modes; the one at +3 is taller.
    def lp(x):
        a = -0.5 * jnp.sum((x - 3.0) ** 2) / 0.1
        b = -0.5 * jnp.sum((x + 3.0) ** 2) / 0.1 - 2.0
        return jnp.logaddexp(a, b)

    starts = jnp.array([[-3.2, -2.9], [2.8, 3.1]])
    x_map, v = utils.find_map(lp, starts, steps=500)
    assert np.allclose(np.asarray(x_map), 3.0, atol=0.05)
    xs, vs = utils.find_map(lp, starts, steps=500, return_all=True)
    assert xs.shape == (2, 2) and vs.shape == (2,)
    assert vs[1] > vs[0]
    assert np.allclose(np.asarray(xs[0]), -3.0, atol=0.05)


@needs_optax
def test_find_map_hard_prior_boundary():
    """-inf prior outside (0, 10): nonfinite gradients must not poison
    the iterate when the optimum is interior."""

    def lp(x):
        inside = jnp.all((x > 0.0) & (x < 10.0))
        return jnp.where(
            inside, -0.5 * jnp.sum((x - 4.0) ** 2), -jnp.inf
        )

    x_map, v = utils.find_map(lp, jnp.array([1.0, 9.0]), steps=2000)
    assert np.all(np.isfinite(np.asarray(x_map)))
    assert np.allclose(np.asarray(x_map), 4.0, atol=0.05)


@needs_optax
def test_find_map_blob_log_prob():
    def lp(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x)  # (lp, blob)

    x_map, v = utils.find_map(lp, jnp.ones(2), steps=1000)
    assert np.allclose(np.asarray(x_map), 0.0, atol=1e-2)


@needs_optax
def test_find_map_nan_start_does_not_win():
    """A start whose log-prob is NaN must not poison best-tracking or
    be selected by the multi-start argmax."""

    def lp(x):
        # NaN for x0 < 0 (sqrt of a negative), mode at (1, 1).
        return -0.5 * jnp.sum((x - 1.0) ** 2) + 0.0 * jnp.sqrt(x[0])

    starts = jnp.array([[-2.0, 0.0], [2.0, 2.0]])
    x_map, v = utils.find_map(lp, starts, steps=1000)
    assert np.isfinite(float(v))
    assert np.allclose(np.asarray(x_map), 1.0, atol=0.05)


@needs_optax
def test_find_map_bad_shape():
    with pytest.raises(ValueError):
        utils.find_map(lambda x: -jnp.sum(x**2), jnp.zeros((2, 2, 2)))


@needs_optax
def test_find_map_line_fit_workflow():
    """The reference line-fit tutorial's init step, end to end: MAP then
    ball-init walkers."""
    rng = np.random.default_rng(123)
    x = np.sort(10 * rng.uniform(size=50))
    yerr = 0.1 + 0.5 * rng.uniform(size=50)
    m_true, b_true = -0.96, 4.29
    y = m_true * x + b_true + yerr * rng.normal(size=50)
    xj, yj, ej = map(jnp.asarray, (x, y, yerr))

    def lp(theta):
        m, b = theta
        model = m * xj + b
        return -0.5 * jnp.sum(((yj - model) / ej) ** 2)

    theta_map, v = utils.find_map(lp, jnp.zeros(2), steps=4000)
    assert abs(float(theta_map[0]) - m_true) < 0.1
    assert abs(float(theta_map[1]) - b_true) < 0.3
    p0 = utils.sample_ball(
        jax.random.key(0), theta_map, 1e-3 * jnp.ones(2), 32
    )
    assert p0.shape == (32, 2)


def test_defer_interrupts_dispositions():
    """defer_interrupts holds SIGINT across the block and re-delivers it
    through the *restored* disposition: default -> KeyboardInterrupt,
    SIG_IGN -> dropped, custom handler -> invoked; and a body exception
    is never masked by a pending interrupt."""
    import os
    import signal

    from emcee_tpu.utils import defer_interrupts

    prev = signal.getsignal(signal.SIGINT)
    try:
        signal.signal(signal.SIGINT, signal.default_int_handler)
        ran = False
        with pytest.raises(KeyboardInterrupt):
            with defer_interrupts():
                os.kill(os.getpid(), signal.SIGINT)
                ran = True
        assert ran  # the block always completes

        signal.signal(signal.SIGINT, signal.SIG_IGN)
        with defer_interrupts():
            os.kill(os.getpid(), signal.SIGINT)  # dropped, as configured

        hits = []
        signal.signal(signal.SIGINT, lambda s, f: hits.append(s))
        with defer_interrupts():
            os.kill(os.getpid(), signal.SIGINT)
            assert not hits  # held during the block
        assert hits == [signal.SIGINT]

        signal.signal(signal.SIGINT, signal.default_int_handler)
        with pytest.raises(OSError):
            with defer_interrupts():
                os.kill(os.getpid(), signal.SIGINT)
                raise OSError("body failure wins")
    finally:
        signal.signal(signal.SIGINT, prev)
