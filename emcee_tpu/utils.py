"""Walker-initialization helpers.

Key-based equivalents of the reference's deprecated ``sample_ball`` /
``sample_ellipsoid`` initializers (``/root/reference/src/emcee/utils.py:31-62``)
— the tutorials' ``p0 + std * randn`` ball-init pattern, kept first-class —
plus :func:`find_map`, the on-device analogue of the reference line-fit
tutorial's ``scipy.optimize.minimize`` initialization step
(``/root/reference/docs/tutorials/line.ipynb``).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

__all__ = [
    "sample_ball",
    "sample_ellipsoid",
    "find_map",
    "encode_str_blob",
    "decode_str_blobs",
]


@contextlib.contextmanager
def defer_interrupts():
    """Hold SIGINT for the duration of a backend-write + resume-anchor
    update, so a Ctrl-C can never land between a committed save and the
    anchor assignments (which would leave the backend one chunk ahead of
    the anchors and duplicate that chunk on resume).

    A deferred interrupt is re-delivered through the *restored*
    disposition on clean exit (``signal.raise_signal``) — a process that
    ignores SIGINT or installed a custom handler keeps that behavior; we
    never fabricate a ``KeyboardInterrupt`` ourselves.  If the body
    itself raised, the pending interrupt is dropped so it cannot mask
    the body's exception (press Ctrl-C again).  No-op off the main
    thread (signal handlers are main-thread-only) and when the current
    handler was not installed from Python (embedded interpreters) —
    there the window stays a few bytecodes wide, as before.
    """
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        yield
        return
    prev = signal.getsignal(signal.SIGINT)
    if prev is None:  # non-Python handler: cannot restore faithfully
        yield
        return
    pending = []
    try:
        signal.signal(signal.SIGINT, lambda s, f: pending.append(s))
    except ValueError:  # exotic embedding; fall back to no-op
        yield
        return
    body_raised = False
    try:
        yield
    except BaseException:
        body_raised = True
        raise
    finally:
        signal.signal(signal.SIGINT, prev)
        if pending and not body_raised:
            signal.raise_signal(signal.SIGINT)


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


def find_map(
    log_prob_fn,
    x0,
    *,
    steps: int = 1000,
    optimizer=None,
    return_all: bool = False,
):
    """Maximize ``log_prob_fn`` by gradient ascent; the MAP-init step.

    The reference line-fit tutorial seeds its walkers from a
    ``scipy.optimize.minimize`` solution; this is the TPU-native
    equivalent — one jitted optax loop, vmapped over any number of
    starting points, so a multi-start search costs one compile and one
    launch.  Typical use::

        x_map, lp = utils.find_map(log_prob, x0)
        p0 = utils.sample_ball(key, x_map, 1e-4 * jnp.ones(ndim), nwalkers)

    Args:
        log_prob_fn: per-point log-probability, ``(ndim,) -> scalar``
            (a ``(scalar, blobs)`` return is accepted; blobs are
            ignored).  Must be differentiable; start inside the support
            — ``-inf`` plateaus have no gradient (nonfinite gradient
            components are zeroed so a hard prior boundary stalls that
            coordinate rather than poisoning the whole iterate).
        x0: ``(ndim,)`` start or ``(nstarts, ndim)`` batch of starts.
        steps: optimizer iterations (one ``lax.scan``).
        optimizer: any optax ``GradientTransformation``; default
            ``optax.adam(1e-2)``.
        return_all: with batched ``x0``, return every start's
            ``(points (nstarts, ndim), log_probs (nstarts,))`` instead
            of just the best.

    Returns:
        ``(x_map, log_prob)`` — the best iterate seen (tracked across
        the whole trajectory, not merely the final point).
    """
    import optax

    x0 = jnp.asarray(x0)
    if x0.ndim not in (1, 2):
        raise ValueError("x0 must be (ndim,) or (nstarts, ndim)")
    single = x0.ndim == 1
    starts = x0[None] if single else x0
    opt = optax.adam(1e-2) if optimizer is None else optimizer

    def lp(x):
        out = log_prob_fn(x)
        return out[0] if isinstance(out, tuple) else out

    def value_and_grad(x):
        v, g = jax.value_and_grad(lp)(x)
        return v, jnp.where(jnp.isfinite(g), g, 0.0)

    def one_start(x):
        def record_best(x, v, best_x, best_v):
            # NaN-rejecting: `v > best_v` is False for NaN v, and we
            # never write v into best_v via max (jnp.maximum would
            # propagate a transient NaN forever and poison the run).
            better = v > best_v
            return (
                jnp.where(better, x, best_x),
                jnp.where(better, v, best_v),
            )

        def step(carry, _):
            x, opt_state, best_x, best_v = carry
            v, g = value_and_grad(x)
            best_x, best_v = record_best(x, v, best_x, best_v)
            updates, opt_state = opt.update(-g, opt_state, x)
            x = optax.apply_updates(x, updates)
            return (x, opt_state, best_x, best_v), None

        init = (x, opt.init(x), x, -jnp.inf)
        (x, _, best_x, best_v), _ = jax.lax.scan(
            step, init, None, length=steps
        )
        # The final iterate may beat the best recorded pre-update value.
        vf, _ = value_and_grad(x)
        return record_best(x, vf, best_x, best_v)

    xs, vs = jax.jit(jax.vmap(one_start))(starts)
    if single:
        return xs[0], vs[0]
    if return_all:
        return xs, vs
    # NaN-safe winner selection (argmax prefers NaN).
    i = jnp.argmax(jnp.where(jnp.isnan(vs), -jnp.inf, vs))
    return xs[i], vs[i]


def encode_str_blob(s, width):
    """Encode a string as a fixed-width uint8 array blob leaf.

    The reference infers object/string blob dtypes at runtime
    (``/root/reference/src/emcee/ensemble.py:498-547``); under jit, blob
    shapes are static, so string metadata rides as fixed-width bytes
    instead: return ``encode_str_blob(label, W)`` from a host-callback
    log-prob (declared as ``((W,), np.uint8)`` in
    ``host_callback_blobs``) and recover the strings after fetching with
    :func:`decode_str_blobs`.  Over-long strings are truncated to
    ``width`` bytes; padding is NUL.
    """
    import numpy as np

    buf = np.zeros(int(width), dtype=np.uint8)
    raw = str(s).encode("utf-8")[: int(width)]
    # Never cut a multi-byte codepoint at the truncation edge: a raw
    # byte slice could leave a partial sequence that poisons the whole
    # decode_str_blobs() readback with UnicodeDecodeError.
    raw = raw.decode("utf-8", errors="ignore").encode("utf-8")
    buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    return buf


def decode_str_blobs(arr, errors="strict"):
    """Decode a fetched uint8 blob array back to strings.

    The trailing axis is the byte width; every leading axis is
    preserved, so ``decode_str_blobs(sampler.get_blobs())`` on a
    ``(steps, nwalkers, W)`` blob returns a ``(steps, nwalkers)``
    array of Python strings.  ``errors`` is passed to ``bytes.decode``
    (use ``"replace"`` to salvage a store written by an encoder that
    split a multi-byte codepoint).
    """
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    flat = arr.reshape(-1, arr.shape[-1])
    out = np.array(
        [
            bytes(row).rstrip(b"\x00").decode("utf-8", errors=errors)
            for row in flat
        ],
        dtype=object,
    )
    return out.reshape(arr.shape[:-1])
