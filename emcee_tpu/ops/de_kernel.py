"""Pallas fused differential-evolution half-step kernel.

Companion to ``ops/stretch_kernel.py`` (same layout rules — see that
module's docstring): one gridded Mosaic program computing the DE proposal
``q = s + gamma * (c[(g+s2)%nc] - c[(g+s1)%nc])`` with the user's
log-probability inlined, the Metropolis accept, and the select.  The two
partner rolls and all randomness (gamma normals, accept log-uniforms)
come from outside under the sampler key discipline.

Used by ``DEMove(engine="pallas")`` (requires ``pair_mode="roll"``
semantics; blob-free runs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stretch_kernel import _on_tpu, _pick_block

__all__ = ["fused_de_half_step"]


def _kernel(g0, sigma, log_prob_fn, s_ref, cr1_ref, cr2_ref, vec_ref,
            out_c_ref, out_vec_ref):
    s = s_ref[:]          # (blk, nd)
    diffs = cr2_ref[:] - cr1_ref[:]
    z = vec_ref[:, 0]     # gamma normals
    lp_s = vec_ref[:, 1]
    log_u = vec_ref[:, 2]

    gamma = g0 * (1.0 + sigma * z)
    q = s + gamma[:, None].astype(s.dtype) * diffs

    new_lp = log_prob_fn(q)
    lnpdiff = new_lp - lp_s  # DE factors are zero (symmetric proposal)
    accf = (log_u < lnpdiff).astype(jnp.float32)
    q_safe = jnp.nan_to_num(q)
    lp_safe = jnp.nan_to_num(new_lp)

    out_c_ref[:] = q_safe * accf[:, None] + s * (1.0 - accf[:, None])
    out_vec_ref[:, 0] = lp_safe * accf + lp_s * (1.0 - accf)
    out_vec_ref[:, 1] = accf


def fused_de_half_step(
    s1, s2, s, c, lp_s, z_gamma, log_u, *, log_prob_fn, g0, sigma,
    interpret=None
):
    """Run one fused DE half-step.

    Args:
        s1, s2: int32 scalar partner roll shifts (distinct mod nc).
        s: ``(ng, ndim)`` group being updated.
        c: ``(nc, ndim)`` complementary ensemble (already gathered).
        lp_s: ``(ng,)`` current log-probs.
        z_gamma: ``(ng,)`` standard normals for the gamma jitter.
        log_u: ``(ng,)`` log-uniform acceptance thresholds.
        log_prob_fn: vectorized ``(n, ndim) -> (n,)`` log-prob, inlined.
        g0, sigma: DE stretch parameters.

    Returns:
        (selected_coords, selected_lp, accepted(bool)).
    """
    ng, ndim = s.shape
    if interpret is None:
        interpret = not _on_tpu()
    blk = _pick_block(ng)
    grid = (ng // blk,)
    kernel = functools.partial(
        _kernel, float(g0), float(sigma), log_prob_fn
    )

    cr1 = jnp.roll(c, -s1, axis=0)[:ng]
    cr2 = jnp.roll(c, -s2, axis=0)[:ng]
    vec = jnp.stack(
        [z_gamma, lp_s.astype(z_gamma.dtype), log_u], axis=1
    )  # (ng, 3)

    out_c, out_vec = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((ng, ndim), s.dtype),
            jax.ShapeDtypeStruct((ng, 2), vec.dtype),
        ),
        in_specs=[
            pl.BlockSpec((blk, ndim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, ndim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, ndim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, ndim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(s, cr1, cr2, vec)
    return (
        out_c,
        out_vec[:, 0].astype(lp_s.dtype),
        out_vec[:, 1] > 0.5,
    )
