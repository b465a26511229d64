"""Pallas fused stretch half-step kernel.

The BASELINE north-star inner loop: one TPU kernel per red-blue half-step
that keeps the updated group ``s``, the complement ``c``, and every
intermediate in VMEM — z computation, partner selection, proposal, the
*inlined user log-probability*, Metropolis accept, and the select — with
zero intermediate HBM round trips.  The XLA fallback path materializes
q/log-prob/accept through HBM between fused kernels; here the whole
half-step is a single Mosaic program.

Randomness (one uniform per walker for z, one log-uniform per walker for
the accept, one scalar partner shift) is drawn outside with the sampler's
key discipline and passed in — keeping the kernel deterministic given its
inputs and testable under the Pallas interpreter on CPU (whose
``prng_random_bits`` is unavailable).

Partner selection uses the contiguous-roll scheme (one random shift per
half-step; exogenous randomness, preserves detailed balance — see
``StretchMove.pair_mode``): a roll lowers to a static-size dynamic slice
of the doubled complement, avoiding data-dependent gathers inside the
kernel.

Used by ``StretchMove(engine="pallas")``; only for blob-free runs (walker
sharding is fine — the complement is all-gathered before the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_stretch_half_step"]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(a, gndim, log_prob_fn, shift_ref, s_ref, c_ref, lp_ref,
            u_ref, logu_ref, out_c_ref, out_lp_ref, acc_ref, cc_ref):
    s = s_ref[:]
    c = c_ref[:]
    ng, nd = s.shape
    nc = c.shape[0]

    # z ~ g(z) propto 1/sqrt(z) on [1/a, a] via inverse CDF.
    zz = ((a - 1.0) * u_ref[:] + 1.0) ** 2 / a  # (ng,)
    factors = (gndim - 1.0) * jnp.log(zz)

    # Partner via circular shift: double the complement into VMEM scratch,
    # then a dynamic *ref* read (pl.ds) gives the wrap-around roll — value-
    # level dynamic_slice has no Mosaic lowering.
    shift = pl.multiple_of(shift_ref[0], 8)
    cc_ref[0:nc, :] = c
    cc_ref[nc : 2 * nc, :] = c
    cr = cc_ref[pl.ds(shift, ng), :]

    q = cr - (cr - s) * zz[:, None].astype(s.dtype)

    new_lp = log_prob_fn(q)  # user code, inlined into the kernel
    lnpdiff = factors + new_lp - lp_ref[:]
    # Arithmetic select: Mosaic cannot reshape/broadcast 1-bit vectors
    # across the minor dim, so carry the accept mask as f32.  NaN/inf
    # proposals are always rejected (NaN compare is false), and the
    # nan_to_num keeps 0 * NaN from poisoning the blend.
    accf = (logu_ref[:] < lnpdiff).astype(jnp.float32)
    q_safe = jnp.nan_to_num(q)
    lp_safe = jnp.nan_to_num(new_lp)

    out_c_ref[:] = q_safe * accf[:, None] + s * (1.0 - accf[:, None])
    out_lp_ref[:] = lp_safe * accf + lp_ref[:] * (1.0 - accf)
    acc_ref[:] = accf.astype(jnp.int32)


def fused_stretch_half_step(
    shift, s, c, lp_s, u_z, log_u, *, log_prob_fn, a=2.0, gndim=None,
    interpret=None
):
    """Run one fused stretch half-step (single Mosaic program).

    Args:
        shift: int32 scalar partner roll shift in [0, nc).
        s: ``(ng, ndim)`` group being updated.
        c: ``(nc, ndim)`` complementary ensemble (already gathered).
        lp_s: ``(ng,)`` current log-probs of ``s``.
        u_z: ``(ng,)`` uniforms for the z draw.
        log_u: ``(ng,)`` log-uniform acceptance thresholds.
        log_prob_fn: vectorized ``(n, ndim) -> (n,)`` log-prob, inlined.
        a: stretch scale.
        gndim: global ndim for the Hastings factor (defaults to local).

    Returns:
        (selected_coords, selected_lp, accepted(bool)).
    """
    ng, ndim = s.shape
    if gndim is None:
        gndim = ndim
    if interpret is None:
        interpret = not _on_tpu()
    kernel = functools.partial(_kernel, float(a), float(gndim), log_prob_fn)
    out_c, out_lp, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ng, ndim), s.dtype),
            jax.ShapeDtypeStruct((ng,), lp_s.dtype),
            jax.ShapeDtypeStruct((ng,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2 * c.shape[0], ndim), c.dtype)],
        interpret=interpret,
    )(jnp.asarray(shift, jnp.int32).reshape(1), s, c, lp_s, u_z, log_u)
    return out_c, out_lp, acc.astype(bool)
