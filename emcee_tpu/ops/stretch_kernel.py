"""Pallas fused stretch half-step kernel.

The BASELINE north-star inner loop: the whole red-blue half-step —
z computation, partner selection, proposal, the *inlined user
log-probability*, Metropolis accept, and the select — as one Mosaic
program gridded over walker blocks, with the complement resident in VMEM.
The XLA fallback path materializes q/log-prob/accept through HBM between
many small fused kernels; here the half-step is a single kernel launch.

Randomness (one uniform per walker for z, one log-uniform per walker for
the accept, one scalar partner shift) is drawn outside with the sampler's
key discipline and passed in — keeping the kernel deterministic given its
inputs and testable under the Pallas interpreter on CPU (whose
``prng_random_bits`` is unavailable).

Partner selection uses the contiguous-roll scheme (one random shift per
half-step, sublane-aligned; exogenous randomness, preserves detailed
balance — see ``StretchMove.pair_mode``): walker ``g`` pairs with
``c[(g + shift) % nc]``, read as an aligned dynamic slice of the doubled
complement held in VMEM scratch (filled once on the first grid step; TPU
grids run sequentially so scratch persists).

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


def _pick_block(ng: int, max_blk: int = 2048) -> int:
    """Largest divisor of ng that is a multiple of 8 and <= max_blk.

    Keeps per-block vreg counts small (Mosaic fully unrolls over vregs —
    a monolithic 50k-row kernel blows up compile memory) while avoiding
    ragged tails.
    """
    best = 0
    for blk in range(8, min(max_blk, ng) + 1, 8):
        if ng % blk == 0:
            best = blk
    return best if best else ng


def _kernel(a, gndim, log_prob_fn, blk, nc, shift_ref, s_ref, c_ref,
            lp_ref, u_ref, logu_ref, out_c_ref, out_lp_ref, acc_ref,
            cc_ref):
    i = pl.program_id(0)
    shift = pl.multiple_of(shift_ref[0], 8)

    # Fill the doubled complement once; TPU grid steps run sequentially
    # and scratch persists across them.
    @pl.when(i == 0)
    def _():
        cc_ref[0:nc, :] = c_ref[:]
        cc_ref[nc : 2 * nc, :] = c_ref[:]

    s = s_ref[:]  # (blk, nd)

    # Per-walker vectors ride as (blk, 1) columns: rank-1 VMEM blocks
    # would need 128-multiple block sizes, which ng rarely divides into.
    u = u_ref[:, 0]
    lp_s = lp_ref[:, 0]
    log_u = logu_ref[:, 0]

    # z ~ g(z) propto 1/sqrt(z) on [1/a, a] via inverse CDF.
    zz = ((a - 1.0) * u + 1.0) ** 2 / a  # (blk,)
    factors = (gndim - 1.0) * jnp.log(zz)

    # Partner for global walker g = i*blk + j is c[(g + shift) % nc]:
    # one aligned dynamic read of the doubled complement per block.
    start = (shift + i * blk) % nc
    cr = cc_ref[pl.ds(start, blk), :]

    q = cr - (cr - s) * zz[:, None].astype(s.dtype)

    new_lp = log_prob_fn(q)  # user code, inlined into the kernel
    lnpdiff = factors + new_lp - lp_s
    # Arithmetic select: Mosaic cannot reshape/broadcast 1-bit vectors
    # across the minor dim, so carry the accept mask as f32.  NaN/inf
    # proposals are always rejected (NaN compare is false), and the
    # nan_to_num keeps 0 * NaN from poisoning the blend.
    accf = (log_u < lnpdiff).astype(jnp.float32)
    q_safe = jnp.nan_to_num(q)
    lp_safe = jnp.nan_to_num(new_lp)

    out_c_ref[:] = q_safe * accf[:, None] + s * (1.0 - accf[:, None])
    out_lp_ref[:, 0] = lp_safe * accf + lp_s * (1.0 - accf)
    acc_ref[:, 0] = accf.astype(jnp.int32)


def fused_stretch_half_step(
    shift, s, c, lp_s, u_z, log_u, *, log_prob_fn, a=2.0, gndim=None,
    interpret=None
):
    """Run one fused stretch half-step (single gridded Mosaic program).

    Args:
        shift: int32 scalar partner roll shift in [0, nc), multiple of 8
            when nc >= 8.
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
    nc = c.shape[0]
    if gndim is None:
        gndim = ndim
    if interpret is None:
        interpret = not _on_tpu()
    blk = _pick_block(ng)
    grid = (ng // blk,)
    kernel = functools.partial(
        _kernel, float(a), float(gndim), log_prob_fn, blk, nc
    )

    def walker_block(i):
        return (i, 0)

    full = lambda i: (0, 0)

    out_c, out_lp, acc = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((ng, ndim), s.dtype),
            jax.ShapeDtypeStruct((ng, 1), lp_s.dtype),
            jax.ShapeDtypeStruct((ng, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, ndim), walker_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, ndim), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), walker_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), walker_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), walker_block,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, ndim), walker_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), walker_block,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), walker_block,
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2 * nc, ndim), c.dtype)],
        interpret=interpret,
    )(
        jnp.asarray(shift, jnp.int32).reshape(1),
        s,
        c,
        lp_s[:, None],
        u_z[:, None],
        log_u[:, None],
    )
    return out_c, out_lp[:, 0], acc[:, 0].astype(bool)
