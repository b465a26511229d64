"""Pallas fused stretch half-step kernel.

The BASELINE north-star inner loop: proposal construction, the *inlined
user log-probability*, Metropolis accept, and the select — one Mosaic
program gridded over walker blocks.  The XLA fallback path materializes
q/log-prob/accept through HBM across many small kernels (each carrying
the ~55 us fixed launch overhead measured on v5e); here the half-step
body is a single kernel launch plus one partner roll.

Partner selection (the contiguous-roll scheme: walker g pairs with
``c[(g + shift) % nc]``, exogenous randomness, detailed balance intact —
see ``StretchMove.pair_mode``) and the per-walker uniform draws happen
*outside* in XLA: a `jnp.roll` is a clean contiguous relayout, while
in-kernel dynamic slices hit Mosaic's sublane/lane alignment limits for
general ensemble sizes, and interpret-mode ``pltpu.prng_random_bits``
returns zeros (so kernel-internal RNG would be untestable on CPU).

Layout notes (each constraint was hit in anger on v5e):

* all operands are rank-2 ``(blk, k)`` blocks with ``blk`` a multiple of
  8 dividing the group size — rank-1 blocks need 128-multiple sizes, and
  minor-dim blocking needs 128-multiples too;
* per-walker vectors travel as columns of ``(ng, 3)`` / ``(ng, 2)``
  arrays whose minor dims equal the array dims (allowed unblocked);
* the walker grid keeps per-block vreg counts small — Mosaic fully
  unrolls over vregs, and a monolithic 50k-row program exhausts compile
  memory; a VMEM-resident doubled complement (50k x 5 tile-padded 25x)
  blows the 16 MB scoped-VMEM limit;
* the accept mask stays f32 (Mosaic cannot reshape/broadcast i1 across
  the minor dim) with ``nan_to_num`` guarding the arithmetic blend.

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


def _pick_block(ng: int, max_blk: int = 4096) -> int:
    """Largest divisor of ng that is a multiple of 8 and <= max_blk."""
    best = 0
    for blk in range(8, min(max_blk, ng) + 1, 8):
        if ng % blk == 0:
            best = blk
    return best if best else ng


def _kernel(a, gndim, log_prob_fn, s_ref, cr_ref, vec_ref,
            out_c_ref, out_vec_ref):
    s = s_ref[:]       # (blk, nd)
    cr = cr_ref[:]     # (blk, nd) rolled partners
    u = vec_ref[:, 0]
    lp_s = vec_ref[:, 1]
    log_u = vec_ref[:, 2]

    # z ~ g(z) propto 1/sqrt(z) on [1/a, a] via inverse CDF.
    zz = ((a - 1.0) * u + 1.0) ** 2 / a  # (blk,)
    factors = (gndim - 1.0) * jnp.log(zz)

    q = cr - (cr - s) * zz[:, None].astype(s.dtype)

    new_lp = log_prob_fn(q)  # user code, inlined into the kernel
    lnpdiff = factors + new_lp - lp_s
    accf = (log_u < lnpdiff).astype(jnp.float32)
    q_safe = jnp.nan_to_num(q)
    lp_safe = jnp.nan_to_num(new_lp)

    out_c_ref[:] = q_safe * accf[:, None] + s * (1.0 - accf[:, None])
    out_vec_ref[:, 0] = lp_safe * accf + lp_s * (1.0 - accf)
    out_vec_ref[:, 1] = accf


def fused_stretch_half_step(
    shift, s, c, lp_s, u_z, log_u, *, log_prob_fn, a=2.0, gndim=None,
    interpret=None
):
    """Run one fused stretch half-step.

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
    blk = _pick_block(ng)
    grid = (ng // blk,)
    kernel = functools.partial(
        _kernel, float(a), float(gndim), log_prob_fn
    )

    # Partner roll in XLA (one contiguous relayout), per-walker vectors
    # packed as columns so every pallas operand is a clean (blk, k) block.
    cr = jnp.roll(c, -shift, axis=0)[:ng]
    vec = jnp.stack(
        [u_z, lp_s.astype(u_z.dtype), log_u], axis=1
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
    )(s, cr, vec)
    return (
        out_c,
        out_vec[:, 0].astype(lp_s.dtype),
        out_vec[:, 1] > 0.5,
    )
