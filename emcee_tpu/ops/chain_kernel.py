"""Multi-step VMEM-resident stretch-chain kernel.

The round-1 Pallas kernels fused one *half-step* per launch and lost to
XLA's pipeline: at small ndim the ``(nwalkers, ndim)`` layout tile-pads
the minor dim 25x, and per-launch overhead (~55 us on this runtime)
still bounded the step rate.  This kernel instead advances the chain
``K`` proposals per launch with the whole ensemble resident in VMEM:

* **transposed layout** ``(ndim_padded + 8, nwalkers)`` — walkers ride
  the lane dimension, so per-walker scalars (z draws, accept thresholds,
  log-probs) are natural ``(1, nw)`` rows with zero relayout cost, and
  the tile padding overhead is ``8/ndim`` instead of ``128/ndim``.  The
  log-prob and a cumulative acceptance counter live in two extra rows of
  the same array (the sublane padding is free anyway);
* **doubled halves** ``[red|red|blue|blue]`` along lanes, so the
  circular partner roll becomes one DMA with a dynamic 128-aligned lane
  offset into the doubled copy — no gather, no dynamic-length slice;
* **streamed randomness**: uniforms are drawn *outside* (one fused XLA
  RNG kernel per chunk; kernel-internal PRNG is untestable in interpret
  mode) and streamed in per-8-step blocks by the Pallas pipeline;
* partner shifts are scalar-prefetched (SMEM), multiples of 128 —
  coarser than per-walker random pairing but still exogenous randomness
  independent of the chain state, so detailed balance holds exactly
  (the statistical oracle for this engine runs in the integration
  suite).

Fits VMEM for ``(ndim + 16) * 4 * nwalkers * 4B + ~7 MB`` ≲ 16 MB —
e.g. the BASELINE workload-3 shape (1e4 walkers x 100D).  Used by
``EnsembleSampler`` when the single move is
``StretchMove(engine="pallas_chain")`` (single device, blob-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stretch_chain", "chain_kernel_supported"]


def _ceil8(n: int) -> int:
    return (n + 7) // 8 * 8


#: chain steps per grid iteration (sets the streamed-randomness block size)
_NSUB = 4


def chain_kernel_supported(nwalkers: int, ndim: int) -> bool:
    """Shape gate: halves lane-aligned and the working set VMEM-sized."""
    ng = nwalkers // 2
    if nwalkers % 256 or ng % 128:
        return False
    nrows = _ceil8(ndim) + 8
    ens_bytes = nrows * nwalkers * 4  # [red | blue] lanes, VMEM-resident
    partner_bytes = nrows * ng * 4  # rolled-partner temporary
    rand_bytes = 2 * 8 * _NSUB * nwalkers * 4  # double-buffered block
    return ens_bytes + partner_bytes + rand_bytes < 14 * (1 << 20)


def _kernel(a, gndim, nd, ng, lp_rows_fn, nsub,
            shifts_ref, rand_ref, packed_ref, *rest):
    # rest = (*const_refs, out_ref, ens_ref, sems...)
    nconst = len(rest) - 4
    const_refs = rest[:nconst]
    out_ref, ens_ref, sem_ref, out_sem_ref = rest[nconst:]
    consts = tuple(r[:] for r in const_refs)
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    lp_row = _ceil8(nd)  # 8-aligned row holding log-prob; +1 holds counts

    @pl.when(b == 0)
    def _init():
        cp = pltpu.make_async_copy(packed_ref, ens_ref, sem_ref)
        cp.start()
        cp.wait()

    def sub_step(j, _):
        step = b * nsub + j
        rblock = rand_ref[pl.ds(8 * j, 8), :]  # (8, nw) this step's rows

        def half(self_base, partner_base, carry):
            shift = shifts_ref[2 * step + (0 if self_base == 0 else 1)]
            s = ens_ref[:, pl.ds(self_base, ng)]
            # Circular partner pairing: one dynamic lane rotation of the
            # frozen complementary half (exogenous randomness — detailed
            # balance holds; see StretchMove.pair_mode="roll").
            partner = pltpu.roll(
                ens_ref[:, pl.ds(partner_base, ng)], shift, axis=1
            )
            u = rblock[0:1, self_base : self_base + ng]
            log_u = jnp.log(rblock[1:2, self_base : self_base + ng])

            zz = ((a - 1.0) * u + 1.0) ** 2 / a  # (1, ng)
            factors = (gndim - 1.0) * jnp.log(zz)
            q = partner - (partner - s) * zz  # rows >= nd are garbage
            new_lp = lp_rows_fn(q, *consts)  # (1, ng), user code inlined
            lp_tile = s[lp_row : lp_row + 8, :]
            lp_s = lp_tile[0:1, :]
            acc_s = lp_tile[1:2, :]
            lnpdiff = factors + new_lp - lp_s
            accf = (log_u < lnpdiff).astype(jnp.float32)

            sel = jnp.nan_to_num(q) * accf + s * (1.0 - accf)
            lp_new = jnp.nan_to_num(new_lp) * accf + lp_s * (1.0 - accf)
            rows = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 0)
            full = jnp.where(
                rows < nd,
                sel,
                jnp.where(
                    rows == lp_row,
                    lp_new,
                    jnp.where(rows == lp_row + 1, acc_s + accf, 0.0),
                ),
            )
            ens_ref[:, pl.ds(self_base, ng)] = full
            return carry

        half(0, ng, None)  # red proposes against rolled blue
        half(ng, 0, None)  # blue proposes against rolled red
        return 0

    jax.lax.fori_loop(0, nsub, sub_step, 0)

    @pl.when(b == nb - 1)
    def _flush():
        cp = pltpu.make_async_copy(ens_ref, out_ref, out_sem_ref)
        cp.start()
        cp.wait()


def stretch_chain(
    coords,
    lp,
    key,
    nsteps,
    *,
    log_prob_rows,
    lp_consts=(),
    a=2.0,
    gndim=None,
    interpret=None,
):
    """Advance ``nsteps`` stretch proposals in VMEM-resident chunks.

    Args:
        coords: ``(nwalkers, ndim)`` f32 (first half = red group).
        lp: ``(nwalkers,)`` current log-probs.
        key: PRNG key for the whole chunk's randomness.
        nsteps: proposals to advance (rounded up to a multiple of 8).
        log_prob_rows: ``(nrows, n), *lp_consts -> (1, n)`` log-prob on the
            transposed padded block (rows ``>= ndim`` are padding/
            bookkeeping and must be ignored — e.g. contract with a
            zero-padded weight matrix).
        lp_consts: arrays the log-prob needs (Pallas kernels cannot close
            over traced constants); passed as VMEM-resident inputs.
        a: stretch scale; gndim: global ndim for the Hastings factor.

    Returns:
        (coords', lp', acc_counts) with acc_counts the per-walker number
        of accepted proposals in the chunk.
    """
    nw, nd = coords.shape
    ng = nw // 2
    if not chain_kernel_supported(nw, nd):
        raise ValueError(
            f"shape ({nw}, {nd}) unsupported by the chain kernel: needs "
            "nwalkers % 256 == 0, (nwalkers/2) % 128 == 0, and the "
            "ensemble to fit VMEM (see chain_kernel_supported)"
        )
    if gndim is None:
        gndim = nd
    if interpret is None:
        try:
            interpret = jax.default_backend() not in ("tpu", "axon")
        except Exception:  # pragma: no cover
            interpret = True
    nsub = _NSUB
    nsteps = int(-(-nsteps // nsub) * nsub)
    niters = nsteps // nsub
    lp_row = _ceil8(nd)
    nrows = lp_row + 8

    k_rand, k_shift = jax.random.split(key)
    # Rows 0/1 of each 8-row group = (z-uniform, accept-uniform); the
    # other six rows are alignment padding (dynamic sublane offsets must
    # be multiples of 8).
    rand = jax.random.uniform(
        k_rand, (nsteps * 8, nw), dtype=jnp.float32
    )
    shifts = jax.random.randint(
        k_shift, (2 * nsteps,), 0, ng, dtype=jnp.int32
    )

    packed = jnp.zeros((nrows, nw), dtype=jnp.float32)
    packed = packed.at[:nd, :].set(coords.T.astype(jnp.float32))
    packed = packed.at[lp_row, :].set(lp.astype(jnp.float32))

    kernel = functools.partial(
        _kernel, float(a), float(gndim), nd, ng, log_prob_rows, nsub
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(niters,),
        in_specs=[
            pl.BlockSpec((8 * nsub, nw), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ]
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in lp_consts
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nrows, nw), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, nw), jnp.float32),
        interpret=interpret,
    )(shifts, rand, packed, *lp_consts)

    coords_out = out[:nd, :].T.astype(coords.dtype)
    lp_out = out[lp_row, :].astype(lp.dtype)
    acc = out[lp_row + 1, :].astype(jnp.int32)
    return coords_out, lp_out, acc
