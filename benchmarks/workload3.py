"""Workload-3 benchmark: 100D correlated Gaussian, 1e4 walkers,
DE(0.8)+Snooker(0.2) mixture (the BASELINE-prescribed configuration).

Usage: python benchmarks/workload3.py [--config mixture|de|snooker]
Prints one JSON line with walker-steps/s.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, State, moves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="mixture")
    ap.add_argument("--walkers", type=int, default=10_000)
    ap.add_argument("--ndim", type=int, default=100)
    ap.add_argument(
        "--steps",
        type=int,
        default=4096,
        help="proposals per jitted chunk (sweep: 1024 chunks leave "
        "~15%% on the table vs 4096; 8192 adds ~1%% — see CLAUDE.md)",
    )
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--prng", default=None)
    ap.add_argument(
        "--block",
        type=int,
        default=1,
        help="mixture_block: draw the move once per this many kept steps",
    )
    ap.add_argument(
        "--ess",
        action="store_true",
        help="measure effective samples/s (DeviceBackend storage + tau) "
        "instead of raw walker-steps/s",
    )
    # Span = kept * thin proposals; CLAUDE.md: don't trust tau from
    # spans < 30 * tau (the mixture's tau is O(100) proposals here).
    ap.add_argument("--kept", type=int, default=256)
    ap.add_argument("--thin", type=int, default=16)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    A = rng.normal(size=(args.ndim, args.ndim)) / np.sqrt(args.ndim)
    cov = A @ A.T + 0.5 * np.eye(args.ndim)
    icov = np.linalg.inv(cov)
    # One MXU matmul + fused square-reduce: x @ W with W = chol(icov),
    # lp = -0.5 |xW|^2 — same quadratic form, half the flops of the
    # x·icov·x einsum and a single matmul for XLA to tile.
    W = jnp.asarray(np.linalg.cholesky(icov), dtype=jnp.float32)
    chol = np.linalg.cholesky(cov)

    def log_prob(x):
        y = x @ W
        return -0.5 * jnp.sum(y * y, axis=-1)

    de = moves.DEMove(pair_mode="roll", randomize_split=False)
    sn = moves.DESnookerMove(
        pair_mode="roll", nsplits=2, randomize_split=False
    )
    cfg = {
        "mixture": [(de, 0.8), (sn, 0.2)],  # lax.switch dispatch (fastest
        # measured for this cheap log-prob: 8.3e7 w-s/s)
        # BlendedMove computes every sub-proposal and shares one log-prob
        # eval — wins when the likelihood dominates, loses here (6.0e7).
        "blended": moves.BlendedMove(
            [(de, 0.8), (sn, 0.2)], randomize_split=False
        ),
        "blended-switch": moves.BlendedMove(
            [(de, 0.8), (sn, 0.2)], mode="switch", randomize_split=False
        ),
        "de": de,
        "snooker": sn,
        # Rejection-free slice sampling (zeus parity): several log-prob
        # evals per kept step, repaid in mixing time — compare ESS/s,
        # not raw walker-steps/s.
        "slice": moves.EnsembleSliceMove(randomize_split=False),
        # Adaptive-independence mixture: once the t-proposal has learned
        # the (Gaussian) target, independence draws are near-uncorrelated
        # — compare with --ess, not raw walker-steps/s.
        "dime": moves.DIMEMove(randomize_split=False),
        "dime-aimh": moves.DIMEMove(
            aimh_prob=1.0, randomize_split=False
        ),
        # Gradient moves (autodiff through the quadratic form): the
        # step size follows d^(-1/6) (MALA) — 1.4 * 100^(-1/6) ~ 0.65
        # with the hand preconditioner unavailable here, so use the
        # affine-invariant ensemble variants that self-precondition.
        "ens-mala": moves.EnsembleMALAMove(0.5, randomize_split=False),
        "mala": moves.MALAMove(0.02),
    }[args.config]

    sampler = EnsembleSampler(
        args.walkers,
        args.ndim,
        log_prob,
        vectorize=True,
        seed=0,
        prng=args.prng,
        moves=cfg,
        scan_unroll=args.unroll,
        mixture_block=args.block,
    )
    coords = jnp.asarray(
        rng.normal(size=(args.walkers, args.ndim)) @ chol.T,
        dtype=jnp.float32,
    )
    state = sampler._prepare_state(
        State(
            coords,
            random_state=jax.random.key(2, impl=args.prng)
            if args.prng
            else jax.random.key(2),
        ),
        True
    )
    carries = sampler._init_carries()

    if args.ess:
        # ESS/s: run_mcmc through device-HBM storage (same basis as
        # bench.py's ess_per_sec), tau from a walker/dim subset of the
        # stored chain (fetching the full (kept, 1e4, 100) block over
        # the tunnel would cost more than the run).
        from emcee_tpu.backends import DeviceBackend

        sampler.backend = DeviceBackend()
        sampler.backend.reset(args.walkers, args.ndim)
        st = sampler.run_mcmc(
            state, args.kept, thin_by=args.thin,
            skip_initial_state_check=True,
        )
        chain_sub = np.asarray(sampler.get_chain()[:, :512, :16])
        dt = float("inf")
        for _ in range(2):
            sampler.backend.reset(args.walkers, args.ndim)
            t0 = time.perf_counter()
            st = sampler.run_mcmc(
                st, args.kept, thin_by=args.thin,
                skip_initial_state_check=True,
            )
            float(jnp.sum(st.log_prob))  # forced sync
            dt = min(dt, time.perf_counter() - t0)

        from emcee_tpu.ops.autocorr import integrated_time

        # Pin tau estimation to the host CPU device: an eager TPU FFT
        # would cost a full remote compile (CLAUDE.md).
        with jax.default_device(jax.devices("cpu")[0]):
            tau = np.max(
                integrated_time(chain_sub, quiet=True)
            ) * args.thin  # proposal units
        proposals_per_sec = args.kept * args.thin / dt
        ess_per_sec = args.walkers * proposals_per_sec / tau
        span = args.kept * args.thin
        print(
            json.dumps(
                {
                    "metric": f"workload3_{args.config}_ess_per_sec",
                    "value": round(ess_per_sec, 1),
                    "unit": "effective-samples/s",
                    "tau_proposals": round(float(tau), 2),
                    "tau_span_proposals": span,
                    # Short spans truncate tau and inflate ESS; flag it.
                    "tau_reliable": bool(span >= 30.0 * float(tau)),
                    "walker_steps_per_sec": round(
                        args.walkers * proposals_per_sec, 1
                    ),
                    "kept": args.kept,
                    "thin_by": args.thin,
                }
            )
        )
        return

    run = sampler._get_run_chunk(args.steps, 1, False, False, None)
    st, c, _ = run(state, carries)
    float(jnp.sum(st.log_prob))  # forced sync (see CLAUDE.md)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        st, c, _ = run(st, c)
    float(jnp.sum(st.log_prob))
    dt = time.perf_counter() - t0

    mean_lp = float(jnp.mean(st.log_prob))
    assert -0.8 * args.ndim < mean_lp < -0.2 * args.ndim, mean_lp

    wsps = reps * args.steps * args.walkers / dt
    print(
        json.dumps(
            {
                "metric": f"workload3_{args.config}_walker_steps_per_sec",
                "value": round(wsps, 1),
                "unit": "walker-steps/s",
                "ms_per_step": round(1e3 * dt / (reps * args.steps), 4),
                "mixture_block": args.block,
            }
        )
    )


if __name__ == "__main__":
    main()
