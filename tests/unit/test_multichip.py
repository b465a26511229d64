"""Multichip dryrun coverage beyond the driver's N-device run.

The driver exercises ``__graft_entry__.dryrun_multichip`` at its own
device count; these tests widen that to a 16-virtual-device leg and add
a weak-scaling regression gate, both in subprocesses (device count is
fixed at backend init, so each case needs its own process).
"""

import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

pytestmark = pytest.mark.slow


def _run(py, devices, timeout=900):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", py],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"subprocess failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    return proc.stdout


def test_dryrun_16_devices():
    """The full sharded dryrun (walker sharding, 2-D temp x walker PT
    with ppermute boundary swaps, param-axis psum, MALA + DeviceBackend,
    adaptive carries, negative rejections) compiles and executes at 16
    devices, twice the driver's default."""
    _run(
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(16);"
        "print('DRYRUN16 OK')",
        devices=16,
    )


def test_sharded_step_cost_scales_linearly():
    """Communication-complexity gate on the 8-virtual-device mesh.

    A virtual CPU mesh shares this host's cores, so wall-clock
    weak-scaling efficiency is not measurable here (the >=0.8 real-chip
    target lives in benchmarks/scaling.py / BASELINE.md).  What IS
    pinned: growing the sharded ensemble 4x grows step wall time by
    ~4x, not more — a regression that makes per-step communication or
    compute scale superlinearly in the global ensemble (e.g. an
    accidental O(n^2) pair table, or gathering the full chain per
    proposal) reads far above the linear ratio.
    """
    py = """
import jax
jax.config.update('jax_platforms', 'cpu')
import time, json
import jax.numpy as jnp, numpy as np
from emcee_tpu import EnsembleSampler, State, moves
from emcee_tpu.parallel import walker_mesh

def measure(wpd, ndim=5, nsteps=128):
    n_devices = 8
    nwalkers = wpd * n_devices
    mesh = walker_mesh(n_devices)
    sampler = EnsembleSampler(
        nwalkers, ndim, lambda x: -0.5 * jnp.sum(x**2, axis=-1),
        vectorize=True, seed=0, mesh=mesh,
        moves=moves.StretchMove(randomize_split=False), scan_unroll=8,
    )
    coords = jax.random.normal(jax.random.key(1), (nwalkers, ndim))
    state = sampler._prepare_state(
        State(coords, random_state=jax.random.key(2)), True)
    carries = sampler._init_carries()
    run = sampler._get_run_chunk(nsteps, 1, False, False, None)
    st, c, _ = run(state, carries)          # compile + warm
    np.asarray(st.coords)
    best = float('inf')
    for _ in range(5):
        t = time.perf_counter()
        st, c, _ = run(st, c)
        np.asarray(st.coords)
        best = min(best, time.perf_counter() - t)
    return best

t_small = measure(512)
t_big = measure(4 * 512)
print(json.dumps({"t_small": t_small, "t_big": t_big,
                  "ratio": t_big / t_small}))
"""
    out = _run(py, devices=8)
    import json

    stats = json.loads(out.strip().splitlines()[-1])
    # 4x walkers: linear cost reads ~<=4x (often less — fixed per-step
    # dispatch amortizes); a quadratic term reads >=10x.
    assert stats["ratio"] < 7.0, stats
