"""Multi-host execution test: 2 CPU processes, one global 8-device mesh.

The SURVEY (§2.2) makes ``jax.distributed`` multi-host the equivalent of
the reference's MPI pool; this actually *executes* that path: two
subprocesses each holding 4 virtual CPU devices run the walker-sharded
samplers, chunk outputs are process_allgather-ed, and process 0 writes the
HDF backends.  The stored chains must be bit-identical to a single-process
run over an 8-device mesh of the same shape (same SPMD program, same keys).
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Two real OS processes per test: correct but slow; runs in the full tier.
pytestmark = pytest.mark.slow

from jax.sharding import Mesh

from emcee_tpu import EnsembleSampler, State, backends
from emcee_tpu.backends.pt import PTBackend
from emcee_tpu.parallel.tempering import PTSampler

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("multihost"))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    assert "WORKER0 DONE" in outs[0] + outs[1]
    return outdir


def test_multihost_ensemble_matches_single_process(multihost_outputs):
    fn = os.path.join(multihost_outputs, "multihost.h5")
    stored = backends.HDFBackend(fn, read_only=True)
    assert stored.iteration == 25

    # Same workload on this process's own 8-device mesh (same global mesh
    # shape => identical SPMD program and RNG streams).
    def log_prob(x):
        return -0.5 * jnp.sum(x**2)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("walkers",))
    s = EnsembleSampler(64, 3, log_prob, mesh=mesh, seed=7)
    p0 = np.random.default_rng(0).normal(size=(64, 3))
    s.run_mcmc(State(jnp.asarray(p0), random_state=jax.random.key(1)), 25)

    np.testing.assert_array_equal(
        np.asarray(stored.get_chain()), np.asarray(s.get_chain())
    )
    np.testing.assert_array_equal(
        np.asarray(stored.get_log_prob()), np.asarray(s.get_log_prob())
    )
    np.testing.assert_array_equal(stored.accepted, s.backend.accepted)


def test_multihost_pt_matches_single_process(multihost_outputs):
    from emcee_tpu.backends.pt import PTHDFBackend

    fn = os.path.join(multihost_outputs, "multihost_pt.h5")
    stored = PTHDFBackend(fn, read_only=True)
    assert stored.iteration == 10

    def log_like(x):
        return -0.5 * jnp.sum((x - 1.0) ** 2)

    def log_prior(x):
        return jnp.where(jnp.all(jnp.abs(x) < 10.0), 0.0, -jnp.inf)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("walkers",))
    pt = PTSampler(
        4, 32, 3, log_like, log_prior, backend=PTBackend(), mesh=mesh, seed=3
    )
    c0 = np.asarray(jax.random.normal(jax.random.key(9), (4, 32, 3)))
    pt.run_mcmc(c0, 10)

    np.testing.assert_array_equal(
        stored.get_chain(), np.asarray(pt.get_chain())
    )
    np.testing.assert_array_equal(
        stored.swaps_accepted, pt.swaps_accepted
    )


def test_shard_per_process_merge_matches_gathered(multihost_outputs):
    """Per-host shard files merge into a file bit-identical to the one
    the default gather-to-process-0 path writes (SURVEY §2.1 row 14's
    pod-scale storage plan)."""
    import glob

    from emcee_tpu.backends import HDFBackend, merge_shards

    base = os.path.join(multihost_outputs, "sharded.h5")
    shards = sorted(glob.glob(base + ".shard*-of-*"))
    assert len(shards) == 2, shards
    # each shard holds its local walkers only
    import h5py

    with h5py.File(shards[0], "r") as f:
        g = f["mcmc"]
        assert int(g.attrs["nwalkers"]) == 32
        assert int(g.attrs["global_nwalkers"]) == 64
        assert g["chain"].shape == (30, 32, 3)

    merged = merge_shards(base)
    gathered = HDFBackend(
        os.path.join(multihost_outputs, "gathered.h5"), read_only=True
    )
    np.testing.assert_array_equal(
        np.asarray(merged.get_chain()), np.asarray(gathered.get_chain())
    )
    np.testing.assert_array_equal(
        np.asarray(merged.get_log_prob()),
        np.asarray(gathered.get_log_prob()),
    )
    np.testing.assert_array_equal(
        np.asarray(merged.get_blobs()), np.asarray(gathered.get_blobs())
    )
    np.testing.assert_array_equal(merged.accepted, gathered.accepted)
    np.testing.assert_array_equal(
        merged.random_state, gathered.random_state
    )
    # The merged file resumes like any single-process file.
    import jax as _jax
    import jax.numpy as _jnp

    def log_prob_blobs(x):
        lp = -0.5 * _jnp.sum(x**2)
        return lp, 2.0 * lp

    s = EnsembleSampler(64, 3, log_prob_blobs, backend=HDFBackend(base))
    s.run_mcmc(None, 3)
    assert s.backend.iteration == 33


@pytest.fixture(scope="module")
def multihost_outputs_4proc(tmp_path_factory):
    """Same global 8-device mesh, carved as 4 processes x 2 devices —
    the chains must be bit-identical to the 2x4 topology AND to a
    single-process run (mesh shape, not process layout, fixes the SPMD
    program and RNG streams)."""
    outdir = str(tmp_path_factory.mktemp("multihost4"))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["MH_DEVICES_PER_PROC"] = "2"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "4", str(port), outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outdir


def test_multihost_4proc_matches_2proc(
    multihost_outputs, multihost_outputs_4proc
):
    a = backends.HDFBackend(
        os.path.join(multihost_outputs, "multihost.h5"), read_only=True
    )
    b = backends.HDFBackend(
        os.path.join(multihost_outputs_4proc, "multihost.h5"),
        read_only=True,
    )
    np.testing.assert_array_equal(
        np.asarray(a.get_chain()), np.asarray(b.get_chain())
    )
    np.testing.assert_array_equal(a.accepted, b.accepted)
    # 4-way shard files merge to the same global file too
    from emcee_tpu.backends import merge_shards

    import glob

    base4 = os.path.join(multihost_outputs_4proc, "sharded.h5")
    assert len(glob.glob(base4 + ".shard*-of-*")) == 4
    merged4 = merge_shards(base4)
    merged2 = merge_shards(
        os.path.join(multihost_outputs, "sharded.h5"),
        out=os.path.join(multihost_outputs, "sharded_merged2.h5"),
    )
    np.testing.assert_array_equal(
        np.asarray(merged4.get_chain()), np.asarray(merged2.get_chain())
    )
    np.testing.assert_array_equal(
        np.asarray(merged4.get_blobs()), np.asarray(merged2.get_blobs())
    )
