"""Worker for the 2-process multi-host CPU test.

Launched by ``tests/unit/test_multihost.py`` as::

    python tests/multihost_worker.py <pid> <nproc> <port> <outdir>

Each process owns 4 virtual CPU devices; ``jax.distributed`` stitches them
into one 8-device global mesh.  Process 0 holds the real storage backends
(the multi-host convention: sampler outputs are process_allgather-ed and
only process 0 writes); other processes pass in-memory dummies.
"""

import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)

_DEV_PER_PROC = int(os.environ.get("MH_DEVICES_PER_PROC", "4"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_DEV_PER_PROC}"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jax.sharding import Mesh

from emcee_tpu import EnsembleSampler, State, backends
from emcee_tpu.backends.pt import PTBackend, PTHDFBackend
from emcee_tpu.parallel.tempering import PTSampler

assert jax.device_count() == _DEV_PER_PROC * nproc, jax.devices()
mesh = Mesh(np.asarray(jax.devices()), ("walkers",))


def log_prob(x):
    return -0.5 * jnp.sum(x**2)


nwalkers, ndim, nsteps = 64, 3, 25
if pid == 0:
    be = backends.HDFBackend(os.path.join(outdir, "multihost.h5"))
else:
    be = backends.Backend()
s = EnsembleSampler(
    nwalkers, ndim, log_prob, backend=be, mesh=mesh, seed=7
)
rng = np.random.default_rng(0)
p0 = rng.normal(size=(nwalkers, ndim))
s.run_mcmc(State(jnp.asarray(p0), random_state=jax.random.key(1)), nsteps)


def log_like(x):
    return -0.5 * jnp.sum((x - 1.0) ** 2)


def log_prior(x):
    return jnp.where(jnp.all(jnp.abs(x) < 10.0), 0.0, -jnp.inf)


T, nw_pt = 4, 32
if pid == 0:
    pt_be = PTHDFBackend(os.path.join(outdir, "multihost_pt.h5"))
else:
    pt_be = PTBackend()
pt = PTSampler(
    T, nw_pt, ndim, log_like, log_prior, backend=pt_be, mesh=mesh, seed=3
)
c0 = np.asarray(
    jax.random.normal(jax.random.key(9), (T, nw_pt, ndim))
)
pt.run_mcmc(c0, 10)

if pid == 0:
    print("WORKER0 DONE", s.iteration, pt.iteration, flush=True)

# Device-resident backend under multi-host: chunk outputs are
# process_allgather-ed (host numpy) and only process 0's backend stores
# them; the result must match the HDF chain of the identical run above
# bit-for-bit.
dev_be = backends.DeviceBackend()
s2 = EnsembleSampler(
    nwalkers, ndim, log_prob, backend=dev_be, mesh=mesh, seed=7
)
s2.run_mcmc(State(jnp.asarray(p0), random_state=jax.random.key(1)), nsteps)
if pid == 0:
    ref = np.asarray(
        backends.HDFBackend(
            os.path.join(outdir, "multihost.h5"), read_only=True
        ).get_chain()
    )
    got = np.asarray(s2.get_chain(), dtype=ref.dtype)
    assert np.array_equal(got, ref), "device-backend multihost mismatch"
    print("DEVBACKEND OK", flush=True)

# Tempered device backend under multi-host: the PT save path falls back
# to the gathered-host branch (the wants_device_arrays fast path is
# single-process only); process 0's PTDeviceBackend must match the
# PTHDF chain of the identical run above bit-for-bit.
from emcee_tpu.backends.pt import PTDeviceBackend

pt_dev = PTSampler(
    T, nw_pt, ndim, log_like, log_prior,
    backend=PTDeviceBackend(), mesh=mesh, seed=3,
)
pt_dev.run_mcmc(c0, 10)
if pid == 0:
    ref_pt = np.asarray(
        PTHDFBackend(os.path.join(outdir, "multihost_pt.h5")).get_chain()
    )
    got_pt = np.asarray(pt_dev.get_chain(), dtype=ref_pt.dtype)
    assert np.array_equal(got_pt, ref_pt), "PT device-backend multihost mismatch"
    print("PT DEVBACKEND OK", flush=True)

# Per-process shard storage: EVERY process writes its own walker shard
# file (no process_allgather); the test merges the shards and compares
# against the gathered multihost.h5 bit-for-bit.
def log_prob_blobs(x):
    lp = -0.5 * jnp.sum(x**2)
    return lp, 2.0 * lp


shard_be = backends.HDFBackend(
    os.path.join(outdir, "sharded.h5"), shard_per_process=True
)
s3 = EnsembleSampler(
    nwalkers, ndim, log_prob_blobs, backend=shard_be, mesh=mesh, seed=7
)
s3.run_mcmc(State(jnp.asarray(p0), random_state=jax.random.key(1)), nsteps)
assert shard_be.iteration == nsteps
# in-process continuation works (anchors live in memory)
s3.run_mcmc(None, 5)
assert shard_be.iteration == nsteps + 5
print(f"SHARD{pid} DONE", flush=True)

# Reference run through the default gathered path with the same model,
# for the bit-identity comparison (blob-ful, unlike multihost.h5).
if pid == 0:
    gathered_be = backends.HDFBackend(os.path.join(outdir, "gathered.h5"))
else:
    gathered_be = backends.Backend()
s4 = EnsembleSampler(
    nwalkers, ndim, log_prob_blobs, backend=gathered_be, mesh=mesh, seed=7
)
s4.run_mcmc(State(jnp.asarray(p0), random_state=jax.random.key(1)), nsteps)
s4.run_mcmc(None, 5)
if pid == 0:
    print("GATHERED DONE", flush=True)
