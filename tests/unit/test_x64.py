"""float64 policy test (the reference's longdouble suite analogue).

TPUs have no float64 ALUs and no x86 longdouble; the documented policy is
float32 by default with full float64 support under
``jax_enable_x64`` (CPU and interpretable paths).  Run in a subprocess so
the global x64 flag cannot leak into other tests.
"""

import subprocess
import sys

SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from emcee_tpu import EnsembleSampler

def log_prob(x):
    return -0.5 * jnp.sum(x**2)

nw, nd = 16, 2
p0 = np.random.default_rng(0).normal(size=(nw, nd))  # float64
s = EnsembleSampler(nw, nd, log_prob, seed=0)
s.run_mcmc(p0, 50)
chain = s.get_chain()
assert chain.dtype == np.float64, chain.dtype
lp = s.get_log_prob()
assert lp.dtype == np.float64, lp.dtype
# Precision actually holds: sub-float32-eps structure survives.
tiny = 1e-12
p1 = p0 + tiny * np.random.default_rng(1).normal(size=(nw, nd))
lpv, _ = s.compute_log_prob(p1)
lpv0, _ = s.compute_log_prob(p0)
diff = np.asarray(lpv) - np.asarray(lpv0)
assert np.any(diff != 0.0)
assert np.all(np.abs(diff) < 1e-8)
print("OK")
"""


def test_float64_chain():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_gradient_move_x64():
    """MALA under jax_enable_x64 (subprocess so the flag can't leak)."""
    import os
    import subprocess
    import sys

    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from emcee_tpu import EnsembleSampler, moves

def lp(x):
    return -0.5 * jnp.sum(x**2)

s = EnsembleSampler(32, 2, lp, moves=moves.MALAMove(1.2), seed=0)
p0 = np.random.default_rng(0).normal(size=(32, 2))
s.run_mcmc(p0, 300)
ch = np.asarray(s.get_chain())
assert ch.dtype == np.float64, ch.dtype
assert np.all(np.isfinite(ch))
assert abs(ch[100:].std() - 1) < 0.15
print("OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    out = subprocess.run(
        [sys.executable, "-c", script],
        env={**env, "PYTHONPATH": repo},
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
