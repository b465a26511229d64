"""Multi-step VMEM-resident chain kernel (interpret mode on CPU).

Statistical oracle + bookkeeping checks for ``ops.chain_kernel`` — the
TPU codepath shares this exact program (interpret=False only changes the
execution backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu.ops.chain_kernel import chain_kernel_supported, stretch_chain

ND = 3


def lp_rows(q):
    x = q[:ND, :]
    return -0.5 * jnp.sum(x * x, axis=0, keepdims=True)


def test_supported_gate():
    assert chain_kernel_supported(512, 3)
    assert chain_kernel_supported(9984, 100)
    assert not chain_kernel_supported(100, 3)  # halves not lane-aligned
    assert not chain_kernel_supported(98304, 100)  # VMEM overflow


def test_chain_kernel_samples_unit_normal():
    nw = 512
    coords = jax.random.normal(jax.random.key(0), (nw, ND))
    lp = -0.5 * jnp.sum(coords**2, axis=1)
    c, l, acc = stretch_chain(
        coords, lp, jax.random.key(1), 1200, log_prob_rows=lp_rows
    )
    # log-prob bookkeeping stays consistent with the coordinates.
    np.testing.assert_allclose(
        np.asarray(l), -0.5 * np.sum(np.asarray(c) ** 2, axis=1), atol=1e-4
    )
    acc_rate = float(np.asarray(acc).mean()) / 1200
    assert 0.2 < acc_rate < 0.9, acc_rate
    flat = np.asarray(c)
    assert np.all(np.abs(flat.mean(0)) < 0.15)
    assert np.all(np.abs(flat.std(0) - 1) < 0.12)


def test_chain_kernel_unsupported_shape_raises():
    coords = jnp.zeros((100, 3))
    with pytest.raises(ValueError):
        stretch_chain(
            coords,
            jnp.zeros(100),
            jax.random.key(0),
            8,
            log_prob_rows=lp_rows,
        )
