"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must execute before any module initializes the JAX backend.  The
environment's sitecustomize pins ``jax_platforms=axon,cpu`` (the tunneled
TPU), so we override the config directly — env vars alone are not enough.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
