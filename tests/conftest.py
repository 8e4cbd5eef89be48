"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices since real pods are
not available in CI (SURVEY.md section 4 'Implication for the rebuild').
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
