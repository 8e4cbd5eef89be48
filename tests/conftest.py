"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices since real pods are
not available in CI (SURVEY.md section 4 'Implication for the rebuild').

Note: the axon TPU plugin (when present via /root/.axon_site sitecustomize)
force-sets jax_platforms="axon,cpu" at interpreter start, overriding the
JAX_PLATFORMS env var — so we must override via jax.config *after* import,
before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: the suite is dominated by per-test jit compiles
# on CPU; caching them across runs turns the ~20-minute full suite into a
# few minutes after the first run (VERDICT round-2 weak #7)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"
