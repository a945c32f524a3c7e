"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware.

The harness environment pins JAX_PLATFORMS to a TPU plugin; override it at
config level before any backend is initialized.

The persistent compilation cache is enabled so the expensive fused-step
compiles (minutes on a single CPU core) pay only once: a warm re-run of
the full suite stays within a few minutes. Slow integration tests carry
@pytest.mark.slow — `pytest -m "not slow"` runs the fast unit/parity
half only.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_comp"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: integration tests that compile the fused train "
        "step (minutes cold, seconds warm via the persistent cache)")
