"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-device sharding paths are exercised without TPU hardware
(SURVEY.md section 4 test strategy).

This environment preimports jax with a remote `axon` TPU backend via
sitecustomize and pins JAX_PLATFORMS=axon, so env vars alone are too
late / ignored — the platform must be overridden through jax.config
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402 (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the e2e tests recompile ~20 programs per run
# on a single CPU core otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(2021)


@pytest.fixture
def key():
    return jax.random.PRNGKey(2021)
