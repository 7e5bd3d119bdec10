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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # This VM live-migrates between hosts with different x86 ISA
    # extensions and jaxlib's target detection can disagree with the
    # actual host — compiling large programs then SEGFAULTS
    # ("+prefer-no-scatter is not supported on the host machine").
    # Capping codegen at AVX2 makes compilation safe everywhere.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402 (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compile cache on CPU: this VM live-migrates between
# hosts with different x86 ISA extensions, and XLA:CPU AOT executable
# (de)serialization SEGFAULTS under the mismatch ("+prefer-no-scatter
# is not supported on the host machine") — observed on both cache reads
# and writes, even with --xla_cpu_max_isa capped. Recompiling each run
# is slower but deterministic. (main._enable_compile_cache likewise
# skips persistence on CPU; the TPU cache is unaffected.)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(2021)


@pytest.fixture
def key():
    return jax.random.PRNGKey(2021)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module: with ~23
    modules compiling into one process, XLA:CPU eventually segfaults
    compiling the last large program (test_trajectory_parity) — an
    accumulated-state upstream bug this host started exhibiting after a
    live-migration. Per-module teardown keeps the process light; each
    module's own programs still compile once."""
    yield
    jax.clear_caches()
