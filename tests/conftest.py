import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (must be set before jax import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# this JAX distro ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# persistent compile cache: re-runs of the suite skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/matcha_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# this JAX build lowers f32 matmuls to reduced precision by default; the
# golden-parity tests compare against torch true-f32
jax.config.update("jax_default_matmul_precision", "highest")

from matcha_tpu.genome import GenomeBins


@pytest.fixture(scope="session")
def tiny_genome():
    """Three small chromosomes at 1 Mb resolution."""
    return GenomeBins(["chr1", "chr2", "chr3"],
                      [49_500_000, 30_200_000, 19_999_999], 1_000_000)


@pytest.fixture
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of collection order (a session-scoped generator made
    # test data depend on which tests ran before)
    return np.random.default_rng(42)
