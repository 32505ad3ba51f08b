"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding tests run without TPU hardware (SURVEY.md §4 implication (d))."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The session environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel) and a sitecustomize imports jax at interpreter start, so the
# env var alone is too late — override through jax.config as well
# (backends are not initialized until first use, so this still works).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from sddmm_tpu.data import generate  # noqa: E402


@pytest.fixture(scope="session")
def small_random_csr():
    return generate.random_sparse(200, 160, density=0.05, seed=3)


@pytest.fixture(scope="session")
def clustered_csr():
    return generate.block_clustered(
        num_row_groups=24, num_col_groups=20, block_prob=0.15,
        block_density=0.8, noise_density=0.002, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
