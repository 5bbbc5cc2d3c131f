"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(mesh/pjit/shard_map) is exercised without TPU hardware — the JAX-native
replacement for the reference's missing distributed-test story (SURVEY.md §4).
Must set env vars before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override ambient axon/TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# something in the environment force-appends the axon TPU plugin to
# jax_platforms even when JAX_PLATFORMS=cpu; pin it explicitly.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE_DIR.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR
