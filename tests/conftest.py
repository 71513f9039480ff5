"""Test environment: force CPU backend with 8 virtual devices so multi-chip
sharding paths (mesh, pjit, collectives) are exercised without TPU hardware
(SURVEY.md section 4 — the reference has no test suite; this is ours)."""

import os

# Force (not setdefault): the image exports JAX_PLATFORMS=axon, and
# main._apply_platform_env re-reads the env var — a leftover "axon" would flip
# the backend to the real TPU tunnel mid-test-run (1 device + exclusive lock).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The env var alone does not win over the axon TPU plugin in this image;
# the config update (before first backend use) does.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from gamer_tpu.data import synthetic


@pytest.fixture(scope="session")
def synth_data():
    """Small deterministic synthetic dataset shared across tests."""
    return synthetic.generate(synthetic.SyntheticSpec(
        n_users=24, n_items=60, n_clusters=4, min_len=8, max_len=24,
        num_levels=3, level_sizes=(8, 8, 16), emb_dim=32, seed=7,
    ))


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory, synth_data):
    root = tmp_path_factory.mktemp("data")
    synth_data.write(str(root), "Synth")
    return str(root)
