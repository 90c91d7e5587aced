"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the TPU answer to multi-node test
rigs — see SURVEY.md §4). Must be set before JAX initializes.
"""

import os

# The environment pins JAX_PLATFORMS=axon (TPU) and pre-imports jax via
# sitecustomize, so plain env vars are too late for the platform choice —
# use jax.config (effective until backends initialize).
os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the warp-fit disk cache under pytest: tests that count Trainer.fit
# calls (test_stacking.py) must not be satisfied by a stale runs/ artifact.
os.environ["MRI_TPU_WARP_FIT_CACHE"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def sample_volume_path():
    path = "/root/reference/sample_ankle_dyn_mri.nii.gz"
    if not os.path.exists(path):
        pytest.skip("sample ankle volume not available")
    return path


@pytest.fixture()
def rng():
    return np.random.default_rng(1337)
