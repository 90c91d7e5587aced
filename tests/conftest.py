"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the TPU answer to multi-node test
rigs — see SURVEY.md §4). Must be set before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
