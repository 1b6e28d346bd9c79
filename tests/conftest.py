"""Test configuration: run everything on a virtual 8-device CPU mesh.

Replaces the reference's untested torchrun/NCCL path (SURVEY.md §4) with
deterministic CPU simulation: mesh/pjit/collective tests run against
8 virtual devices via XLA host platform device count.
"""
import os

# Force CPU even when the environment pins a TPU platform (JAX_PLATFORMS=axon
# under the tunnel): tests must be deterministic f32 on the virtual 8-device
# mesh.  The config.update below finishes the job after import — the platform
# plugin's sitecustomize merges its own value into jax_platforms.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: fail fast

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
