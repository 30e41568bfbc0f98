"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU exactly as the reference
validates numerics against its CPU backend (SURVEY.md §4): real-TPU runs
happen in bench.py, not in unit tests.
"""

import os

# Must be set before jax is imported anywhere. Overwrite (not setdefault):
# the driver environment pins JAX_PLATFORMS to the TPU tunnel, but unit tests
# always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
