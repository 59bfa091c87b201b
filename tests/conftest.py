"""Test configuration: force an 8-virtual-device CPU platform so
sharding/pjit logic is exercised without TPU hardware (the standard JAX
fake-mesh trick). Benchmarks (bench.py) do NOT import this and run on the
real chip.

Note: the axon TPU plugin's sitecustomize force-selects jax_platforms at
interpreter startup, so the env var alone is not enough — we must override
via jax.config before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


def random_rotation(rng) -> np.ndarray:
    """Haar-random 3x3 rotation matrix (det +1)."""
    m = rng.standard_normal((3, 3))
    q, r = np.linalg.qr(m)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)


@pytest.fixture
def rot(rng_np):
    return random_rotation(rng_np)
