"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4(d): multi-chip behaviour is validated on CPU via
``xla_force_host_platform_device_count`` — the JAX-native analog of a fake
multi-node backend.

Platform forcing is tricky in this image: a sitecustomize pre-imports jax and
registers the 'axon' TPU tunnel backend before any conftest runs, so env vars
alone are ignored. We override through jax.config, which works post-import.
"""

import os

# Single-thread BLAS/OpenMP (the reference pins the same, utils/utils.py:1-5);
# also prevents a jax<->torch OpenMP futex deadlock in parity tests.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f32 matmuls everywhere in tests (parity oracles assume float32 math).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the host CPU backend"
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(1997)
