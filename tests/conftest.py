"""Test env: force CPU backend with 8 virtual devices so sharded paths are
exercised without TPU hardware (the JAX analog of a fake backend,
SURVEY.md §4).

Note: this image's sitecustomize force-registers the 'axon' TPU plugin and
sets jax_platforms='axon,cpu' in every process, ignoring the JAX_PLATFORMS
env var — so we must override via jax.config *after* import, before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on CPU"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
