"""Test configuration: run everything on an 8-device virtual CPU mesh, fp64.

The single real TPU chip behind the axon tunnel is reserved for benchmarks;
tests exercise the fp64 CPU oracle path (SURVEY.md §7 hard-part 3) and the
multi-chip sharding story on virtual devices.  The axon sitecustomize imports
jax at interpreter startup, so the platform is switched via ``jax.config``
(still possible pre-backend-init) rather than ``JAX_PLATFORMS``.

NOTE: the default tier deselects ``@pytest.mark.slow`` via pyproject
``addopts`` — this ALSO deselects a slow test you name explicitly by node
id ("1 deselected, no tests ran").  Override with ``-m ""`` (run
everything) or ``-m slow`` (slow tier only).
"""

import os

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from armadillocudalinearinterpolation_tpu import ModelConfig, MapParams  # noqa: E402
from armadillocudalinearinterpolation_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()


@pytest.fixture(scope="session")
def cfg():
    """Small but physical config: converges to the reference regime."""
    return ModelConfig(n_neurons=512, n_real=4, dtype="float64")


@pytest.fixture(scope="session")
def params():
    """Driver.cu:16 — beta = 13.0589, homogeneous (sigma = 0)."""
    return MapParams.create(13.0589, 0.0, dtype="float64")


@pytest.fixture(scope="session")
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def z_ref():
    """Reference initial guess / approximate fixed point (Driver.cu:24)."""
    return jnp.array([0.3310, 0.6914, 1.3557], jnp.float64)
