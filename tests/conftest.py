"""Test environment: force an 8-device virtual CPU backend.

This is the standard JAX fake-backend trick for exercising multi-chip
sharding (SURVEY.md §4) without TPU hardware. Benchmarks (bench.py) run on the
real chip instead; tests must stay hermetic and CPU-runnable.

Note: the environment's sitecustomize overrides JAX_PLATFORMS, so we must set
the platform via jax.config *after* import, not via env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
