"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard JAX fake-backend trick for exercising mesh/pjit code
without TPU hardware (SURVEY.md §4).  Note: importing pytest already imports
jax (plugin hook), and jax captures JAX_PLATFORMS at import time — the shell
profile exports ``axon`` (the tunneled TPU), so we must override via
jax.config *before any backend is initialized*, not via os.environ.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must not run over the TPU tunnel"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
