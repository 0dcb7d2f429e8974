"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The reference has no tests (SURVEY.md §4); we simulate multi-chip with
virtual CPU devices — the TPU-native analog of a fake backend. The
environment's sitecustomize imports jax (for the TPU tunnel) before
conftest runs, so env vars are too late; jax.config still works because
no backend has been initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
