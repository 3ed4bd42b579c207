"""Test fixtures: force CPU backend with 8 virtual devices (the multi-chip
simulator per SURVEY.md §4) before jax initializes."""

import os

# Force the CPU backend with 8 virtual devices so mesh tests exercise real
# multi-device sharding. The image pins jax_platforms=axon (real TPU) at both
# env and config level, so we must override the jax config directly — env
# setdefault is not enough and pytest plugins import jax before this file.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def storage():
    from vectorsearch_tpu.core.persist import MemoryStorage

    return MemoryStorage()
