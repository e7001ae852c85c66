"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Mirrors the reference's CPU-golden differential-testing strategy
(number_system/mx/tests/test_quantize_mx.py:37-66): the pure-JAX CPU path is
validated bit-exactly against committed fixtures produced by the reference,
and Pallas kernels are differential-tested against the pure-JAX twin.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers a remote-TPU PJRT plugin and
# force-sets jax_platforms="axon,cpu" at interpreter start, which overrides
# the env var above. Force the config back to CPU so unit tests never touch
# the (single, shared, flaky-under-contention) TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_elemwise():
    return np.load(GOLDEN / "elemwise.npz")


@pytest.fixture(scope="session")
def golden_mx():
    return np.load(GOLDEN / "mx.npz")


@pytest.fixture(scope="session")
def golden_outlier():
    return np.load(GOLDEN / "outlier.npz")


@pytest.fixture(scope="session")
def golden_gptq():
    return np.load(GOLDEN / "gptq.npz")


@pytest.fixture(scope="session")
def golden_gear():
    return np.load(GOLDEN / "gear.npz")


@pytest.fixture(scope="session")
def golden_conv():
    return np.load(GOLDEN / "conv.npz")
