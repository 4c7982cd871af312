"""Test configuration: force an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware.

The container's sitecustomize registers the axon TPU backend and sets
``jax.config.jax_platforms = "axon,cpu"`` (which overrides the
JAX_PLATFORMS env var), so we set the config back to cpu here -- before
any backend is initialized -- and request 8 virtual host devices.
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

import gauss_tpu  # noqa: F401  (enables x64)
from gauss_tpu.utils import testing as gtest


@pytest.fixture(scope="session")
def synpanel(tmp_path_factory):
    d = tmp_path_factory.mktemp("panel")
    return gtest.make_synthetic_panel(str(d), n_snps=300)


@pytest.fixture(scope="session")
def gwas_input(synpanel, tmp_path_factory):
    d = tmp_path_factory.mktemp("gwas")
    path = str(d / "zinput.txt")
    truth = gtest.make_gwas_input(synpanel, path)
    return path, truth
