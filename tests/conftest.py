"""Test configuration: force an 8-device CPU mesh so distributed paths are
exercised without TPU hardware (the standard JAX trick, SURVEY.md §4).

NOTE: this environment force-registers a tunneled TPU backend via
sitecustomize (JAX_PLATFORMS=axon); the env-var override is ignored, so we
must use jax.config.update BEFORE any computation."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    return "/root/reference/Data"
