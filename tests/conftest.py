"""Test configuration: force CPU JAX with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (the driver separately dry-runs the
multichip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize pins jax_platforms to the TPU plugin regardless of
# the env var; the config update below wins (must run before backend init).
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def test_model_path():
    return str(REFERENCE / "python/test/test_model.model")


@pytest.fixture(scope="session")
def test_ja_model_path():
    return str(REFERENCE / "python/test/test_ja_model.model")


@pytest.fixture(scope="session")
def botchan_path():
    return str(REFERENCE / "data/botchan.txt")


@pytest.fixture(scope="session")
def wagahai_path():
    return str(REFERENCE / "data/wagahaiwa_nekodearu.txt")


@pytest.fixture(scope="session")
def fixtures_dir():
    return REPO / "tests" / "fixtures"
