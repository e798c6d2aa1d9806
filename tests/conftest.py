"""Test configuration: force CPU JAX with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (the driver separately dry-runs the
multichip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

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


@pytest.fixture(scope="session", autouse=True)
def _precompile_heavy_pipeline_programs():
    """Compile the big composed pipeline / sampling / n-best programs
    FIRST, while the in-process XLA CPU compiler state is fresh.

    Late in a full-suite run (one process, ~160 tests' worth of
    compiles) the CPU backend deterministically aborted/segfaulted
    inside backend_compile_and_load when one of these large programs
    compiled cold around the 120th test (observed at
    test_per_row_sampling_parameters across four runs, each dying in
    whichever of the family compiled at that point; every program
    compiles fine in a fresh process). Front-loading the compiles — on
    top of the fingerprinted persistent cache — keeps the late-suite
    compile load small. Costs ~30 s cold, ~2 s warm."""
    from sentencepiece_tpu import SentencePieceProcessor
    from sentencepiece_tpu.tpu.pipeline import TpuTokenizer
    import numpy as np

    sp = SentencePieceProcessor(
        str(REFERENCE / "python/test/test_model.model"))
    tok = TpuTokenizer(sp)
    texts = ["I have a pen.", "hello world"]
    tok.encode(texts)
    tok.sample_encode(texts, [5, -1], [0.7, 0.5],
                      rng=__import__("numpy").random.default_rng(0))
    yield
