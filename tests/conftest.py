"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (per the multi-chip test strategy in
SURVEY.md §4): sharding semantics are platform-independent, so CPU results
validate the TPU sharding design.  Set PSA_TEST_PLATFORM=tpu to run the suite
against real hardware instead.
"""

import os

_platform = os.environ.get("PSA_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    # This environment pre-pins jax_platforms (e.g. "axon,cpu"), so the
    # JAX_PLATFORMS env var alone does not stick — update the config directly
    # before any backend initializes.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from psa_tpu.core.alphabet import encode
from psa_tpu.utils.io import read_input

GOLDEN_INPUT = "/root/reference/input.txt"
GOLDEN_OUTPUT = "/root/reference/output.txt"


@pytest.fixture(scope="session")
def golden_query():
    return read_input(GOLDEN_INPUT)


@pytest.fixture(scope="session")
def golden_expected():
    with open(GOLDEN_OUTPUT) as f:
        return f.read()


def random_codes(rng: np.random.Generator, n: int, hyphen_p: float = 0.05) -> np.ndarray:
    """Random sequence codes over A-Z with occasional hyphens."""
    codes = rng.integers(0, 26, size=n, dtype=np.int32)
    mask = rng.random(n) < hyphen_p
    codes[mask] = 26
    return codes


def random_seq(rng: np.random.Generator, n: int, hyphen_p: float = 0.05) -> str:
    from psa_tpu.core.alphabet import decode

    return decode(random_codes(rng, n, hyphen_p))
