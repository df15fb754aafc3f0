"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without a TPU pod (SURVEY.md §4.6).  Must be set before JAX
initializes a backend.
"""

import os
import random
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0DA)
