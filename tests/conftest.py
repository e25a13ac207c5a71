"""Test config: force CPU with 8 virtual devices BEFORE any computation.

Multi-chip sharding tests run on a simulated 8-device CPU mesh
(SURVEY.md §4 "multi-host tests runnable on CPU"); Pallas kernels run in
interpret mode on CPU. Note: on this image the experimental 'axon' TPU
platform ignores JAX_PLATFORMS, so we must use jax.config directly.
"""

import os

# BAGS_TPU_TEST_TPU=1 switches to the real-chip lane (pytest -m tpu,
# tests/test_tpu.py): no CPU forcing, no interpret mode.
TPU_LANE = os.environ.get("BAGS_TPU_TEST_TPU", "0") == "1"

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("BAGS_TPU_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
