"""Shared fixtures for the chiron-tpu test suite.

Tests run on whatever JAX backend is available (TPU on the benchmark host,
CPU in CI).  Multi-device sharding tests live in tests/test_parallel.py and
spawn a subprocess with a forced 8-device CPU topology (SURVEY.md section 4:
``xla_force_host_platform_device_count`` is the no-cluster multi-device test
mechanism).
"""

import os
import sys

# Ensure the repo root is importable when running `pytest tests/`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow statistical-convergence tests unless RUN_SLOW=1.

    Mirrors the reference's practice of skipping long convergence tests in CI
    (reference chiron/tests/test_convergence_tests.py:19-20,126-127).
    """
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow statistical test; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

