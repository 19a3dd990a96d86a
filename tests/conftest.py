"""Shared pytest fixtures.

Ray is initialised ONCE per session (required by the driver contract); the
pure-Python conformance tests never touch it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
SUITE = os.path.join(FIXTURES, "test-suite")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from csvweb_ray.raycfg import configure

    configure(4)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


@pytest.fixture(scope="session")
def suite_dir():
    return SUITE
