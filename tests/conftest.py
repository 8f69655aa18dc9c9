from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_crawler_slm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
FIXTURES = os.path.join(REPO, "fixtures")


@pytest.fixture(scope="session")
def spark():
    # Modest core count for the shared test session; determinism tests spin
    # up their own sessions at other parallelism levels.
    s = get_spark("nc-slm-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def fixtures_dir() -> str:
    return FIXTURES
