from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pdf_parse_bench_spark.fixtures import ensure_fixtures  # noqa: E402
from pdf_parse_bench_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=8, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx_smoke():
    return ensure_fixtures(SF_SMOKE)


@pytest.fixture(scope="session")
def fx_correct():
    return ensure_fixtures(SF_CORRECT)
