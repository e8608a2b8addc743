from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
GOLDEN = "/root/reference/test-data/my_table"
GOLDEN_ORIG = "/Users/mdurant/temp/warehouse/db/my_table"


@pytest.fixture(scope="session")
def spark():
    from daskberg_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture()
def golden_table():
    from daskberg_spark.iceberg.metadata import IcebergTable

    return IcebergTable(GOLDEN, original_url=GOLDEN_ORIG)
