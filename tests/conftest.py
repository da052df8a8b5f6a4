from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
REFERENCE_INPUT = "/root/reference/src/main/resources/input"


@pytest.fixture(scope="session")
def spark():
    from mapreduce_word2vec_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from mapreduce_word2vec_spark.oracle import duckdb_connection

    return duckdb_connection(SF_SMOKE)
