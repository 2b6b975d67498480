from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TEST = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from semantic_ann_in_data_lake_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    if not os.path.isdir(SF_TEST):
        pytest.skip(
            f"test data dir {SF_TEST} absent "
            "(set SPARK_GRAFT_TEST_SF_DIR to your sf0.001 parquet dir)"
        )
    return SF_TEST


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests._compare import duckdb_con

    return duckdb_con(sf_dir)


@pytest.fixture(scope="session")
def shared_spark(spark):
    """Alias usable inside hypothesis @given tests (function-scoped
    fixtures clash with hypothesis; session fixtures do not)."""
    return spark
