"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``semantic_ann_in_data_lake_spark``
package; this module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from semantic_ann_in_data_lake_spark.plans import registry  # noqa: E402
from semantic_ann_in_data_lake_spark.plans.pipeline import (  # noqa: E402
    evaluate_discovery,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full SemLink-style discover+evaluate pipeline on the
    sf0.001 embeddings (kNN self-join → √L2 threshold → P/R/F1 + NDCG)."""
    return evaluate_discovery(
        spark, "/root/testdata/sf0.001", k=10, tau=1.3, strategy="broadcast"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
