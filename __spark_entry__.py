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
    grid_evaluate_discovery,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's headline (k, τ) evaluation grid
    (`join_discoverer.py:485-517`) on the sf0.001 embeddings — kNN
    self-join once at k_max, every grid cell a conditional slice →
    12 rows of (k, tau, tp, fp, fn, precision, recall, f1, ndcg_at_k)."""
    return grid_evaluate_discovery(
        spark, "/root/testdata/sf0.001", strategy="broadcast"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
