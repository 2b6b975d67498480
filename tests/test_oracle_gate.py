"""Every registered query must hash-match its DuckDB oracle at sf0.001
(the driver runs the same gate at sf0.01 — SURVEY §5.2 item 1)."""

from __future__ import annotations

import pytest

from semantic_ann_in_data_lake_spark.plans import registry
from tests._compare import compare

_NAMES = sorted(registry.REGISTRY)


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn, sql = registry.REGISTRY[name]
    sdf = fn(spark, sf_dir)
    if sql is None:
        assert sdf.count() >= 0  # rows-only contract
        return
    problems = compare(sdf, duck, sql)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"precision", "recall", "f1", "ndcg_at_k"} <= set(df.columns)


def test_every_query_has_oracle_or_is_documented():
    missing = [n for n, (_, sql) in registry.REGISTRY.items() if sql is None]
    # rows-only entries must be the genuinely non-SQL-expressible ops:
    # approximate LSH, stubbed media decode, sequential synonym loop
    allowed = ("lsh", "ivf", "stream", "media", "synonym", "approx", "_ann", "_pq")
    assert all(any(tag in n for tag in allowed) for n in missing), missing
