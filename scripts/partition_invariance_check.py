"""Partition-insensitivity gate: re-run the most partition-sensitive
gated queries under a DELIBERATELY different parallelism (local[5],
7 shuffle partitions vs the standard local[32]/32) and compare against
the same DuckDB oracles.

A pass proves the engine-portability discipline (integer micro-unit
sums, decimal accumulation, rounded-key ranking with id tie-breaks,
content-addressed sampling) holds independent of partitioning — the
property that makes results reproducible across cluster sizes.

Runs as its own process because a pytest-managed SparkSession pins one
JVM-wide SparkContext (an in-suite variant would silently reuse the
fixture's 32-thread config).

Usage: python scripts/partition_invariance_check.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

#: queries whose plans exercise every portability discipline: micro-unit
#: log sums, prefix sums, sampling keys, ranking windows, set joins
TRICKY = [
    "dsir_select_docs",
    "winnow_fingerprints_docs",
    "winnow_overlap_pairs",
    "record_linkage_scores",
    "budget_select_docs",
    "bm25_search_docs",
    "curation_funnel_docs",
    "containment_pairs_docs",
    "char_entropy_docs",
    "tfidf_top_terms",
    "bigram_lm_scores",
    "weighted_sample_docs",
]


def main():
    from pyspark.sql import SparkSession

    from tests._compare import compare, duckdb_con

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[5]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name in TRICKY:
        t0 = time.time()
        try:
            problems = compare(qs[name](spark, sf_dir), con, oracles[name])
        except Exception as exc:  # surface, keep sweeping
            problems = [f"error: {str(exc).splitlines()[0][:150]}"]
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name} ({time.time() - t0:.1f}s)")
    print(f"\n{len(TRICKY) - len(failed)} passed, {len(failed)} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
