"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive canonicalized value multiset.

Usage:  python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from tests._compare import compare, duckdb_con  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from semantic_ann_in_data_lake_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb_con(sf_dir)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed, passed, skipped = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                skipped.append(name)
                print(f"SKIP  {name}: rows-only ({n} rows, {time.time()-t0:.1f}s)")
                continue
            problems = compare(sdf, con, oracles[name])
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: error: {str(e).splitlines()[0][:200]}")
            continue
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"PASS  {name} ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
