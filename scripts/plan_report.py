"""Physical-plan audit over the whole registry.

Compiles (does NOT execute) every registered query at the given sf and
reports scan/exchange/join composition, flagging the two shapes that
kill 100 TB runs: cartesian/nested-loop joins and single-partition
exchanges on the data path. Run per round; diff against the previous
report to catch plan regressions the per-operator tests don't pin.

Usage: python scripts/plan_report.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from semantic_ann_in_data_lake_spark.plans import registry
    from semantic_ann_in_data_lake_spark.session import get_spark

    spark = get_spark("plan_report")
    flagged = []
    print(f"{'query':34s} {'scans':>5s} {'hashEx':>6s} {'rangeEx':>7s} "
          f"{'1pEx':>4s} {'bcast':>5s} {'smj':>4s} {'cart':>4s}")
    for name, (fn, _) in registry.REGISTRY.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:34s} PLAN ERROR: {str(e)[:80]}")
            flagged.append((name, "error"))
            continue
        stats = {
            "scans": plan.count("Location: InMemoryFileIndex"),
            "hashEx": plan.count("Exchange hashpartitioning"),
            "rangeEx": plan.count("Exchange rangepartitioning"),
            "1pEx": plan.count("Exchange SinglePartition"),
            "bcast": plan.count("BroadcastHashJoin")
            + plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "cart": plan.count("CartesianProduct"),
        }
        note = ""
        # exact-kNN oracles are the ONLY sanctioned cartesians
        if stats["cart"] and not name.startswith(
            ("knn_exact", "knn_topk", "ann_threshold", "embedding_dup",
             "ngram_jaccard", "semantic_search", "j7_")
        ):
            note = "  <-- CARTESIAN"
            flagged.append((name, "cartesian"))
        print(
            f"{name:34s} {stats['scans']:5d} {stats['hashEx']:6d} "
            f"{stats['rangeEx']:7d} {stats['1pEx']:4d} {stats['bcast']:5d} "
            f"{stats['smj']:4d} {stats['cart']:4d}{note}"
        )
    print(f"\nflagged: {flagged if flagged else 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
