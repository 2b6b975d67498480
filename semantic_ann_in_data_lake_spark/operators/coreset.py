"""k-center coreset selection (greedy farthest-first traversal).

Public method: Gonzalez, *Clustering to minimize the maximum
intercluster distance* (TCS 1985) — the 2-approximation greedy for
the k-center problem — as used for training-data coreset selection by
Sener & Savarese, *Active Learning for Convolutional Neural Networks:
A Core-Set Approach* (ICLR 2018). Starting from a deterministic seed
point, repeatedly add the point FARTHEST from every already-chosen
center. The chosen k points maximize diversity coverage: every corpus
vector lies within the final ``radius`` of some center.

The diversity-maximizing complement to ``operators/dsir.py``
(distribution-matching selection) and ``operators/semdedup.py``
(redundancy removal) — the third leg of published data-selection
practice.

Scale design:

- **k bounded driver rounds, each one distributed pass.** Round i
  updates a persisted ``(id, vec, mindist)`` frame with the distance
  to the newest center (row-local: the center vector broadcasts as a
  literal) and extracts the next argmax via ``orderBy(...).limit(1)``
  — TakeOrderedAndProject (per-partition heaps + 1-row driver merge),
  never a global sort. Driver state is exactly k (id, vector) rows.
- **Lineage stays shallow**: each round persists the updated frame
  and unpersists the previous one (the dedup-CC iteration
  discipline), so round i+1 reads round i's cache, not a k-deep
  recompute chain.
- **Deterministic**: the seed center is the minimum id, every argmax
  tie breaks by ascending id, and distances are exact float64 — the
  selected set is a pure function of the input, stable under
  partitioning and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.vectors import l2_sq


def kcenter_coreset(
    emb: DataFrame,
    k: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center selection; returns the k chosen centers as
    ``(center_rank, vec_id, radius)`` — ``center_rank`` the 1-based
    selection order, ``radius`` the point's min L2 distance to all
    EARLIER centers at selection time (∞-free: the seed center
    reports 0.0; radii are non-increasing thereafter, and
    ``radius[k]`` bounds every corpus point's distance to the chosen
    set — the k-center covering radius certificate).
    """
    import math

    if k < 1:
        raise ValueError("k must be ≥ 1")
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    seed_row = base.orderBy(F.col("vec_id").asc()).limit(1).collect()
    if not seed_row:
        return base.sparkSession.createDataFrame(
            [], "center_rank int, vec_id long, radius double"
        )
    centers = [(1, int(seed_row[0]["vec_id"]), 0.0)]
    center_vec = list(seed_row[0]["__v"])

    cur = base.withColumn(
        "__mind",
        l2_sq(F.col("__v"), F.array(*[F.lit(float(x)) for x in center_vec])),
    ).persist()
    prev = None  # parent cache kept alive until `cur` is materialized
    try:
        for rank in range(2, k + 1):
            # ONE job per round: this argmax collect is also what
            # materializes `cur`'s cache (persist is lazy), reading the
            # parent's still-live blocks — only then is the parent
            # dropped. The former explicit `nxt.count()` materialization
            # doubled the per-round job count for the same data work.
            top = (
                cur.filter(
                    ~F.col("vec_id").isin([c[1] for c in centers])
                )
                .orderBy(F.col("__mind").desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break  # fewer distinct points than k
            row = top[0]
            centers.append(
                (rank, int(row["vec_id"]), math.sqrt(float(row["__mind"])))
            )
            new_vec = F.array(*[F.lit(float(x)) for x in row["__v"]])
            nxt = cur.withColumn(
                "__mind", F.least(F.col("__mind"), l2_sq(F.col("__v"), new_vec))
            ).persist()
            prev, cur = cur, nxt
    finally:
        if prev is not None:
            prev.unpersist()
        cur.unpersist()
    return base.sparkSession.createDataFrame(
        centers, "center_rank int, vec_id long, radius double"
    )


def kcenter_invariant_violations(
    centers: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-9,
) -> DataFrame:
    """Violations of the greedy k-center contract for ``centers`` over
    ``emb``; EMPTY iff the selection is the true farthest-first
    traversal. Returns ``(center_rank, vec_id, reported, expected,
    violation)``.

    Checked:
    - ``greedy_argmax``: no corpus vector is farther from the first
      i−1 centers than center i's recorded radius (ties legal — the
      operator breaks them by id, which can only LOWER the witness's
      distance below ours, never exceed it);
    - ``radius_recompute``: each center's radius equals its min
      distance to the earlier centers, recomputed from raw vectors;
    - ``radius_monotone``: radii are non-increasing in rank (the
      textbook greedy invariant).

    Cost: one broadcast of the k centers (with vectors) against the
    corpus — k·n row-local distance evaluations, no shuffle beyond
    the final near-empty aggregation.
    """
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    cent = centers.join(
        v.select(
            F.col("vec_id").alias("__cid"), F.col("__v").alias("__cv")
        ),
        F.col("vec_id") == F.col("__cid"),
    ).select("center_rank", "vec_id", "radius", "__cv")

    # per corpus vector: min distance to centers of rank < i, for each i
    pairs = v.crossJoin(
        F.broadcast(
            cent.select(
                F.col("center_rank").alias("__cr"),
                F.col("vec_id").alias("__cid"),
                "__cv",
            )
        )
    ).select(
        "vec_id",
        "__cr",
        "__cid",
        F.sqrt(l2_sq(F.col("__v"), F.col("__cv"))).alias("__d"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("vec_id")
        .orderBy(F.col("__cr").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_prefix = pairs.withColumn("__dmin_before", F.min("__d").over(w))

    checked = with_prefix.join(
        F.broadcast(
            cent.select(
                F.col("center_rank").alias("__cr"),
                F.col("radius").alias("__r"),
            )
        ),
        "__cr",
    )
    greedy = checked.filter(
        (F.col("__cr") > 1)
        & (F.col("__dmin_before") > F.col("__r") + F.lit(tol))
    ).select(
        F.col("__cr").alias("center_rank"),
        "vec_id",
        F.col("__dmin_before").alias("reported"),
        F.col("__r").alias("expected"),
        F.lit("greedy_argmax").alias("violation"),
    )

    recompute = (
        checked.filter(
            (F.col("__cr") > 1) & (F.col("vec_id") == F.col("__cid"))
        )
        .filter(
            F.abs(F.col("__dmin_before") - F.col("__r")) > F.lit(tol)
        )
        .select(
            F.col("__cr").alias("center_rank"),
            "vec_id",
            F.col("__r").alias("reported"),
            F.col("__dmin_before").alias("expected"),
            F.lit("radius_recompute").alias("violation"),
        )
    )

    # windowless lag: rank self-join on the k-row centers frame (an
    # unpartitioned window here would drag the vector join's scan into
    # a single task — the plan-walk invariant rightly rejects that)
    prev = centers.select(
        (F.col("center_rank") + 1).alias("center_rank"),
        F.col("radius").alias("__prev"),
    )
    monotone = (
        centers.join(prev, "center_rank")
        .filter(
            (F.col("center_rank") > 2)
            & (F.col("radius") > F.col("__prev") + F.lit(tol))
        )
        .select(
            "center_rank",
            "vec_id",
            F.col("radius").alias("reported"),
            F.col("__prev").alias("expected"),
            F.lit("radius_monotone").alias("violation"),
        )
    )
    out = greedy.unionByName(recompute).unionByName(monotone)
    return out.select(
        F.col("center_rank").cast("int").alias("center_rank"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("reported").cast("double").alias("reported"),
        F.col("expected").cast("double").alias("expected"),
        F.col("violation").cast("string").alias("violation"),
    )
