"""Training-pair construction + splits (reference DeepJoin pairsBuilder).

- J7: positive pairs = all i<j combinations of columns sharing a
  family/header (``pairsBuilder.py:85-92``) → self-join with an
  inequality predicate inside the family group.
- J8: ground-truth-driven pairs = two lookup joins attaching each
  side's serialized text (``pairsBuilder.py:94-115``).
- W6: train/test split. The reference splits positionally after a
  seeded shuffle (``pairsBuilder.py:131-145``, ratio 0.8 seed 42) —
  order-dependent, so the distributed version uses a deterministic
  content-hash split (same ratio in expectation, reproducible on any
  cluster layout; divergence documented per SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64


def positive_pairs(
    items: DataFrame, family_col: str, id_col: str
) -> DataFrame:
    """All unordered i<j pairs within each family group.

    Equi-join on the family key + inequality on ids: Catalyst plans the
    equi part as a hash join (shuffle by family), so cost is
    Σ_family |group|² — not |table|².
    """
    a = items.select(
        F.col(family_col).alias("family"), F.col(id_col).alias("id_a")
    )
    b = items.select(
        F.col(family_col).alias("family"), F.col(id_col).alias("id_b")
    )
    return a.join(b, ["family"]).where(F.col("id_a") < F.col("id_b")).select(
        "family", "id_a", "id_b"
    )


def pairs_from_ground_truth(
    gt: DataFrame, meta: DataFrame, text_col: str = "serialized"
) -> DataFrame:
    """J8: for each GT row, attach both sides' serialized text via two
    broadcast lookup joins; misses fall back to the raw column name
    (``pairsBuilder.py:98-114`` left-join-with-default semantics)."""
    mq = meta.select(
        F.col("table_name").alias("q_m_table"),
        F.col("column_name").alias("q_m_column"),
        F.col(text_col).alias("q_m_text"),
    )
    mc = meta.select(
        F.col("table_name").alias("c_m_table"),
        F.col("column_name").alias("c_m_column"),
        F.col(text_col).alias("c_m_text"),
    )
    q = gt.join(
        F.broadcast(mq),
        (gt.query_table == mq.q_m_table) & (gt.query_column == mq.q_m_column),
        "left",
    ).select(gt["*"], F.coalesce(mq.q_m_text, gt.query_column).alias("text_a"))
    c = q.join(
        F.broadcast(mc),
        (q.candidate_table == mc.c_m_table) & (q.candidate_column == mc.c_m_column),
        "left",
    ).select(q["*"], F.coalesce(mc.c_m_text, q.candidate_column).alias("text_b"))
    return c.select("query_table", "query_column", "candidate_table",
                    "candidate_column", "text_a", "text_b")


def train_test_split(
    pairs: DataFrame,
    key_cols: list[str],
    train_ratio: float = 0.8,
    seed: str = "split42",
) -> DataFrame:
    """Deterministic content-hash split: ``split`` column ∈
    {train, test}. Reproducible regardless of partitioning — the
    distributed replacement for the reference's positional split."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    bucket = F.pmod(portable_hash64(key, seed=seed), F.lit(1000))
    return pairs.withColumn(
        "split",
        F.when(bucket < int(train_ratio * 1000), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
    seed: str = "strat42:",
) -> DataFrame:
    """Deterministic per-group quota sample: the first ``n_per_group``
    rows of each group in seeded-hash order (engine-portable 'random' —
    same discipline as the W5 sample; see SURVEY §7.4.3).

    One ranking window partitioned by the group — no driver-side group
    enumeration, so it scales to millions of strata; per-group data
    stays on its shuffle partition. The classic training-data use:
    per-language / per-source quotas when balancing a corpus.
    """
    hk = portable_hash64(F.col(id_col).cast("string"), seed=seed)
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy("__hk", id_col)
    return (
        df.withColumn("__hk", hk)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_group)
        .drop("__hk")
    )


def mix_sample(
    df,
    fractions: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix42:",
):
    """Weighted data mixing: per-group deterministic Bernoulli sampling.

    The pretraining-mix primitive: given target keep-fractions per
    source (e.g. {'web': 0.1, 'code': 1.0}), keep a row iff
    ``portable_hash(id) mod 1e6 < frac·1e6`` for its group. Groups
    absent from ``fractions`` are dropped (fraction 0).

    Scale properties: a pure row-local filter — no shuffle, no group
    counts, no driver state; selectivity is stable under repartition,
    retries, and incremental runs (the hash, not position, decides), so
    the same row set is kept on every engine and every execution. This
    is what quota/window sampling (:func:`stratified_sample`) cannot do
    without a per-group count or sort at 100 TB.
    """
    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64

    M = 1_000_000
    hk = portable_hash64(F.col(id_col).cast("string"), seed=seed) % M
    thresh = F.lit(0)
    for g, frac in sorted(fractions.items()):
        thresh = F.when(F.col(group_col) == g, F.lit(int(round(frac * M)))).otherwise(
            thresh
        )
    return df.where(hk < thresh)


def upsert_latest(
    target,
    updates,
    keys: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
):
    """Batch MERGE/upsert: one row per key — the highest ``version_col``
    across target ∪ updates. Version ties resolve deterministically:
    updates beat target (MERGE "WHEN MATCHED UPDATE" semantics), then
    ``tiebreak_col`` desc when given. A key column is NOT a valid
    tiebreak (constant within its own partition — would leave ties to
    partition order), so passing one raises. Duplicate (key, version)
    rows WITHIN ``updates`` remain ambiguous — pass a genuinely
    distinguishing ``tiebreak_col`` (ingest ordinal, source file) if
    your update feed can contain them.

    The plain-parquet form of Delta/Iceberg MERGE INTO for
    full-snapshot maintenance: a union plus ONE window over the key
    partition (single shuffle on the keys), no join — at 100 TB this is
    the same cost as the dedup it generalizes. Pairs with
    streaming.incremental_rollup_foreach_batch for the incremental
    partition-local variant.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if tiebreak_col in keys:
        raise ValueError(
            f"tiebreak_col {tiebreak_col!r} is a key column — constant within "
            "every key partition, so it cannot break version ties"
        )
    u = target.withColumn("__origin", F.lit(0)).unionByName(
        updates.withColumn("__origin", F.lit(1))
    )
    order = [F.col(version_col).desc(), F.col("__origin").desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__origin")
    )


def cap_per_key(
    df,
    key: str,
    n: int,
    order_col: str | None = None,
    descending: bool = False,
):
    """Keep at most ``n`` rows per key — the per-domain/per-source cap a
    corpus-balancing pipeline applies so no single source dominates.

    Deterministic: rows rank by ``order_col`` (default: the key-local
    natural column must be supplied; ties are impossible when order_col
    is unique). Plans as row_number over a PARTITIONED window with the
    rank<=n filter pushed to WindowGroupLimit — per-partition pre-limit
    before the exchange, no global sort, no skew funnel.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if order_col is None:
        raise ValueError("cap_per_key needs an explicit order_col")
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(key).orderBy(oc)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    seed: str = "wsample:",
) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis–
    Spirakis A-ES): rank every row by ``-ln(u)/w`` where ``u`` is a
    per-row uniform derived from the PORTABLE hash of its id, keep the
    k smallest. Inclusion probability scales with weight; the "random"
    stream is the hash, so the sample is reproducible cross-engine and
    insensitive to partitioning (same discipline as
    ``train_test_split`` / ``deterministic_sample``).

    The A-ES key is rounded to 6 dp (with the repo's rounding bias) and
    tie-broken by id before the top-k, so the one libm step (ln) cannot
    leave engine-dependent orderings. Executes as TakeOrderedAndProject
    — a distributed per-partition top-k plus a k-row driver merge; no
    global sort materializes.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    P = 1_000_000_007
    h = portable_hash64(F.col(id_col).cast("string"), seed=seed)
    # u in (0, 1]: +1 keeps ln defined at the modulus' zero residue
    u = ((F.pmod(h, F.lit(P)) + 1) / F.lit(float(P + 1))).cast("double")
    w = F.col(weight_col).cast("double")
    key = F.round(-F.log(u) / w + F.lit(1e-9), 6)
    return (
        df.where(w > 0)
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def scd2_history(
    events: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log:
    collapse each key's consecutive runs of the same state into
    versioned validity intervals ``(key, state, valid_from, valid_to,
    version, n_events)``; the current version has ``valid_to = NULL``.

    The lakehouse CDC primitive ``upsert_latest`` discards history for;
    this keeps it. Two windows and one aggregation, all partitioned by
    the key — shuffle cost is one exchange on ``key_col`` end to end
    (the run-length encoding is the gaps-and-islands trick, same shape
    as the sessionizer)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    marked = events.select(
        key_col, state_col, ts_col, tiebreak_col
    ).withColumn(
        "__chg",
        F.when(
            # null-SAFE inequality: lag != col is NULL when either
            # side is NULL, so a NULL state (and the transitions around
            # it) would be silently absorbed into the previous run; a
            # first-row NULL state must still open version 1
            (F.row_number().over(w) == 1)
            | ~F.lag(state_col).over(w).eqNullSafe(F.col(state_col)),
            1,
        ).otherwise(0),
    )
    versioned = marked.withColumn(
        "version",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    runs = versioned.groupBy(key_col, "version").agg(
        F.first(state_col).alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_v = Window.partitionBy(key_col).orderBy(F.col("version").asc())
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(w_v)
    ).select(key_col, "state", "valid_from", "valid_to", "version", "n_events")


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    train_buckets: int = 8,
    valid_buckets: int = 1,
    n_buckets: int = 10,
    seed: str = "",
) -> DataFrame:
    """Train/valid/test split that can NEVER leak near-duplicates
    across splits: the split is a pure function of the DEDUP CLUSTER,
    so every member of a near-dup cluster lands in the same split — a
    per-document split contaminates eval whenever train and test hold
    two copies of the same boilerplate (the standard web-corpus
    failure; cf. deduplication-improves-LMs, Lee et al. 2022).

    ``clusters`` is ``(doc_id, cluster_id)`` from
    ``dedup.dedup_clusters`` (docs with no near-dup edge are absent
    there and form singleton clusters of themselves). Split =
    bucketed portable hash of the EFFECTIVE cluster id — deterministic
    across runs and partitionings, re-dealable via ``seed``.

    Returns docs + ``(cluster_id, split)``. Cost: one left join
    against the cluster table (|near-dup docs|-sized, usually a small
    fraction of the corpus) and a hash — no extra shuffle beyond the
    join.
    """
    if not (0 < train_buckets and 0 <= valid_buckets
            and train_buckets + valid_buckets < n_buckets):
        raise ValueError("buckets must satisfy train + valid < total")
    from semantic_ann_in_data_lake_spark.functions.hashing import (
        portable_hash64,
    )

    c = clusters.select(
        F.col(clusters.columns[0]).alias(id_col),
        F.col(clusters.columns[1]).alias("cluster_id"),
    )
    # plain keyed join — the cluster table is |near-dup docs|-sized,
    # often broadcastable but not guaranteed; AQE picks the strategy
    out = docs.join(c, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    b = F.pmod(
        portable_hash64(
            F.col("cluster_id").cast("string"), seed=f"split{seed}:"
        ),
        F.lit(n_buckets),
    )
    split = (
        F.when(b < train_buckets, "train")
        .when(b < train_buckets + valid_buckets, "valid")
        .otherwise("test")
    )
    return out.withColumn("split", split)
