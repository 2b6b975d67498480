"""Skew mitigation helpers.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our session factory) handles most skew at runtime; explicit salting
remains necessary when (a) AQE is off/unavailable, (b) the skew is in
an AGGREGATION rather than a join, or (c) one key dominates so hard
that even split partitions overwhelm a task.

``salted_join`` here is the BLANKET tier: every big-side row gets a
salt and the whole small side replicates ``n_salts``× — right when the
small side is tiny and skew is pervasive. For power-law skew where a
handful of keys dominate, use ``operators.joins.salted_join`` instead:
it detects (or takes) a hot-key list and salts ONLY those keys, so the
build side replicates just its hot rows; ``operators.joins.band_join``
covers the related |a−b| ≤ eps proximity-join shape. Results of all
tiers are row-identical to the plain join (proven by tests).

``two_stage_agg`` pre-aggregates per (key, salt) before the final
per-key combine — the manual form of partial aggregation for aggregates
Catalyst can't combine map-side (e.g. exact distinct lists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered over n_salts.

    The big side gets a random-ish (hash-derived, deterministic) salt;
    the small side is exploded n_salts× so every (key, salt) pair can
    match. Output columns = big ∪ small minus the duplicate key/salt.

    Only big-side-preserving modes are valid: for right/full joins an
    unmatched SMALL row would surface once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}"
        )
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    # mix a row ordinal into the salt (the joins.py discipline):
    # content-only hashing sends identical duplicate rows — the
    # boilerplate-heavy hot-key reality salting targets — to ONE salt
    # bucket, re-creating the skew; persist so retries replay the same
    # assignment (salt choice never changes OUTPUT rows, only their
    # distribution)
    big_s = scoped_persist(
        big.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(
                    F.monotonically_increasing_id(),
                    *[F.col(c) for c in big.columns],
                    F.lit(42),
                ),
                F.lit(n_salts),
            ).cast("int"),
        )
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    combine_exprs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Salted two-stage aggregation: groupBy(key, salt) with
    ``agg_exprs``, then groupBy(key) with ``combine_exprs`` over the
    partials. Caller supplies the decomposition (sum→sum of sums,
    count→sum of counts, …)."""
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    # row-ordinal-mixed salt: identical duplicate rows of a hot key
    # must scatter across salts (see salted_join above). Persisted for
    # the same reason as salted_join: monotonically_increasing_id is
    # nondeterministic, and a fetch-failure retry recomputing a
    # DIFFERENT assignment mid-shuffle could double/miss rows across
    # partials.
    salted = scoped_persist(df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(
                F.monotonically_increasing_id(),
                *[F.col(c) for c in df.columns],
                F.lit(7),
            ),
            F.lit(n_salts),
        ).cast("int"),
    ))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(name) for name, c in agg_exprs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[c.alias(name) for name, c in combine_exprs.items()]
    )
