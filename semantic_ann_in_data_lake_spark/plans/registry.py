"""Driver-facing query registry: every implemented operator as a
(spark_fn, oracle_sql) pair.

Each entry's Spark side composes operators from the package; the oracle
side is ANSI-ish SQL DuckDB runs on the same parquet views. Column
names/types are aligned on both sides because the driver's comparator
hashes values under sorted column names.

Cross-engine float discipline (applies to every entry):
- money aggregates accumulate in DECIMAL (exact), round, then cast to
  DOUBLE — parallel double summation is order-nondeterministic in BOTH
  engines, decimals are not;
- vector distances fold sequentially in array order (bit-identical),
  are rounded to 6 dp, and ranking windows order by the ROUNDED value
  with an id tie-break;
- integer-valued doubles (counts, exact-int sums) are safe unrounded.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.functions.vectors import (
    cosine_sim_sql,
    l2_sq_sql,
)
from semantic_ann_in_data_lake_spark.operators import profiler
from semantic_ann_in_data_lake_spark.operators.evaluation import (
    ndcg_at_k,
    pair_metrics_df,
    symmetric_truth,
)
from semantic_ann_in_data_lake_spark.operators.knn import knn_join, threshold_join
from semantic_ann_in_data_lake_spark.plans import pipeline

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql_or_None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from semantic_ann_in_data_lake_spark.sources.readers import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Profiling (reference SchemaExtraction — SURVEY §2.4 A1-A5, A11)
# ---------------------------------------------------------------------------

_PROFILE_TYPES = {
    "customer": [
        ("c_custkey", "integer"),
        ("c_name", "string"),
        ("c_nationkey", "integer"),
        ("c_acctbal", "float"),
        ("c_mktsegment", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "integer"),
        ("l_partkey", "integer"),
        ("l_suppkey", "integer"),
        ("l_linenumber", "integer"),
        ("l_quantity", "float"),
        ("l_extendedprice", "float"),
        ("l_discount", "float"),
        ("l_tax", "float"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "datetime"),
    ],
}


def _profile_oracle(table: str) -> str:
    parts = []
    for c, reftype in _PROFILE_TYPES[table]:
        parts.append(
            f"""
            SELECT '{table}' AS table_name, '{c}' AS column_name,
                   '{reftype}' AS col_type,
                   count(*) AS row_count,
                   count(*) - count({c}) AS n_nulls,
                   count({c}) AS num_values,
                   coalesce(min(length({c}::VARCHAR)), 0)::INT AS min_length,
                   coalesce(max(length({c}::VARCHAR)), 0)::INT AS max_length,
                   coalesce(round(avg(length({c}::VARCHAR)), 2), 0.0) AS avg_length
            FROM {table}"""
        )
    return " UNION ALL ".join(parts)


@register("profile_customer", _profile_oracle("customer"))
def profile_customer(spark, sf_dir):
    return profiler.profile(_t(spark, sf_dir, "customer"), "customer")


@register("profile_lineitem", _profile_oracle("lineitem"))
def profile_lineitem(spark, sf_dir):
    return profiler.profile(_t(spark, sf_dir, "lineitem"), "lineitem")


@register(
    "distinct_sample_orders",
    """
    SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name,
           list_slice(list_sort(list(DISTINCT o_orderstatus::VARCHAR)), 1, 30)
               AS values_sample
    FROM orders WHERE o_orderstatus IS NOT NULL
    UNION ALL
    SELECT 'orders', 'o_orderpriority',
           list_slice(list_sort(list(DISTINCT o_orderpriority::VARCHAR)), 1, 30)
    FROM orders WHERE o_orderpriority IS NOT NULL
    """,
)
def distinct_sample_orders(spark, sf_dir):
    return profiler.distinct_sample(
        _t(spark, sf_dir, "orders"), "orders", ["o_orderstatus", "o_orderpriority"], 30
    )


@register(
    "most_common_events",
    """
    WITH counted AS (
      SELECT event_type::VARCHAR AS value, count(*) AS cnt
      FROM events WHERE event_type IS NOT NULL GROUP BY 1
    ), ranked AS (
      SELECT value, cnt,
             row_number() OVER (ORDER BY cnt DESC, value ASC) AS rnk
      FROM counted
    )
    SELECT 'events' AS table_name, 'event_type' AS column_name,
           value, cnt, rnk::INT AS rank
    FROM ranked WHERE rnk <= 20
    """,
)
def most_common_events(spark, sf_dir):
    return profiler.most_common_values(
        _t(spark, sf_dir, "events"), "events", ["event_type"], 20
    )


_ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@register(
    "row_counts",
    " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS row_count FROM {t}"
        for t in _ALL_TABLES
    ),
)
def row_counts(spark, sf_dir):
    from functools import reduce

    parts = [
        _t(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("row_count")
        )
        for t in _ALL_TABLES
    ]
    return reduce(DataFrame.unionByName, parts)


# ---------------------------------------------------------------------------
# Relational aggregation / windows over the TPC-H-ish tables
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS sum_qty,
           round(sum(l_extendedprice::DECIMAL(18,2)), 2)::DOUBLE AS sum_base_price,
           round(sum(l_extendedprice::DECIMAL(18,2)
                     * (1 - l_discount::DECIMAL(18,2))), 2)::DOUBLE AS sum_disc_price,
           round(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*), 2) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "window_topk_orders",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rnk::INT AS rank
    FROM ranked WHERE rnk <= 3
    """,
)
def window_topk_orders(spark, sf_dir):
    """W2 generic form: per-group top-k via ranking window."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


# ---------------------------------------------------------------------------
# kNN similarity join (reference J6/V7-V9) + threshold + full evaluation
# ---------------------------------------------------------------------------

_KNN_L2_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({l2_sq_sql('q.v', 'c.v')}, 6) AS distance
      FROM e q, e c WHERE q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY distance ASC, cand_id ASC) AS rnk
      FROM pairs
    )
    SELECT query_id, cand_id, distance, rnk::INT AS rank
    FROM ranked WHERE rnk <= {{k}}
"""


@register("knn_exact_l2", _KNN_L2_SQL.format(k=5))
def knn_exact_l2(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, emb, k=5, strategy="exact")


@register("knn_broadcast_l2", _KNN_L2_SQL.format(k=5))
def knn_broadcast_l2(spark, sf_dir):
    """Strategy (b) must agree bit-for-bit with strategy (a) on exact
    metrics — same oracle as knn_exact_l2 proves it."""
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, emb, k=5, strategy="broadcast")


@register(
    "knn_topk_cosine",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({cosine_sim_sql('q.v', 'c.v')}, 6) AS distance
      FROM e q, e c WHERE q.vec_id <> c.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY distance DESC, cand_id ASC) AS rnk
      FROM pairs
    )
    SELECT query_id, cand_id, distance, rnk::INT AS rank
    FROM ranked WHERE rnk <= 10
    """,
)
def knn_topk_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb, emb, k=10, metric="cosine", strategy="exact")


_TAU = 1.3


@register(
    "ann_threshold_join",
    _KNN_L2_SQL.format(k=25) + f" AND sqrt(distance) <= {_TAU}",
)
def ann_threshold_join(spark, sf_dir):
    """P7: joinable pairs = kNN(k=25) where sqrt(L2²) ≤ τ
    (`join_discoverer.py:303-325`)."""
    emb = _t(spark, sf_dir, "embeddings")
    return threshold_join(knn_join(emb, emb, k=25, strategy="exact"), _TAU)


_EVAL_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             round({l2_sq_sql('q.v', 'c.v')}, 6) AS distance
      FROM e q, e c WHERE q.vec_id <> c.vec_id
    ),
    knn AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY distance ASC, cand_id ASC) AS rnk
        FROM pairs) WHERE rnk <= {{k}}
    ),
    joinable AS (SELECT * FROM knn WHERE sqrt(distance) <= {{tau}}),
    disc AS (
      SELECT DISTINCT least(query_id::VARCHAR, cand_id::VARCHAR) AS lo,
                      greatest(query_id::VARCHAR, cand_id::VARCHAR) AS hi
      FROM joinable
    ),
    truth AS (
      SELECT DISTINCT least(a.vec_id::VARCHAR, b.vec_id::VARCHAR) AS lo,
                      greatest(a.vec_id::VARCHAR, b.vec_id::VARCHAR) AS hi
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    conf AS (
      SELECT
        count(*) FILTER (WHERE d.lo IS NOT NULL AND t.lo IS NOT NULL) AS tp,
        count(*) FILTER (WHERE d.lo IS NOT NULL AND t.lo IS NULL) AS fp,
        count(*) FILTER (WHERE d.lo IS NULL AND t.lo IS NOT NULL) AS fn
      FROM disc d FULL OUTER JOIN truth t USING (lo, hi)
    ),
    sym AS (
      SELECT a.vec_id AS tq, b.vec_id AS tc
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT k.query_id, k.rnk,
             CASE WHEN s.tq IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM knn k LEFT JOIN sym s ON k.query_id = s.tq AND k.cand_id = s.tc
    ),
    dcg AS (
      SELECT query_id, sum(rel / log2(rnk + 1)) AS dcg
      FROM scored GROUP BY query_id
    ),
    nrel AS (SELECT tq AS query_id, count(*) AS n_rel FROM sym GROUP BY tq),
    ndcg AS (
      SELECT round(avg(CASE WHEN coalesce(n.n_rel, 0) > 0 THEN
        d.dcg / list_sum(list_transform(
          range(1, least({{k}}, n.n_rel) + 1), i -> 1.0 / log2(i + 1)))
        ELSE 0.0 END), 4) AS ndcg_at_k
      FROM dcg d LEFT JOIN nrel n USING (query_id)
    )
    SELECT {{k}} AS k, round(({{tau}})::DOUBLE, 2) AS tau, tp, fp, fn,
           round(tp / (tp + fp + 1e-8), 4) AS precision,
           round(tp / (tp + fn + 1e-8), 4) AS recall,
           round(2 * (tp / (tp + fp + 1e-8)) * (tp / (tp + fn + 1e-8))
                 / ((tp / (tp + fp + 1e-8)) + (tp / (tp + fn + 1e-8)) + 1e-8),
                 4) AS f1,
           ndcg_at_k
    FROM conf, ndcg
"""


@register("semlink_eval", _EVAL_SQL.format(k=10, tau=_TAU))
def semlink_eval(spark, sf_dir):
    """Flagship: the full discover+evaluate pipeline (reference §3.3)."""
    return pipeline.evaluate_discovery(spark, sf_dir, k=10, tau=_TAU, strategy="exact")


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Deduplication suite (training-data pipeline extensions — first-class)
# ---------------------------------------------------------------------------

from semantic_ann_in_data_lake_spark.functions.hashing import (  # noqa: E402
    portable_hash_expr,
)
from semantic_ann_in_data_lake_spark.functions.text import (  # noqa: E402
    normalize_sentence_sql,
    word_shingles_sql,
    words_sql,
)
from semantic_ann_in_data_lake_spark.operators import dedup, textstats  # noqa: E402

_SH = word_shingles_sql("text", 3)
_TOKS = words_sql("text")


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


def _minhash_sig_sql(n_hashes: int = 16) -> str:
    sig = ", ".join(
        f"list_min(list_transform(sh, s -> {portable_hash_expr('s', seed=f'{i}:')}))"
        for i in range(n_hashes)
    )
    return f"""
    WITH s AS (SELECT doc_id, {_SH} AS sh FROM documents)
    SELECT doc_id, sh AS shingles, [{sig}] AS minhash
    FROM s WHERE len(sh) > 0
    """


@register("minhash_signatures", _minhash_sig_sql(16))
def minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_t(spark, sf_dir, "documents"))


def _minhash_lsh_sql(bands: int = 8, r: int = 2, threshold: float = 0.01) -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"minhash[{b * r + 1}]::VARCHAR || '|' || minhash[{b * r + 2}]::VARCHAR AS band_key, sh "
        f"FROM sigs"
        for b in range(bands)
    )
    return f"""
    WITH s AS (SELECT doc_id, {_SH} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, sh,
             {_minhash_sig_inner(16)} AS minhash
      FROM s WHERE len(sh) > 0
    ),
    banded AS ({band_selects}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id_a, c.id_b,
             round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                   / greatest(len(sa.sh) + len(sb.sh)
                              - len(list_intersect(sa.sh, sb.sh)), 1), 6) AS jaccard
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.id_a
      JOIN sigs sb ON sb.doc_id = c.id_b
    )
    SELECT * FROM verified WHERE jaccard >= {threshold}
    """


def _minhash_sig_inner(n_hashes: int) -> str:
    sig = ", ".join(
        f"list_min(list_transform(sh, s -> {portable_hash_expr('s', seed=f'{i}:')}))"
        for i in range(n_hashes)
    )
    return f"[{sig}]"


@register("minhash_lsh_pairs", _minhash_lsh_sql(8, 2, 0.01))
def minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_near_dups(
        _t(spark, sf_dir, "documents"),
        num_hashes=16, bands=8, rows_per_band=2, threshold=0.01,
    )


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH s AS (SELECT doc_id, {_SH} AS sh FROM documents),
    nz AS (SELECT * FROM s WHERE len(sh) > 0),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.sh, b.sh))::DOUBLE
                   / greatest(len(a.sh) + len(b.sh)
                              - len(list_intersect(a.sh, b.sh)), 1), 6) AS jaccard
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    )
    SELECT * FROM pairs WHERE jaccard >= 0.02
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.02)


def _simhash_sql(bits: int = 32) -> str:
    code_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, "
        f"h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {2 ** b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(bits)
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    h AS (
      SELECT doc_id, len(toks) AS n_tokens,
             list_transform(toks, tk -> {portable_hash_expr('tk')}) AS hs
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, n_tokens, {code_terms} AS simhash FROM h
    """


@register("simhash_codes", _simhash_sql(32))
def simhash_codes(spark, sf_dir):
    return dedup.simhash(_t(spark, sf_dir, "documents"), bits=32)


@register(
    "embedding_dup_pairs",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({cosine_sim_sql('a.v', 'b.v')}, 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round({cosine_sim_sql('a.v', 'b.v')}, 6) >= 0.3
    """,
)
def embedding_dup_pairs(spark, sf_dir):
    return dedup.embedding_near_dups(_t(spark, sf_dir, "embeddings"), tau=0.3)


# ---------------------------------------------------------------------------
# Text analysis suite
# ---------------------------------------------------------------------------

_STOP_IN = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)


@register(
    "doc_token_stats",
    f"""
    WITH t AS (
      SELECT doc_id, length(text)::INT AS n_chars,
             {_TOKS} AS toks, {normalize_sentence_sql('text')} AS norm
      FROM documents
    ), m AS (
      SELECT doc_id, n_chars,
             len(toks)::INT AS n_tokens,
             len(list_distinct(toks))::INT AS n_distinct_tokens,
             greatest(len(toks), 1) AS safe_tok,
             greatest(length(norm), 1) AS safe_chr,
             len(list_filter(toks, tk -> tk IN ({_STOP_IN}))) AS stop_hits,
             length(norm) AS norm_len,
             length(norm) - length(regexp_replace(norm, '[.,!?;:]', '', 'g')) AS punct_chars,
             length(norm) - length(regexp_replace(norm, '[0-9]', '', 'g')) AS digit_chars
      FROM t
    )
    SELECT doc_id, n_chars, n_tokens, n_distinct_tokens,
           round((norm_len - n_tokens + 1)::DOUBLE / safe_tok + 1e-9, 4) AS avg_token_len,
           round(stop_hits::DOUBLE / safe_tok + 1e-9, 4) AS stopword_ratio,
           round(punct_chars::DOUBLE / safe_chr + 1e-9, 4) AS punct_ratio,
           round(digit_chars::DOUBLE / safe_chr + 1e-9, 4) AS digit_ratio,
           round(n_distinct_tokens::DOUBLE / safe_tok + 1e-9, 4) AS type_token_ratio,
           round(0.4 * least(n_tokens::DOUBLE / 100.0, 1.0)
                 + 0.3 * round(n_distinct_tokens::DOUBLE / safe_tok + 1e-9, 4)
                 + 0.3 * round(stop_hits::DOUBLE / safe_tok + 1e-9, 4) + 1e-9, 4) AS quality_score
    FROM m
    """,
)
def doc_token_stats(spark, sf_dir):
    return textstats.token_stats(_t(spark, sf_dir, "documents"))


def _lang_id_sql() -> str:
    score_cols = ", ".join(
        f"len(list_filter(toks, tk -> tk IN ({', '.join(chr(39) + w + chr(39) for w in ws)}))) AS s_{lang}"
        for lang, ws in textstats.LANG_MARKERS.items()
    )
    langs = list(textstats.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{lang} > 0 AND s_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, greatest(len(toks), 1) AS n_tokens, {score_cols} FROM t)
    SELECT doc_id, {pred} AS lang_pred,
           round({best}::DOUBLE / n_tokens + 1e-9, 4) AS lang_score
    FROM s
    """


@register("lang_id", _lang_id_sql())
def lang_id(spark, sf_dir):
    return textstats.lang_id(_t(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    f"""
    WITH s AS (SELECT doc_id, {normalize_sentence_sql('text')} AS norm,
                      {_SH} AS sh FROM documents)
    SELECT doc_id, md5(norm) AS fp_md5,
           list_min(list_transform(sh, s -> {portable_hash_expr('s', seed='fp:')}))
               AS fp_minshingle
    FROM s
    """,
)
def doc_fingerprints(spark, sf_dir):
    return textstats.fingerprints(_t(spark, sf_dir, "documents"))
