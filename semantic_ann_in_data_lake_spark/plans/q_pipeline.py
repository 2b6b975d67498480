"""Annotation, corruption, sampling, serialization, source/sink gates.

Split from the single-file registry (round 4); the hub
`plans.registry` imports this module for its registration side
effects and re-exports every query function.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.plans.registry import register, _t

from semantic_ann_in_data_lake_spark.annotate.annotator import (
    annotate_tables, snake_case_sql,
)
from semantic_ann_in_data_lake_spark.annotate.corruption import (
    corrupt_charnoise, corrupt_positional, corrupt_swap,
)
from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash_expr
from semantic_ann_in_data_lake_spark.functions.dates import (
    normalize_date, normalize_date_sql,
)
from semantic_ann_in_data_lake_spark.functions.serialize import (
    column_to_text, column_to_text_sql,
)
from semantic_ann_in_data_lake_spark.operators import pairs as pairs_ops
from semantic_ann_in_data_lake_spark.operators import profiler
from semantic_ann_in_data_lake_spark.plans.q_profile import _PROFILE_TYPES


# ---------------------------------------------------------------------------
# Date normalization (F7), serialization (V1), corruption (C1), splits (W6),
# hash embeddings (V4 deterministic tier), streaming rollup (batch twin)
# ---------------------------------------------------------------------------


@register(
    "date_normalize_orders",
    f"""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
               WHEN 2 THEN strftime(o_orderdate, '%Y%m%d')
               ELSE year(o_orderdate)::VARCHAR || '-Q' || quarter(o_orderdate)::VARCHAR
             END AS raw_date
      FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT o_orderkey, raw_date,
           {normalize_date_sql('raw_date')} AS normalized
    FROM raw
    """,
)
def date_normalize_orders(spark, sf_dir):
    """F7: multi-format date normalization round-trip — strings in 4
    formats (incl. the reference's quarter form) → 'dd MMMM yyyy'."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "yyyyMMdd"))
        .otherwise(
            F.concat(
                F.year("o_orderdate").cast("string"),
                F.lit("-Q"),
                F.quarter("o_orderdate").cast("string"),
            )
        )
    )
    d = o.select("o_orderkey", raw.alias("raw_date"))
    return d.select(
        "o_orderkey", "raw_date", normalize_date("raw_date").alias("normalized")
    )


_CUSTOMER_COLS = [c for c, _ in _PROFILE_TYPES["customer"]]


@register(
    "column_to_text_customer",
    " UNION ALL ".join(
        f"""
        SELECT 'customer' AS table_name, '{c}' AS column_name,
               {column_to_text_sql(
                   f"'{c}'",
                   f"count({c})",
                   f"coalesce(min(length({c}::VARCHAR)), 0)::INT",
                   f"coalesce(max(length({c}::VARCHAR)), 0)::INT",
                   f"coalesce(round(avg(length({c}::VARCHAR)), 2), 0.0)",
                   f"(SELECT list_slice(list_sort(list(DISTINCT {c}::VARCHAR)), 1, 5)"
                   f" FROM customer WHERE {c} IS NOT NULL)",
                   title="'customer'",
               )} AS serialized
        FROM customer"""
        for c in _CUSTOMER_COLS
    ),
)
def column_to_text_customer(spark, sf_dir):
    """V1: serialize each customer column profile to the DeepJoin
    sentence form (`repositoryLoader.py:139-180`)."""
    cust = _t(spark, sf_dir, "customer")
    prof = profiler.profile(cust, "customer")
    samples = profiler.distinct_sample(cust, "customer", _CUSTOMER_COLS, 5)
    joined = prof.join(samples, ["table_name", "column_name"])
    return joined.select(
        "table_name",
        "column_name",
        column_to_text(
            F.col("column_name"),
            F.col("num_values"),
            F.col("min_length"),
            F.col("max_length"),
            F.col("avg_length"),
            F.col("values_sample"),
            title=F.col("table_name"),
        ).alias("serialized"),
    )


@register(
    "corrupt1_positional",
    f"""
    WITH cols AS (
      SELECT unnest([{', '.join(f"'{c}'" for c in _CUSTOMER_COLS)}]) AS column_name
    ), ranked AS (
      SELECT column_name,
             row_number() OVER (
               ORDER BY ('0x' || substr(md5('c1' || column_name), 1, 15))::BIGINT
             ) AS rnk
      FROM cols
    )
    SELECT 'customer' AS table_name, column_name,
           'attribiute_' || (rnk - 1)::VARCHAR AS new_name
    FROM ranked
    """,
)
def corrupt1_positional(spark, sf_dir):
    """C1: hash-permuted positional rename (typo 'attribiute' is
    reference behavior, `corruption.py:29`)."""
    return corrupt_positional(spark, "customer", _CUSTOMER_COLS, seed="c1")


@register(
    "train_test_split_pairs",
    """
    WITH pairs AS (
      SELECT a.s_nationkey AS family, a.s_suppkey AS id_a, b.s_suppkey AS id_b
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    )
    SELECT family, id_a, id_b,
           CASE WHEN ('0x' || substr(md5('split42' || id_a::VARCHAR || '|' || id_b::VARCHAR), 1, 15))::BIGINT % 1000 < 800
                THEN 'train' ELSE 'test' END AS split
    FROM pairs
    """,
)
def train_test_split_pairs(spark, sf_dir):
    """W6: deterministic content-hash 80/20 split (distributed
    replacement for the positional split, `pairsBuilder.py:131-145`)."""
    s = _t(spark, sf_dir, "supplier")
    p = pairs_ops.positive_pairs(s, "s_nationkey", "s_suppkey")
    return pairs_ops.train_test_split(p, ["id_a", "id_b"], 0.8, seed="split42")


#: deliberately messy header fixture for the annotation stage (the sf
#: tables are already snake_case; cleaning needs something to clean)
_MESSY_COLS = ["Order Key", "Total-Price", "Cust  Name", "ship_date", "N°Items"]


@register(
    "annotate_columns_rule",
    f"""
    WITH cols AS (
      SELECT unnest([{', '.join(f"'{c}'" for c in _MESSY_COLS)}]) AS column_name
    )
    SELECT 'messy_orders' AS table_name, column_name,
           {snake_case_sql('column_name')} AS annotated_name
    FROM cols
    """,
)
def annotate_columns_rule(spark, sf_dir):
    """The mapInPandas annotation stage (retry/validation plumbing
    included) checked against its pure-SQL semantic: snake_case
    cleaning of messy headers."""
    catalog = spark.createDataFrame(
        [("messy_orders", _MESSY_COLS, "")],
        "table_name string, columns array<string>, sample_markdown string",
    )
    ann = annotate_tables(catalog)
    return (
        ann.select("table_name", F.explode("columns").alias("column_name", "annotated_name"))
    )


@register(
    "media_resize_plan",
    """
    WITH mm AS (
      SELECT doc_id AS media_id,
             (doc_id % 1024 + 32)::INT AS width,
             ((doc_id * 7) % 1024 + 32)::INT AS height
      FROM documents
    )
    SELECT media_id, width, height,
           CASE WHEN greatest(width, height) > 128
                THEN greatest((width * 128) // greatest(width, height), 1)
                ELSE width END::INT AS new_width,
           CASE WHEN greatest(width, height) > 128
                THEN greatest((height * 128) // greatest(width, height), 1)
                ELSE height END::INT AS new_height,
           greatest(width, height) > 128 AS resized
    FROM mm
    """,
)
def media_resize_plan(spark, sf_dir):
    """Multimodal resize PLAN (the third leg of the decode /
    feature-extract / resize / frame-sample plumbing): aspect-preserving
    clamp of the longer side to 128, computed as pure integer column
    math over the typed metadata — payload bytes are never touched at
    plan time, so at 100 TB the geometry decision costs a metadata
    column scan and the (stubbed) pixel resample in ``resize_images``
    decodes each payload at most once. The oracle reproduces the
    synthesized fixture dims and the same ``div`` math exactly."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        resize_plan,
        synthesize_media_from_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    return resize_plan(synthesize_media_from_documents(docs), max_side=128)


@register(
    "media_audio_windows",
    """
    WITH a AS (
      SELECT doc_id AS media_id, (n_chars * 10)::BIGINT AS dur
      FROM documents
      WHERE n_chars * 10 >= 400
    )
    SELECT media_id,
           (s // 200)::INT AS window_idx,
           s::BIGINT AS start_ms,
           (s + 400)::BIGINT AS end_ms
    FROM (SELECT media_id, unnest(range(0, dur - 400 + 1, 200)) AS s FROM a)
    """,
)
def media_audio_windows(spark, sf_dir):
    """Audio segmentation plan (the audio leg of the multimodal
    plumbing, operators/multimodal.py::audio_window_plan): 400 ms
    windows every 200 ms over the metadata duration, full windows only
    — posexplode(sequence(...)) integer math, no payload bytes at plan
    time. The synthesized durations derive from ``n_chars`` so the
    DuckDB oracle reproduces the framing (range is end-exclusive, hence
    ``dur - 400 + 1``) and window_idx (= start // hop) exactly."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        audio_window_plan,
        synthesize_audio_from_documents,
    )

    media = synthesize_audio_from_documents(_t(spark, sf_dir, "documents"))
    return audio_window_plan(media, window_ms=400, hop_ms=200)


@register(
    "media_features",
    """
    SELECT doc_id AS media_id, 'image' AS modality,
           array_to_string(
             list_transform(range(0, 8),
               i -> (('0x' || substr(md5(i::VARCHAR || ':' || text), 1, 15))::BIGINT
                     % 200001)::VARCHAR),
             '|') AS feature
    FROM documents
    """,
)
def media_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads → mapInPandas feature
    extraction. The DECODE is the deterministic md5-projection fake
    (real decode stubbed per environment policy), which makes even this
    Python-stage operator oracle-gateable: DuckDB reproduces the
    md5-chunk integers exactly, so the gate pins the full plumbing —
    binary encode, Arrow batching, float32 array schema — end to end.

    The float32 feature vector is serialized via the integer round-trip
    (component = k/1e5 - 1; float32 error ≪ 0.5 so round recovers k)
    because the driver canonicalizer cannot hash list cells."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        extract_features,
        synthesize_media_from_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media_from_documents(docs), dim=8)
    return feats.select(
        "media_id",
        "modality",
        F.array_join(
            F.transform(
                "feature",
                lambda x: F.round(
                    (x.cast("double") + F.lit(1.0)) * F.lit(100000.0)
                )
                .cast("long")
                .cast("string"),
            ),
            "|",
        ).alias("feature"),
    )


#: expected greedy-canonicalization result, derived BY HAND from the
#: documented Y2 semantics (first-seen in sorted term order expands
#: through DEFAULT_SYNONYMS): sorted terms are visited in order, so
#: "cost" claims "price", "id" claims "identifier"/"key", "label"
#: claims "name" (before "name" and "title" are visited) — the literal
#: table is an independently-derived oracle, not an engine echo.
_SYNONYM_EXPECTED = [
    ("c_acctbal", "c_acctbal"), ("c_custkey", "c_custkey"),
    ("c_mktsegment", "c_mktsegment"), ("c_name", "c_name"),
    ("c_nationkey", "c_nationkey"), ("cost", "cost"), ("id", "id"),
    ("identifier", "id"), ("label", "label"), ("name", "label"),
    ("price", "cost"), ("title", "title"),
]


@register(
    "synonym_canonical_terms",
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{t}', '{c}')" for t, c in _SYNONYM_EXPECTED)
    + ") AS v(term, term_canonical)",
)
def synonym_canonical_terms(spark, sf_dir):
    """Y1-Y4: greedy first-seen synonym canonicalization (inherently
    sequential driver loop over the small distinct-term set) applied to
    annotated column names. The term set mixes real customer columns
    with dictionary synonyms so the canonical map actually remaps
    (identifier→id, name→label, price→cost under sorted first-seen
    order); gated against the hand-derived literal expectation."""
    from semantic_ann_in_data_lake_spark.annotate.synonyms import apply_canonical_map

    cust = _t(spark, sf_dir, "customer")
    extra = ["identifier", "title", "cost", "id", "name", "price", "label"]
    terms = spark.createDataFrame(
        [(c,) for c in cust.columns] + [(t,) for t in extra], "term string"
    )
    return apply_canonical_map(terms, "term", spark)


@register(
    "deterministic_sample_docs",
    f"""
    WITH h AS (
      SELECT doc_id,
             {portable_hash_expr("doc_id::VARCHAR", seed="sample42:")} AS hk
      FROM documents
    ), top AS (
      SELECT doc_id, hk FROM h ORDER BY hk, doc_id LIMIT 10
    )
    SELECT doc_id, row_number() OVER (ORDER BY hk, doc_id)::INT AS sample_rank
    FROM top
    """,
)
def deterministic_sample_docs(spark, sf_dir):
    """W5 engine-portable variant: seeded 'random' sample as hash-order
    top-n (the reference's pandas seed-42 sample is not reproducible
    cross-engine; hash order is — divergence per SURVEY §7.4.3)."""
    from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash64

    d = _t(spark, sf_dir, "documents")
    hk = portable_hash64(F.col("doc_id").cast("string"), seed="sample42:")
    top = (
        d.select("doc_id", hk.alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(10)
    )
    w = Window.orderBy("hk", "doc_id")
    return top.withColumn("sample_rank", F.row_number().over(w)).select(
        "doc_id", "sample_rank"
    )


_CUST_COLS_SQL = ", ".join(f"'{c}'" for c in _CUSTOMER_COLS)


@register(
    "corrupt2_charnoise",
    f"""
    WITH cols AS (SELECT unnest([{_CUST_COLS_SQL}]) AS column_name),
    h AS (
      SELECT column_name,
             ('0x' || substr(md5('c2' || column_name), 1, 15))::BIGINT AS hk
      FROM cols
    )
    SELECT 'customer' AS table_name, column_name,
           CASE WHEN hk % 100 < 65 AND length(column_name) > 1
                THEN substr(column_name, 1, (hk % length(column_name))::INT)
                     || substr(column_name, (hk % length(column_name))::INT + 2)
                ELSE column_name END AS new_name
    FROM h
    """,
)
def corrupt2_charnoise(spark, sf_dir):
    """C2: deterministic char-drop noise (65% of hash draws), the
    nlpaug-free regime (`corruption.py:5-11,31-34`)."""
    return corrupt_charnoise(spark, "customer", _CUSTOMER_COLS, seed="c2")


@register(
    "corrupt3_swap",
    f"""
    WITH cols AS (SELECT unnest([{_CUST_COLS_SQL}]) AS column_name),
    ranked AS (
      SELECT column_name,
             row_number() OVER (
               ORDER BY ('0x' || substr(md5('c3' || column_name), 1, 15))::BIGINT
             ) AS rnk
      FROM cols
    )
    SELECT 'customer' AS table_name, a.column_name,
           b.column_name AS new_name
    FROM ranked a JOIN ranked b
      ON (a.rnk % {len(_CUSTOMER_COLS)}) + 1 = b.rnk
    """,
)
def corrupt3_swap(spark, sf_dir):
    """C3: swapped-name regime — every column takes the next column's
    name in hash order (`corruption.py:17,35` made deterministic)."""
    return corrupt_swap(spark, "customer", _CUSTOMER_COLS, seed="c3")


# --- source/sink gates: fixtures under /tmp (testdata is read-only) ---

_CSV_FIXTURE = "/tmp/sals_gate/csv_src"


_JSONL_RT = "/tmp/sals_gate/jsonl_rt"


_CSV_RT = "/tmp/sals_gate/csv_rt"


def _gen_csv_fixture(sf_dir: str) -> None:
    """Deterministically derive a 2-file CSV dir from the sf_dir customer
    parquet (DuckDB COPY → exact file names, so ``table_name`` derived
    from ``input_file_name`` is meaningful). Integer/string columns only
    — float→text formatting is engine-specific."""
    import os

    import duckdb

    os.makedirs(_CSV_FIXTURE, exist_ok=True)
    con = duckdb.connect()
    for name, parity in [("customer_even", 0), ("customer_odd", 1)]:
        con.execute(
            f"COPY (SELECT c_custkey, c_name, c_nationkey, c_mktsegment "
            f"FROM '{sf_dir}/customer.parquet' WHERE c_custkey % 2 = {parity} "
            f"ORDER BY c_custkey) TO '{_CSV_FIXTURE}/{name}.csv' "
            f"(HEADER, DELIMITER ',')"
        )
    con.close()


@register(
    "csv_dir_scan_stats",
    f"""
    SELECT regexp_extract(filename, '([^/]+)\\.csv$', 1) AS table_name,
           count(*) AS n_rows,
           sum(c_custkey::BIGINT)::BIGINT AS custkey_sum,
           sum(length(c_name))::BIGINT AS name_chars
    FROM read_csv('{_CSV_FIXTURE}/*.csv', header=true, all_varchar=true,
                  filename=true)
    GROUP BY 1
    """,
)
def csv_dir_scan_stats(spark, sf_dir):
    """S1/S2 gate: all-string CSV directory scan with per-file
    ``table_name`` (reference extract_schema.py:88-99), aggregated per
    source file. The fixture is regenerated from sf_dir each call, so
    Spark and the oracle read identical bytes."""
    from semantic_ann_in_data_lake_spark.sources.readers import read_csv_dir

    _gen_csv_fixture(sf_dir)
    df = read_csv_dir(spark, _CSV_FIXTURE, all_string=True)
    return df.groupBy("table_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_custkey").cast("long")).alias("custkey_sum"),
        F.sum(F.length("c_name")).alias("name_chars"),
    )


@register(
    "jsonl_roundtrip_stats",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, sum(o_orderkey)::BIGINT AS key_sum
    FROM orders GROUP BY 1, 2
    """,
)
def jsonl_roundtrip_stats(spark, sf_dir):
    """S5+S6 gate: orders → JSONL sink → JSONL source → aggregate; the
    oracle aggregates the original parquet, so any round-trip loss
    (types, row drops, encoding) breaks the hash."""
    from semantic_ann_in_data_lake_spark.sources.readers import read_jsonl
    from semantic_ann_in_data_lake_spark.sources.writers import write_json_lines

    write_json_lines(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_orderstatus"
        ),
        _JSONL_RT,
    )
    back = read_jsonl(
        spark,
        _JSONL_RT,
        "o_orderkey long, o_orderpriority string, o_orderstatus string",
    )
    return back.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("key_sum")
    )


@register(
    "csv_sink_roundtrip",
    """
    SELECT p_brand, p_type, count(*) AS n,
           sum(p_size)::BIGINT AS size_sum, sum(p_partkey)::BIGINT AS key_sum
    FROM part GROUP BY 1, 2
    """,
)
def csv_sink_roundtrip(spark, sf_dir):
    """S7 gate: part → header-CSV sink → read back with an explicit
    schema → aggregate vs the original parquet (int/string columns only
    — float→text formatting is engine-specific)."""
    from semantic_ann_in_data_lake_spark.sources.writers import write_csv

    write_csv(
        _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size"),
        _CSV_RT,
    )
    back = (
        spark.read.option("header", True)
        .schema("p_partkey long, p_brand string, p_type string, p_size int")
        .csv(_CSV_RT)
    )
    return back.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_size").alias("size_sum"),
        F.sum("p_partkey").alias("key_sum"),
    )


_JSON_CATALOG = "/tmp/sals_gate/json_catalog"


@register(
    "json_catalog_scan",
    f"""
    SELECT meta.region AS region, count(*) AS n_tables,
           sum(meta.key)::BIGINT AS key_sum, sum(length(table_name))::BIGINT AS name_chars
    FROM read_json('{_JSON_CATALOG}/catalog.json')
    GROUP BY 1
    """,
)
def json_catalog_scan(spark, sf_dir):
    """S4 gate: multi-line JSON array catalog (the reference's
    ``{{app}}_csv_schema.json`` shape, extract_schema.py:118-129) with a
    nested object per entry, read via ``read_json_catalog`` and
    aggregated by a nested field. Fixture derived from sf_dir nation ⋈
    region so both engines read identical bytes."""
    import os

    import duckdb

    from semantic_ann_in_data_lake_spark.sources.readers import read_json_catalog

    os.makedirs(_JSON_CATALOG, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT 'NATION_' || n_nationkey AS table_name,
                 {{'region': r_name, 'key': n_nationkey}} AS meta
          FROM '{sf_dir}/nation.parquet'
          JOIN '{sf_dir}/region.parquet' ON n_regionkey = r_regionkey
          ORDER BY n_nationkey
        ) TO '{_JSON_CATALOG}/catalog.json' (FORMAT JSON, ARRAY true)"""
    )
    con.close()
    df = read_json_catalog(spark, _JSON_CATALOG + "/catalog.json")
    return df.groupBy(F.col("meta.region").alias("region")).agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.sum("meta.key").alias("key_sum"),
        F.sum(F.length("table_name")).alias("name_chars"),
    )


@register(
    "stratified_sample_docs",
    f"""
    WITH h AS (
      SELECT doc_id, lang, source,
             {portable_hash_expr("doc_id::VARCHAR", seed="strat42:")} AS hk
      FROM documents
    ), r AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rnk
      FROM h
    )
    SELECT doc_id, lang, source, rnk::INT AS sample_rank
    FROM r WHERE rnk <= 5
    """,
)
def stratified_sample_docs(spark, sf_dir):
    """Per-language quota sample (5 docs/lang) in seeded-hash order —
    the corpus-balancing primitive; one ranking window, no driver-side
    stratum enumeration."""
    from semantic_ann_in_data_lake_spark.operators.pairs import stratified_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_sample(d, "lang", 5, "doc_id")


def _mix_case_sql(fractions: dict[str, float], m: int = 1_000_000) -> str:
    from semantic_ann_in_data_lake_spark.functions.hashing import portable_hash_expr

    branches = " ".join(
        f"WHEN source = '{g}' THEN {int(round(f * m))}"
        for g, f in sorted(fractions.items())
    )
    hk = portable_hash_expr("doc_id::VARCHAR", seed="mix42:")
    return f"({hk}) % {m} < (CASE {branches} ELSE 0 END)"


_MIX_FRACS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1, "src4": 0.0}


@register(
    "mix_sample_docs",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_mix_case_sql(_MIX_FRACS)}
    """,
)
def mix_sample_docs(spark, sf_dir):
    """Pretraining-mix sampling: per-source deterministic Bernoulli keep
    fractions (1.0 / 0.5 / 0.25 / 0.1 / 0.0 over src0..src4; unlisted
    sources drop) — a row-local hash filter, no shuffle, no counts."""
    from semantic_ann_in_data_lake_spark.operators.pairs import mix_sample

    d = _t(spark, sf_dir, "documents")
    return mix_sample(d, _MIX_FRACS).select("doc_id", "source")


_ORC_RT = "/tmp/sals_gate/orc_rt"


@register(
    "orc_sink_roundtrip",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           sum(o_custkey)::BIGINT AS cust_sum,
           round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS price_sum
    FROM orders GROUP BY 1, 2
    """,
)
def orc_sink_roundtrip(spark, sf_dir):
    """S6/S7 family, ORC tier: orders → ORC sink → read back →
    aggregate vs the original parquet through the DuckDB oracle. ORC
    preserves types exactly (unlike the CSV text round-trip), so the
    DECIMAL money discipline applies unchanged."""
    from semantic_ann_in_data_lake_spark.sources.writers import write_orc

    write_orc(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority", "o_totalprice",
        ),
        _ORC_RT,
    )
    back = spark.read.orc(_ORC_RT)
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_custkey").alias("cust_sum"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("price_sum"),
    )


@register(
    "cap_docs_per_source",
    """
    WITH r AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS __rn
      FROM documents
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(doc_id)::BIGINT AS id_sum
    FROM r WHERE __rn <= 40
    GROUP BY source
    """,
)
def cap_docs_per_source(spark, sf_dir):
    """Per-source corpus balancing: keep the first 40 docs per source
    (pairs.cap_per_key — WindowGroupLimit-bounded partitioned window),
    then roll up per source; oracle = the same cap in plain SQL."""
    from semantic_ann_in_data_lake_spark.operators.pairs import cap_per_key

    docs = _t(spark, sf_dir, "documents")
    capped = cap_per_key(docs, key="source", n=40, order_col="doc_id")
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


@register(
    "media_frame_samples",
    """
    WITH m AS (
      SELECT doc_id AS media_id, text, length(text)::BIGINT AS L
      FROM documents WHERE length(text) >= 32
    ),
    f AS (SELECT media_id, unnest(range(0, 4)) AS fi, text, L FROM m)
    SELECT media_id, fi::INT AS frame_idx,
           ((fi * (L - 32)) // 3)::BIGINT AS frame_off,
           md5(substr(text, ((fi * (L - 32)) // 3)::INT + 1, 32)) AS frame_md5
    FROM f
    """,
)
def media_frame_samples(spark, sf_dir):
    """Video-style frame sampling over binary payloads
    (operators/multimodal.py::sample_frames): 4 uniformly spaced
    32-byte windows per payload, digest per frame. The documents
    fixture is pure ASCII (verified at every sf), so the DuckDB oracle
    reproduces the byte windows with character substr — the gate pins
    offset arithmetic, batch shapes, and digest equality end to end."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        sample_frames,
        synthesize_media_from_documents,
    )

    media = synthesize_media_from_documents(_t(spark, sf_dir, "documents"))
    return sample_frames(media, k=4, frame_len=32)


#: analytic per-channel-sum oracle over the shared deterministic pixel
#: rule (_ppm_dims/_ppm_pixels) — certifies ANY container whose decode
#: must reproduce those pixels (netpbm P6 and PNG both gate against it)
_PIXEL_RULE_SQL = """
    WITH d AS (
      SELECT doc_id AS media_id,
             (doc_id % 13 + 4)::INT AS width,
             ((doc_id * 7) % 11 + 4)::INT AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, width, height,
             unnest(range(0, width * height)) AS i
      FROM d
    )
    SELECT media_id, width, height,
           sum((media_id + 31 * (i // width) + 7 * (i % width))
               % 256)::BIGINT AS sum_r,
           sum((media_id + 31 * (i // width) + 7 * (i % width) + 97)
               % 256)::BIGINT AS sum_g,
           sum((media_id + 31 * (i // width) + 7 * (i % width) + 194)
               % 256)::BIGINT AS sum_b
    FROM px GROUP BY 1, 2, 3
    """


@register("ppm_decode_stats", _PIXEL_RULE_SQL)
def ppm_decode_stats(spark, sf_dir):
    """REAL image decode, hash-gated end to end
    (operators/multimodal.py): one P6 PPM payload per document is
    synthesized in an Arrow-batched encode stage (dimensions and pixel
    values are pure integer functions of doc_id), decoded back by the
    pure-Python netpbm parser `decode_image` — the seam rounds 1-8
    stubbed by env policy, now closed — and reduced to exact integer
    per-channel sums. The oracle recomputes every statistic
    analytically from the pixel rule, so a single flipped byte
    anywhere in encode, header parsing, raster slicing, or channel
    deinterleaving fails the hash. Bytes never leave the Python
    worker: the gate rows are (media_id, width, height, 3 sums)."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        image_decode_stats,
        synthesize_ppm_media,
    )

    media = synthesize_ppm_media(_t(spark, sf_dir, "documents"))
    return image_decode_stats(media)


@register("png_decode_stats", _PIXEL_RULE_SQL)
def png_decode_stats(spark, sf_dir):
    """REAL PNG decode, hash-gated end to end
    (operators/multimodal.py::decode_png): the SAME deterministic
    pixel rule as `ppm_decode_stats`, but the payloads are genuine
    PNGs — stdlib-zlib deflate, CRC-32 on every chunk, and scanlines
    encoded with ALL FIVE spec filter types (row i uses i mod 5), so
    the decoder's inflate + CRC walk + Sub/Up/Average/Paeth
    reconstruction must all be byte-perfect for the channel sums to
    hash-match the analytic oracle."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        decode_png,
        image_decode_stats,
        synthesize_png_media,
    )

    media = synthesize_png_media(_t(spark, sf_dir, "documents"))
    return image_decode_stats(media, decode_fn=decode_png)


@register(
    "media_decode_quarantine",
    """
    WITH d AS (
      SELECT doc_id AS media_id,
             (doc_id % 13 + 4)::INT AS width,
             ((doc_id * 7) % 11 + 4)::INT AS height
      FROM documents
    ),
    bad AS (SELECT media_id FROM d WHERE media_id % 7 = 0),
    ok AS (SELECT * FROM d WHERE media_id % 7 <> 0),
    px AS (
      SELECT media_id, width, height,
             unnest(range(0, width * height)) AS i
      FROM ok
    )
    SELECT (SELECT count(*) FROM d)::BIGINT AS n_total,
           (SELECT count(*) FROM ok)::BIGINT AS n_ok,
           (SELECT count(*) FROM bad)::BIGINT AS n_bad,
           (SELECT coalesce(sum(media_id), 0) FROM bad)::BIGINT
             AS bad_id_sum,
           sum((media_id + 31 * (i // width) + 7 * (i % width))
               % 256)::BIGINT AS sum_r,
           sum((media_id + 31 * (i // width) + 7 * (i % width) + 97)
               % 256)::BIGINT AS sum_g,
           sum((media_id + 31 * (i // width) + 7 * (i % width) + 194)
               % 256)::BIGINT AS sum_b
    FROM px
    """,
)
def media_decode_quarantine(spark, sf_dir):
    """Quarantine decode over a DELIBERATELY part-corrupt corpus — the
    shape a real ingest runs: every 7th PNG payload gets one
    mid-payload byte XORed (`corrupt_every_nth` — id-arithmetic
    membership an oracle can replay), `decode_quarantine_stats`
    decodes under try so one bad byte fails a ROW, not the job, and
    the summary certifies that EXACTLY the corrupted rows quarantined
    (count + id-sum) while the survivors' channel sums still match the
    analytic pixel rule. A flipped byte anywhere in a PNG chunk is
    caught by the per-chunk CRC or the inflate, so a correct decoder
    can neither pass a corrupt payload nor drop a clean one."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        corrupt_every_nth,
        decode_png,
        decode_quarantine_stats,
        synthesize_png_media,
    )

    media = corrupt_every_nth(
        synthesize_png_media(_t(spark, sf_dir, "documents")), every_n=7
    )
    per_row = decode_quarantine_stats(media, decode_fn=decode_png)
    return per_row.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_ok"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
        F.coalesce(
            F.sum(F.when(~F.col("ok"), F.col("media_id"))), F.lit(0)
        )
        .cast("long")
        .alias("bad_id_sum"),
        F.sum("sum_r").cast("long").alias("sum_r"),
        F.sum("sum_g").cast("long").alias("sum_g"),
        F.sum("sum_b").cast("long").alias("sum_b"),
    )


@register(
    "wav_decode_stats",
    """
    WITH d AS (
      SELECT doc_id AS media_id,
             (8000 + (doc_id % 3) * 4000)::INT AS sample_rate,
             (doc_id % 96 + 16)::BIGINT AS n
      FROM documents
    ),
    s AS (
      SELECT media_id, sample_rate, n, unnest(range(0, n)) AS i
      FROM d
    ),
    v AS (
      SELECT media_id, sample_rate, n,
             ((media_id * 17 + 3 * i * i) % 4001) - 2000 AS x
      FROM s
    )
    SELECT media_id, sample_rate, n AS n_samples,
           sum(x)::BIGINT AS sum_samples,
           sum(abs(x))::BIGINT AS sum_abs,
           max(abs(x))::BIGINT AS peak
    FROM v GROUP BY 1, 2, 3
    """,
)
def wav_decode_stats(spark, sf_dir):
    """REAL audio decode, hash-gated end to end
    (operators/multimodal.py): one PCM16 RIFF/WAVE payload per
    document is synthesized in an Arrow-batched encode stage (sample
    rate and waveform are pure integer functions of doc_id), decoded
    back by the pure-Python RIFF chunk-walker `decode_audio` — which
    must honor the even-byte pad rule because the encoder plants an
    odd-length LIST chunk before data — and reduced to exact integer
    waveform statistics. The oracle recomputes every statistic
    analytically from the waveform rule, so a flipped byte anywhere in
    the header math, chunk walk, or sample unpacking fails the hash.
    The audio sibling of `ppm_decode_stats`."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        audio_decode_stats,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(_t(spark, sf_dir, "documents"))
    return audio_decode_stats(media)


@register(
    "replay_mix_docs",
    f"""
    WITH f AS (
      SELECT doc_id, source,
             (CAST(substr(source, 4) AS INT) % 5) / 2.0 + 0.5 AS f
      FROM documents
    ),
    e AS (
      SELECT doc_id, source, f,
             unnest(range(0, ceil(f)::BIGINT)) AS copy_idx
      FROM f WHERE f > 0
    )
    SELECT doc_id, source, copy_idx::INT AS copy_idx
    FROM e
    WHERE copy_idx < floor(f)
       OR ((({portable_hash_expr("doc_id::VARCHAR", seed="replaymix:")})
            % 1000000007 + 1000000007) % 1000000007 + 1)::DOUBLE
          / 1000000008.0 < f - floor(f)
    """,
)
def replay_mix_docs(spark, sf_dir):
    """Source-level replay mixing (operators/packing.py
    replay_upsample): per-source factors 0.5/1.0/1.5/2.0/2.5 (derived
    arithmetically from the source index so both engines compute the
    exact binary fractions) expand the corpus into an epoch stream —
    whole copies always, the fractional copy by a deterministic
    id-hash draw, factor 0.5 down-samples. Entirely row-local (one
    bounded explode + filter, no shuffle); the gate pins the
    whole/fractional keep rule and the uniform's hash idiom
    cross-engine."""
    from semantic_ann_in_data_lake_spark.operators.packing import (
        replay_upsample,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    idx = F.substring("source", 4, 10).cast("int")
    factor = (idx % 5).cast("double") / 2.0 + 0.5
    return replay_upsample(d, factor, id_col="doc_id", salt="replaymix").select(
        "doc_id", "source", "copy_idx"
    )


@register(
    "weighted_sample_docs",
    f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             ((({portable_hash_expr("doc_id::VARCHAR", seed="wsample:")})
               % 1000000007 + 1000000007) % 1000000007 + 1)::DOUBLE
             / 1000000008.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars,
           round(-ln(u) / n_chars + 1e-9, 6) AS sample_key
    FROM h
    ORDER BY sample_key, doc_id
    LIMIT 25
    """,
)
def weighted_sample_docs(spark, sf_dir):
    """Efraimidis–Spirakis weighted sample (operators/pairs.py
    weighted_sample): 25 docs drawn with probability proportional to
    length, rank key -ln(u)/w with u from the portable id hash —
    reproducible cross-engine, partitioning-insensitive, and executed
    as a distributed top-k (no global sort)."""
    from semantic_ann_in_data_lake_spark.operators.pairs import (
        weighted_sample,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(d, "doc_id", "n_chars", k=25)


# ---------------------------------------------------------------------------
# Value-overlap (containment) join discovery — the JOSIE-style value-side
# complement of lake_join_discovery's embedding-side ranking.
# ---------------------------------------------------------------------------

#: (table, column) posting sources for containment discovery: the
#: lake's key-ish columns, values cast to string. FK→PK edges
#: (c_nationkey→n_nationkey, o_custkey→c_custkey, …) surface at
#: containment 1.0 no matter what the columns are called.
_OVERLAP_COLS = [
    ("nation", "n_nationkey"),
    ("nation", "n_regionkey"),
    ("region", "r_regionkey"),
    ("customer", "c_custkey"),
    ("customer", "c_nationkey"),
    ("customer", "c_mktsegment"),
    ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"),
    ("orders", "o_custkey"),
    ("orders", "o_orderpriority"),
    ("part", "p_brand"),
    ("part", "p_type"),
]


def _overlap_oracle(threshold: float = 0.5) -> str:
    selects = " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
        f"{c}::VARCHAR AS value FROM {t} WHERE {c} IS NOT NULL"
        for t, c in _OVERLAP_COLS
    )
    return f"""
    WITH cv AS ({selects}),
    vals AS (SELECT DISTINCT table_name, column_name, value FROM cv),
    sizes AS (
      SELECT table_name, column_name, count(*)::BIGINT AS n_distinct
      FROM vals GROUP BY 1, 2
    ),
    overlap AS (
      SELECT a.table_name AS query_table, a.column_name AS query_column,
             b.table_name AS cand_table, b.column_name AS cand_column,
             count(*)::BIGINT AS n_overlap
      FROM vals a JOIN vals b ON a.value = b.value
                 AND a.table_name <> b.table_name
      GROUP BY 1, 2, 3, 4
    )
    SELECT o.query_table, o.query_column, o.cand_table, o.cand_column,
           s.n_distinct AS n_query_distinct, o.n_overlap,
           round(o.n_overlap::DOUBLE / s.n_distinct, 6) AS containment
    FROM overlap o
    JOIN sizes s ON s.table_name = o.query_table
                AND s.column_name = o.query_column
    WHERE o.n_overlap::DOUBLE >= {threshold} * s.n_distinct::DOUBLE - 1e-9
    """


@register("value_overlap_join_discovery", _overlap_oracle())
def value_overlap_join_discovery(spark, sf_dir):
    """Containment-based joinable-column discovery
    (operators/discovery.py::value_overlap_discovery): cross-table
    column pairs whose distinct-value containment ≥ 0.5 over the
    lake's key columns — the value-side complement of the semantic
    discovery scenario (FK→PK edges surface at 1.0 regardless of
    naming). Posting-list self-join keyed by value with a
    per-value fan-out cap; never all-pairs."""
    from semantic_ann_in_data_lake_spark.operators.discovery import (
        value_overlap_discovery,
    )

    parts = [
        _t(spark, sf_dir, t).select(
            F.lit(t).alias("table_name"),
            F.lit(c).alias("column_name"),
            F.col(c).cast("string").alias("value"),
        )
        for t, c in _OVERLAP_COLS
    ]
    cv = parts[0]
    for p in parts[1:]:
        cv = cv.unionByName(p)
    return value_overlap_discovery(cv, threshold=0.5)


# ---------------------------------------------------------------------------
# Temperature-based mixture allocation (the multinomial sampling weights
# used to mix training sources: p_s ∝ tokens_s^alpha, alpha = 0.5)
# ---------------------------------------------------------------------------


def _temperature_mix_oracle(budget: int = 10_000_000) -> str:
    from semantic_ann_in_data_lake_spark.functions.text import words_sql

    return f"""
    WITH per_source AS (
      SELECT source,
             count(*)::BIGINT AS n_docs,
             sum(len({words_sql('text')}))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *, round(sqrt(n_tokens::DOUBLE), 6)::DECIMAL(18,6) AS wgt
      FROM per_source
    ),
    tot AS (SELECT sum(wgt) AS total FROM w)
    SELECT w.source, w.n_docs, w.n_tokens,
           round(w.wgt::DOUBLE / tot.total::DOUBLE, 6) AS share,
           floor(round(w.wgt::DOUBLE / tot.total::DOUBLE, 6)::DECIMAL(18,6)
                 * {budget})::BIGINT AS alloc_tokens
    FROM w, tot
    """


@register("temperature_mix_allocation", _temperature_mix_oracle())
def temperature_mix_allocation(spark, sf_dir):
    """Temperature-based source mixing weights (α = 0.5): the
    allocation step of multi-source training-data assembly —
    p_s ∝ tokens_s^α flattens the source distribution so small
    sources are not drowned out. One partial-aggregating groupBy for
    the per-source token totals; the weight normalization runs over
    the (tiny) per-source table with DECIMAL accumulation so the
    cross-source sum is order-independent and the driver's hash gate
    holds. α is sqrt (correctly-rounded in both engines); a general
    pow(x, α) tier would document the one-ulp caveat instead."""
    from semantic_ann_in_data_lake_spark.functions.text import words

    budget = 10_000_000
    per_source = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words("text"))).cast("long").alias("n_tokens"),
        )
    )
    w = per_source.withColumn(
        "wgt",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast(
            "decimal(18,6)"
        ),
    )
    tot = w.agg(F.sum("wgt").alias("total"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "share",
            F.round(
                F.col("wgt").cast("double") / F.col("total").cast("double"), 6
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "share",
            F.floor(F.col("share").cast("decimal(18,6)") * budget)
            .cast("long")
            .alias("alloc_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Fused join discovery: distribution-sketch (embedding) + value
# (containment) evidence merged by reciprocal-rank fusion — the
# capstone over the reference's headline scenario (semlink.py:11-32)
# with the JOSIE-style leg alongside.
# ---------------------------------------------------------------------------

_SKETCH_DIM = 16


def _fused_discovery_oracle(topk: int = 3) -> str:
    from semantic_ann_in_data_lake_spark.functions.hashing import (
        portable_hash_expr,
    )
    from semantic_ann_in_data_lake_spark.functions.vectors import (
        cosine_sim_sql,
    )

    vals = " UNION ALL ".join(
        f"SELECT '{t}.{c}' AS col_key, '{t}' AS tname, "
        f"{c}::VARCHAR AS value FROM {t} WHERE {c} IS NOT NULL"
        for t, c in _OVERLAP_COLS
    )
    dims = ", ".join(
        f"coalesce(sum(CASE WHEN bucket = {i} THEN sgn END), 0)::DOUBLE"
        for i in range(_SKETCH_DIM)
    )
    return f"""
    WITH cv AS ({vals}),
    dvals AS (SELECT DISTINCT col_key, tname, value FROM cv),
    contrib AS (
      SELECT col_key, tname,
             {portable_hash_expr('value', seed='vsk:')} % {_SKETCH_DIM} AS bucket,
             CASE WHEN {portable_hash_expr('value', seed='vsg:')} % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM dvals
    ),
    emb AS (
      SELECT col_key, tname, [{dims}] AS v
      FROM contrib GROUP BY col_key, tname
    ),
    sem AS (
      SELECT a.col_key AS query_col, b.col_key AS cand_col,
             row_number() OVER (
               PARTITION BY a.col_key
               ORDER BY round({cosine_sim_sql('a.v', 'b.v')}, 6) DESC,
                        b.col_key ASC) AS rank_a
      FROM emb a JOIN emb b ON a.tname <> b.tname
    ),
    sizes AS (SELECT col_key, count(*)::BIGINT AS nd FROM dvals GROUP BY 1),
    ov AS (
      SELECT a.col_key AS query_col, b.col_key AS cand_col,
             count(*)::BIGINT AS n_overlap
      FROM dvals a JOIN dvals b
        ON a.value = b.value AND a.tname <> b.tname
      GROUP BY 1, 2
    ),
    val AS (
      SELECT o.query_col, o.cand_col,
             row_number() OVER (
               PARTITION BY o.query_col
               ORDER BY round(o.n_overlap::DOUBLE / s.nd, 6) DESC,
                        o.cand_col ASC) AS rank_b
      FROM ov o JOIN sizes s ON s.col_key = o.query_col
    ),
    fused AS (
      SELECT coalesce(s.query_col, v.query_col) AS query_col,
             coalesce(s.cand_col, v.cand_col) AS cand_col,
             s.rank_a, v.rank_b,
             round(coalesce(1.0 / (60 + s.rank_a), 0.0)
                   + coalesce(1.0 / (60 + v.rank_b), 0.0), 6) AS rrf_score
      FROM sem s FULL OUTER JOIN val v
        ON v.query_col = s.query_col AND v.cand_col = s.cand_col
    )
    SELECT query_col, cand_col, rank_a, rank_b, rrf_score, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_col
                                   ORDER BY rrf_score DESC, cand_col ASC) AS rank
      FROM fused
    ) WHERE rank <= {topk}
    """


@register("join_discovery_fused", _fused_discovery_oracle())
def join_discovery_fused(spark, sf_dir):
    """Fused joinable-column discovery, top-3 per column: an
    embedding leg (cosine over a 16-dim feature-hash sketch of each
    column's distinct VALUES — the deterministic sandbox twin of the
    model embedder; a real model plugs into the same rrf_fuse call
    through the embedder seam) merged with the containment leg
    (value_overlap_discovery ranking) by reciprocal-rank fusion.
    Agreement between independent signals is the production recipe;
    FK→PK edges win both legs. The sketch is one groupBy over hashed
    distinct values — fixed-size per column regardless of rows — and
    the fusion is list-sized work (operators/ranks.py::rrf_fuse)."""
    from semantic_ann_in_data_lake_spark.cache import scoped_persist
    from semantic_ann_in_data_lake_spark.functions.hashing import (
        portable_hash64,
    )
    from semantic_ann_in_data_lake_spark.functions.vectors import cosine_sim
    from semantic_ann_in_data_lake_spark.operators.discovery import (
        value_overlap_discovery,
    )
    from semantic_ann_in_data_lake_spark.operators.ranks import rrf_fuse

    parts = [
        _t(spark, sf_dir, t).select(
            F.lit(t).alias("table_name"),
            F.lit(f"{t}.{c}").alias("column_name"),
            F.col(c).cast("string").alias("value"),
        )
        for t, c in _OVERLAP_COLS
    ]
    cv = parts[0]
    for p in parts[1:]:
        cv = cv.unionByName(p)
    dvals = scoped_persist(
        cv.where(F.col("value").isNotNull()).distinct()
    )

    # --- embedding leg: feature-hash sketch of the value set ---------
    contrib = dvals.select(
        F.col("column_name").alias("col_key"),
        F.col("table_name").alias("tname"),
        F.pmod(portable_hash64("value", seed="vsk:"), F.lit(_SKETCH_DIM))
        .cast("int")
        .alias("bucket"),
        F.when(
            F.pmod(portable_hash64("value", seed="vsg:"), F.lit(2)) == 0, 1
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    emb = scoped_persist(
        contrib.groupBy("col_key", "tname").agg(
            F.array(
                *[
                    F.coalesce(
                        F.sum(F.when(F.col("bucket") == i, F.col("sgn"))),
                        F.lit(0),
                    ).cast("double")
                    for i in range(_SKETCH_DIM)
                ]
            ).alias("v")
        )
    )
    a = emb.select(
        F.col("col_key").alias("query_col"),
        F.col("tname").alias("qt"),
        F.col("v").alias("qv"),
    )
    b = emb.select(
        F.col("col_key").alias("cand_col"),
        F.col("tname").alias("ct"),
        F.col("v").alias("cv"),
    )
    sem = (
        a.join(b, F.col("qt") != F.col("ct"))
        .select(
            "query_col",
            "cand_col",
            F.round(cosine_sim("qv", "cv"), 6).alias("cos"),
        )
        .select(
            "query_col",
            "cand_col",
            F.row_number()
            .over(
                Window.partitionBy("query_col").orderBy(
                    F.col("cos").desc(), F.col("cand_col").asc()
                )
            )
            .alias("rank"),
        )
    )

    # --- value leg: containment ranking over the same universe --------
    # threshold just above 0: every pair with >=1 shared value ranks;
    # thresholding is not the value leg's job here
    ov = value_overlap_discovery(dvals, threshold=1e-9)
    val = ov.select(
        F.col("query_column").alias("query_col"),
        F.col("cand_column").alias("cand_col"),
        F.row_number()
        .over(
            Window.partitionBy("query_column").orderBy(
                F.col("containment").desc(), F.col("cand_column").asc()
            )
        )
        .alias("rank"),
    )
    return rrf_fuse(sem, val, query_col="query_col", cand_col="cand_col", topk=3)


_DPP_DIR = "/tmp/sals_gate/orders_by_priority"


@register(
    "dpp_partitioned_join_prune",
    """
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice::DECIMAL(18,2)), 2)::DOUBLE AS spend
    FROM orders
    WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
    GROUP BY o_orderpriority
    """,
)
def dpp_partitioned_join_prune(spark, sf_dir):
    """Dynamic partition pruning, the partition-layout twin of the
    Bloom row filter (operators/bloomjoin.py): orders land partitioned
    by priority (the hive-layout sink every lake table uses); a
    filtered dim joined on the partition column makes Spark inject a
    runtime subquery into the scan's PartitionFilters, so only the
    matching DIRECTORIES are ever read — at 100 TB, pruning whole
    partitions beats filtering rows. Plan-pinned: the scan carries a
    dynamicpruning expression. Result identical to the static filter,
    which is the oracle."""
    import os

    out = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )
    # dir keyed by sf so a gate at one sf never reuses another's layout
    dpp_dir = os.path.join(_DPP_DIR, os.path.basename(os.path.normpath(sf_dir)))
    out.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dpp_dir)
    fact = spark.read.parquet(dpp_dir)
    dim = (
        fact.select("o_orderpriority")
        .distinct()
        .where(
            F.col("o_orderpriority").startswith("1-")
            | F.col("o_orderpriority").startswith("2-")
        )
    )
    return (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("spend"),
        )
    )


_RL_H1 = portable_hash_expr("c_custkey::VARCHAR", seed="rl1:")
_RL_H2 = portable_hash_expr("c_custkey::VARCHAR", seed="rl2:")
_RL_W = 4


@register(
    "record_linkage_scores",
    f"""
    WITH base AS (
      SELECT c_custkey AS uid, 'o' AS side, c_name AS name,
             c_acctbal AS acct, c_nationkey AS nat
      FROM customer
    ), dirty AS (
      SELECT c_custkey + 10000000 AS uid, 'd' AS side,
             CASE WHEN ({_RL_H1}) % 3 = 0
                  THEN substr(c_name, 1, length(c_name) - 1) || 'x'
                  ELSE c_name END AS name,
             CASE WHEN ({_RL_H2}) % 4 = 0
                  THEN c_acctbal + 1.0
                  ELSE c_acctbal END AS acct,
             c_nationkey AS nat
      FROM customer
    ), u AS (
      SELECT * FROM base UNION ALL SELECT * FROM dirty
    ), r AS (
      SELECT *, row_number() OVER (ORDER BY name, uid) AS rn FROM u
    ), p AS (
      SELECT a.uid AS uid_a, b.uid AS uid_b,
             a.side AS side_a, b.side AS side_b,
             (a.name IS NOT DISTINCT FROM b.name) AS agree_name,
             (a.acct IS NOT DISTINCT FROM b.acct) AS agree_acct,
             (a.nat IS NOT DISTINCT FROM b.nat) AS agree_nat
      FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < {_RL_W}
    ), sn AS (
      SELECT sum(c * (c - 1))::DOUBLE AS s, sum(c)::DOUBLE AS n
      FROM (SELECT count(*) AS c FROM u GROUP BY name)
    ), sp AS (
      SELECT sum(c * (c - 1))::DOUBLE AS s, sum(c)::DOUBLE AS n
      FROM (SELECT count(*) AS c FROM u GROUP BY acct)
    ), st AS (
      SELECT sum(c * (c - 1))::DOUBLE AS s, sum(c)::DOUBLE AS n
      FROM (SELECT count(*) AS c FROM u GROUP BY nat)
    ), w AS (
      SELECT
        round((ln(0.95) - ln(least(greatest(sn.s / (sn.n * (sn.n - 1)), 1.0 / (sn.n * (sn.n - 1))), 1.0 - 1.0 / (sn.n * (sn.n - 1)))) + 1e-9) * 1000000, 0)::BIGINT AS aw_name,
        round((ln(0.05) - ln(1.0 - least(greatest(sn.s / (sn.n * (sn.n - 1)), 1.0 / (sn.n * (sn.n - 1))), 1.0 - 1.0 / (sn.n * (sn.n - 1)))) + 1e-9) * 1000000, 0)::BIGINT AS dw_name,
        round((ln(0.9) - ln(least(greatest(sp.s / (sp.n * (sp.n - 1)), 1.0 / (sp.n * (sp.n - 1))), 1.0 - 1.0 / (sp.n * (sp.n - 1)))) + 1e-9) * 1000000, 0)::BIGINT AS aw_acct,
        round((ln(0.1) - ln(1.0 - least(greatest(sp.s / (sp.n * (sp.n - 1)), 1.0 / (sp.n * (sp.n - 1))), 1.0 - 1.0 / (sp.n * (sp.n - 1)))) + 1e-9) * 1000000, 0)::BIGINT AS dw_acct,
        round((ln(0.99) - ln(least(greatest(st.s / (st.n * (st.n - 1)), 1.0 / (st.n * (st.n - 1))), 1.0 - 1.0 / (st.n * (st.n - 1)))) + 1e-9) * 1000000, 0)::BIGINT AS aw_nat,
        round((ln(0.01) - ln(1.0 - least(greatest(st.s / (st.n * (st.n - 1)), 1.0 / (st.n * (st.n - 1))), 1.0 - 1.0 / (st.n * (st.n - 1)))) + 1e-9) * 1000000, 0)::BIGINT AS dw_nat
      FROM sn, sp, st
    )
    SELECT uid_a, uid_b, agree_name, agree_acct, agree_nat,
           round(((CASE WHEN agree_name THEN aw_name ELSE dw_name END)
                + (CASE WHEN agree_acct THEN aw_acct ELSE dw_acct END)
                + (CASE WHEN agree_nat THEN aw_nat ELSE dw_nat END))
                 / 1000000.0 + 1e-9, 4) AS fs_score,
           (uid_b - uid_a = 10000000) AS is_true_match
    FROM p CROSS JOIN w
    WHERE side_a <> side_b
    """,
)
def record_linkage_scores(spark, sf_dir):
    """Entity resolution without ground truth (operators/linkage.py):
    sorted-neighborhood blocking (Hernández–Stolfo) over the union of
    the clean customer table and a deterministically perturbed copy
    (hash-gated edits: last-char on name, +1.0 on acctbal — the dirty-source
    stand-in), then Fellegi–Sunter log-likelihood scoring with
    data-estimated u-probabilities. Blocking = distributed global
    rank + bucket band join (no single-partition window, fan-out ≤
    2W); scoring = row-local micro-unit CASE sum. is_true_match
    exposes the planted identity for downstream P/R evaluation."""
    from semantic_ann_in_data_lake_spark.functions.hashing import (
        portable_hash64,
    )
    from semantic_ann_in_data_lake_spark.operators.linkage import (
        estimate_u_counts,
        fs_scores,
        sorted_neighborhood_pairs,
    )

    c = _t(spark, sf_dir, "customer")
    key_s = F.col("c_custkey").cast("string")
    base = c.select(
        F.col("c_custkey").alias("uid"),
        F.lit("o").alias("side"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acct"),
        F.col("c_nationkey").alias("nat"),
    )
    dirty = c.select(
        (F.col("c_custkey") + 10_000_000).alias("uid"),
        F.lit("d").alias("side"),
        F.when(
            portable_hash64(key_s, seed="rl1:") % 3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("x")
            ),
        ).otherwise(F.col("c_name")).alias("name"),
        F.when(
            portable_hash64(key_s, seed="rl2:") % 4 == 0,
            F.col("c_acctbal") + F.lit(1.0),
        ).otherwise(F.col("c_acctbal")).alias("acct"),
        F.col("c_nationkey").alias("nat"),
    )
    from semantic_ann_in_data_lake_spark.cache import scoped_persist

    u = scoped_persist(base.unionByName(dirty))
    pairs = sorted_neighborhood_pairs(u, ["name"], "uid", window=_RL_W)
    fa = u.select(
        F.col("uid").alias("uid_a"), F.col("side").alias("side_a"),
        F.col("name").alias("name_a"), F.col("acct").alias("acct_a"),
        F.col("nat").alias("nat_a"),
    )
    fb = u.select(
        F.col("uid").alias("uid_b"), F.col("side").alias("side_b"),
        F.col("name").alias("name_b"), F.col("acct").alias("acct_b"),
        F.col("nat").alias("nat_b"),
    )
    p = (
        pairs.join(fa, "uid_a")
        .join(fb, "uid_b")
        .filter(F.col("side_a") != F.col("side_b"))
        .select(
            "uid_a", "uid_b",
            F.col("name_a").eqNullSafe(F.col("name_b")).alias("agree_name"),
            F.col("acct_a").eqNullSafe(F.col("acct_b")).alias("agree_acct"),
            F.col("nat_a").eqNullSafe(F.col("nat_b")).alias("agree_nat"),
        )
    )
    scored = fs_scores(
        p,
        [
            (F.col("agree_name"), 0.95, estimate_u_counts(u, "name")),
            (F.col("agree_acct"), 0.9, estimate_u_counts(u, "acct")),
            (F.col("agree_nat"), 0.99, estimate_u_counts(u, "nat")),
        ],
    )
    return scored.select(
        "uid_a", "uid_b", "agree_name", "agree_acct", "agree_nat",
        "fs_score",
        ((F.col("uid_b") - F.col("uid_a")) == 10_000_000).alias(
            "is_true_match"
        ),
    )


# ---------------------------------------------------------------------------
# UniMax mixture allocation (Chung et al. 2023): uniform budget
# waterfilling with a per-source epoch cap — the published successor to
# temperature sampling for multilingual/multi-source mixing: small
# sources are repeated up to E epochs but never more, the remaining
# budget spreads UNIFORMLY over sources that can absorb it.
# ---------------------------------------------------------------------------

_UNIMAX_EPOCH_CAP = 4


def _unimax_oracle() -> str:
    from semantic_ann_in_data_lake_spark.functions.text import words_sql

    E = _UNIMAX_EPOCH_CAP
    return f"""
    WITH per_source AS (
      SELECT source,
             count(*)::BIGINT AS n_docs,
             sum(len({words_sql('text')}))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    v AS (SELECT source, n_docs, n_tokens, n_tokens * {E} AS capacity
          FROM per_source),
    bb AS (SELECT floor(sum(capacity)::DOUBLE / 2.0::DOUBLE)::BIGINT AS b FROM v),
    r AS (SELECT v.*,
                 row_number() OVER (ORDER BY capacity ASC, source ASC) AS rk,
                 coalesce(sum(capacity) OVER (
                   ORDER BY capacity ASC, source ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
                 count(*) OVER () AS m
          FROM v),
    pick AS (SELECT min(rk) AS jstar
             FROM r WHERE ((SELECT b FROM bb) - prefix)
                          <= capacity * (m - rk + 1)),
    tau AS (SELECT r.prefix AS pnum, (r.m - r.rk + 1) AS pden
            FROM r JOIN pick ON r.rk = pick.jstar),
    alloc AS (
      SELECT r.source, r.n_docs, r.n_tokens, r.capacity,
             CASE WHEN (SELECT jstar FROM pick) IS NULL THEN r.capacity
                  ELSE least(r.capacity,
                    floor(((SELECT b FROM bb) - (SELECT pnum FROM tau))::DOUBLE
                          / (SELECT pden FROM tau)::DOUBLE)::BIGINT)
             END AS alloc_tokens
      FROM r)
    SELECT source, n_docs, n_tokens, capacity, alloc_tokens,
           round(alloc_tokens::DOUBLE / n_tokens::DOUBLE, 6) AS epochs
    FROM alloc
    """


@register("unimax_mix_allocation", _unimax_oracle())
def unimax_mix_allocation(spark, sf_dir):
    """UniMax source allocation at epoch cap E=4 over a budget of half
    the total capacity (so the waterfill path genuinely engages on the
    fixture): sources that fit under the water level τ get their full
    E-epoch capacity, the rest split the remaining budget uniformly.
    τ selection is INTEGER arithmetic (``B − prefix ≤ cap·remaining``
    over the capacity-sorted prefix sums — no float knife-edges);
    the only floats are the final floor-division and the epochs
    readout, both rounded. Hand-case waterfill parity in pytest."""
    from semantic_ann_in_data_lake_spark.functions.text import words
    from semantic_ann_in_data_lake_spark.operators.mixing_unimax import (
        unimax_allocation,
    )

    per_source = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words("text"))).cast("long").alias("n_tokens"),
        )
    )
    return unimax_allocation(
        per_source, epoch_cap=_UNIMAX_EPOCH_CAP, budget=None
    )
