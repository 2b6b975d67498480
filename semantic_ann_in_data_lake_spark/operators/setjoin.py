"""Exact set-similarity self-join with prefix filtering (AllPairs /
PPJoin family): all document pairs whose token-set Jaccard ≥ τ,
WITHOUT the all-pairs cross product.

Extension beyond the reference surface (its near-dup tooling is
embedding-side); complements the repo's MinHash-LSH tier: LSH is
approximate (recall < 1 by construction), this operator is EXACT —
prefix filtering only prunes pairs that provably cannot reach τ.

The classic result (Chaudhuri et al. SSJoin / Bayardo et al. AllPairs):
order each set's tokens by ascending global document frequency; if
|A ∩ B| ≥ ⌈τ/(1+τ)·(|A|+|B|)⌉ (required for Jaccard ≥ τ), then A and B
must share at least one token among each one's first
p = |S| − ⌈τ·|S|⌉ + 1 tokens. So the candidate set is the equi-join of
the PREFIX inverted index only — rare-first ordering makes those
postings lists short.

Scale design (100 TB):

- document frequency = one groupBy on token; prefix rank = one window
  partitioned BY DOCUMENT (well-distributed key, never global).
- candidate generation joins the prefix index with itself on token:
  shuffle keyed by token, posting lists bounded because prefixes hold
  each set's RAREST tokens.
- verification joins the bounded candidate pairs back to the full
  (sorted-array) token sets and computes exact overlap JVM-side
  (``array_intersect``) — cost linear in candidates, and candidates
  are a superset of the answer only by the filter's slack.
- Everything is DataFrame algebra; the oracle is the brute-force
  all-pairs twin, so the prefix filter's EXACTNESS is hash-checked.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_ann_in_data_lake_spark.cache import scoped_persist
from semantic_ann_in_data_lake_spark.functions.text import words


def jaccard_prefix_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ threshold,
    via prefix-filtered candidate generation + exact verification.

    Returns ``(id_a, id_b, jaccard)`` with jaccard rounded to 6 dp.
    Empty token sets never pair (Jaccard undefined → excluded), and
    identical sets pair at 1.0.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    toks = scoped_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.array_sort(F.array_distinct(words(text_col))).alias("toks"),
        )
        .withColumn("sz", F.size("toks"))
        .where(F.col("sz") > 0)
    )

    flat = toks.select("doc_id", "sz", F.explode("toks").alias("tok"))
    df_freq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    # rare-first order within each document; rank window partitions by
    # doc_id (never a global window)
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("tok").asc()
    )
    # prefix length p = sz - ceil(tau*sz) + 1. The ceil runs on a
    # DOUBLE product: sz*tau can land one ulp ABOVE the exact integer
    # (25*0.28 = 7.000000000000001 → ceil 8, exact 7), which would
    # SHORTEN the prefix and silently drop qualifying pairs. The 1e-9
    # bias errs toward a LONGER prefix — more candidates, never fewer;
    # the exact verify below keeps the output identical.
    prefix = (
        flat.join(df_freq, "tok")
        .withColumn("r", F.row_number().over(w_doc))
        .where(
            F.col("r")
            <= F.col("sz")
            - F.ceil(F.col("sz") * F.lit(threshold) - F.lit(1e-9))
            + 1
        )
        .select("tok", "doc_id", "sz")
    )

    a = prefix.select(
        F.col("tok"), F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a")
    )
    b = prefix.select(
        F.col("tok"), F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b")
    )
    # size filter: Jaccard >= tau requires tau*|A| <= |B| <= |A|/tau.
    # Same float-boundary hazard as the prefix ceil (|A|=7, |B|=25,
    # tau=0.28: 25*0.28 > 7 in doubles though exactly equal) — relax by
    # 1e-9 so borderline pairs stay candidates; exact verify decides.
    cands = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.col("sz_b") * F.lit(threshold) - F.lit(1e-9) <= F.col("sz_a"))
        .where(F.col("sz_a") * F.lit(threshold) - F.lit(1e-9) <= F.col("sz_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    # threshold compare on the INTEGER counts (inter >= tau·union −
    # 1e-9): comparing the 6-dp-ROUNDED ratio would drop a pair whose
    # true Jaccard exactly equals a non-representable tau (1/3) and
    # admit one a hair below a representable tau (0.4999995 -> 0.5);
    # the 1e-9 bias (the same discipline as the prefix/size filters)
    # forgives the OTHER direction — double(0.28) sits a hair ABOVE
    # the real 7/25, and the unbiased product would exclude an
    # exactly-qualifying pair. The rounded column is display only.
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("__inter", inter)
        .withColumn("__union", union)
        .where(
            F.col("__inter").cast("double")
            >= F.lit(threshold) * F.col("__union").cast("double") - F.lit(1e-9)
        )
        .withColumn("jaccard", F.round(F.col("__inter") / F.col("__union"), 6))
        .select("id_a", "id_b", "jaccard")
    )


def required_overlap(size_a: int, size_b: int, threshold: float) -> int:
    """⌈τ/(1+τ)·(|A|+|B|)⌉ — the overlap bound behind the filter
    (exposed for tests)."""
    return math.ceil(threshold / (1.0 + threshold) * (size_a + size_b))


def containment_prefix_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact DIRECTIONAL containment join (Broder 1997, *On the
    resemblance and containment of documents*): all ordered pairs
    (a, b), a ≠ b, with C(A→B) = |S(A) ∩ S(B)| / |S(A)| ≥ τ over
    word-``shingle_n``-gram sets — "document a is (near-)verbatim
    contained in document b", the quote/subset complement of the
    symmetric Jaccard join above.

    Returns ``(id_contained, id_container, containment)`` (6 dp).
    Empty shingle sets never pair.

    Prefix filter (the containment specialization of AllPairs):
    C ≥ τ needs |A ∩ B| ≥ ⌈τ|A|⌉, so A must share a shingle with B
    among A's first |A| − ⌈τ|A|⌉ + 1 RAREST shingles. Only the
    contained side prefixes; the container side indexes all shingles —
    but the join key is always one of A's rarest shingles, so posting
    lists stay short on natural text (shingles are far more selective
    than tokens). Size filter: |B| ≥ τ|A|. Verification is exact
    (``array_intersect``), so the filter's slack never changes the
    answer — same float-boundary bias discipline as
    :func:`jaccard_prefix_join`.
    """
    from semantic_ann_in_data_lake_spark.functions.text import (
        word_shingles_from,
    )

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sets = scoped_persist(
        docs.select(
            F.col(id_col).alias("doc_id"), words(text_col).alias("__w")
        )
        .select(
            "doc_id",
            word_shingles_from(F.col("__w"), shingle_n).alias("sh"),
        )
        .withColumn("sz", F.size("sh"))
        .where(F.col("sz") > 0)
    )
    flat = sets.select("doc_id", "sz", F.explode("sh").alias("g"))
    df_freq = flat.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("g").asc()
    )
    # prefix p = sz − ⌈τ·sz⌉ + 1; 1e-9 bias errs toward a LONGER
    # prefix (more candidates, never fewer) — see jaccard_prefix_join
    a_prefix = (
        flat.join(df_freq, "g")
        .withColumn("r", F.row_number().over(w_doc))
        .where(
            F.col("r")
            <= F.col("sz")
            - F.ceil(F.col("sz") * F.lit(threshold) - F.lit(1e-9))
            + 1
        )
        .select("g", F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    )
    b_full = flat.select(
        "g", F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b")
    )
    cands = (
        a_prefix.join(b_full, "g")
        .where(F.col("id_a") != F.col("id_b"))
        .where(F.col("sz_b") >= F.col("sz_a") * F.lit(threshold) - F.lit(1e-9))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"),
                     F.col("sz").alias("sz_a"))
    sb = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("__inter", inter)
        .where(
            F.col("__inter").cast("double")
            >= F.lit(threshold) * F.col("sz_a").cast("double") - F.lit(1e-9)
        )
        .select(
            F.col("id_a").alias("id_contained"),
            F.col("id_b").alias("id_container"),
            F.round(
                F.col("__inter").cast("double") / F.col("sz_a"), 6
            ).alias("containment"),
        )
    )
