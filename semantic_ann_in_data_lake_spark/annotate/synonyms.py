"""Synonym canonicalization (reference Y1-Y4, ``json_parser.py:95-207``).

The reference expands each annotation term through WordNet synonyms
and greedily groups: the FIRST term seen becomes canonical for every
later synonym — order-dependent by design (``json_parser.py:128-188``).

Spark design: the distinct-term table is tiny relative to the data
(bounded by vocabulary, not rows), so the greedy pass runs driver-side
over a deterministically ordered term list — exactly reproducing the
reference's first-seen semantics under an explicit order — and the
result becomes a broadcast mapping joined back to the data. WordNet
itself is replaced by a shipped static dictionary (no network at
scale; Y1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: minimal built-in synonym dictionary (WordNet-export stand-in)
DEFAULT_SYNONYMS: dict[str, list[str]] = {
    "id": ["identifier", "key"],
    "name": ["title", "label"],
    "date": ["day", "time"],
    "price": ["cost", "amount"],
    "country": ["nation", "state"],
    "type": ["kind", "category"],
}


def _normalize(term: str) -> str:
    return term.strip().lower().replace(" ", "_").replace("-", "_")


def expand_synonyms(term: str, synonyms: dict[str, list[str]]) -> set[str]:
    """Y1: the term plus all its dictionary synonyms (both directions)."""
    t = _normalize(term)
    out = {t}
    out.update(_normalize(s) for s in synonyms.get(t, []))
    for k, vs in synonyms.items():
        if t in (_normalize(v) for v in vs):
            out.add(_normalize(k))
    return out


def canonicalize_terms(
    terms: list[str], synonyms: dict[str, list[str]] | None = None
) -> dict[str, str]:
    """Y2: greedy first-seen canonical grouping over an ordered term
    list (the caller supplies the order; pass ``sorted(...)`` for the
    deterministic distributed variant)."""
    syn = synonyms if synonyms is not None else DEFAULT_SYNONYMS
    canonical: dict[str, str] = {}
    for term in terms:
        t = _normalize(term)
        if t in canonical:
            continue
        canonical[t] = t
        for s in expand_synonyms(t, syn):
            canonical.setdefault(s, t)
    return canonical


def apply_canonical_map(
    df: DataFrame,
    term_col: str,
    spark: SparkSession,
    synonyms: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Y3: rewrite a term column to canonical form.

    Collects the distinct terms (small), runs the greedy pass
    driver-side in sorted order, broadcasts the mapping back as a join.
    """
    terms = [
        r[0]
        for r in df.select(F.col(term_col)).where(F.col(term_col).isNotNull())
        .distinct().collect()
    ]
    mapping = canonicalize_terms(sorted(terms), synonyms)
    map_df = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()],
        "__syn_term string, __syn_canonical string",
    )
    # join key must be the SAME normalization the mapping keys use
    # (_normalize also folds spaces/hyphens to underscores): a bare
    # lower(trim) never matches a multi-word/hyphenated term and the
    # coalesce fallback silently degrades canonicalization to identity
    norm_key = F.replace(
        F.replace(F.lower(F.trim(F.col(term_col))), F.lit(" "), F.lit("_")),
        F.lit("-"),
        F.lit("_"),
    )
    return (
        df.join(
            F.broadcast(map_df),
            norm_key == F.col("__syn_term"),
            "left",
        )
        .withColumn(
            f"{term_col}_canonical",
            F.coalesce(F.col("__syn_canonical"), F.col(term_col)),
        )
        .drop("__syn_term", "__syn_canonical")
    )


def invert_grouping(mapping: dict[str, str]) -> dict[str, list[str]]:
    """Y4: canonical → sorted member terms (``json_parser.py:204-207``)."""
    out: dict[str, list[str]] = {}
    for term, canon in mapping.items():
        out.setdefault(canon, []).append(term)
    return {k: sorted(v) for k, v in out.items()}
