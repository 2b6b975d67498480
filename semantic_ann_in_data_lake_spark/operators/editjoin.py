"""Exact edit-distance similarity join with segment blocking
(PassJoin family): all (left, right) string pairs with levenshtein
distance ≤ d, without the cross product.

Extension beyond the reference surface; complements the token-set tier
(``operators/setjoin.py``) with the CHARACTER-level fuzzy join an
entity-resolution / noisy-ingest pipeline needs (typo'd names, OCR
noise, schema-drift column labels — the same error family the
``annotate/corruption.py`` operators model).

The pigeonhole blocking (Li et al.'s PassJoin): partition each indexed
string into d+1 contiguous segments; any string within edit distance d
must contain at least one segment VERBATIM, at a start position shifted
by at most d. So candidates come from an equi-join of right-side
segments against left-side substrings of the matching lengths in the
±d position window — O(d²) keys per probe row, never a cross product.

Scale design:

- Both key sets are generated inside whole-stage codegen
  (``flatten(transform(sequence(...)))`` — no UDF) and the candidate
  join is a plain equi-join on ``(seg_idx, seg, target_len)`` followed
  by a distinct and a JVM-side ``levenshtein`` verify on the bounded
  candidate set.
- Key skew: data where many strings share a long identical region
  (fixed prefixes like "Supplier#...") funnels that segment's postings
  into one bucket; AQE skew-join splitting spreads the tasks, and the
  emitted pair count is the true candidate count — the same bound any
  exact algorithm pays on such data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_len(L: str, i: str, k: int) -> str:
    """SQL text: length of segment ``i`` (0-based) when a string of
    length ``L`` splits into ``k`` even segments (first L%k get +1)."""
    return f"(({L}) div {k} + if(({i}) < ({L}) % {k}, 1, 0))"


def _seg_start(L: str, i: str, k: int) -> str:
    """SQL text: 1-based start of segment ``i``."""
    return f"(1 + ({i}) * (({L}) div {k}) + least(({i}), ({L}) % {k}))"


def _rng(lo: str, hi: str) -> str:
    """SQL text: ascending integer sequence, EMPTY when lo > hi —
    Spark's sequence(5, 3) is the descending [5,4,3], so an unguarded
    range would emit phantom probe positions."""
    return f"if(({lo}) <= ({hi}), sequence({lo}, {hi}), array()) "


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 2,
) -> DataFrame:
    """All pairs with ``levenshtein(left_str, right_str) <= max_dist``.

    Returns ``(id_l, id_r, dist)``. Exact: segment blocking only prunes
    pairs that provably exceed the distance bound. NULL/empty strings
    on either side never pair (the empty string only matches strings of
    length ≤ d, which the length window handles when non-degenerate).
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    d, k = max_dist, max_dist + 1

    r = right.select(
        F.col(right_id).alias("id_r"), F.col(right_str).alias("s_r")
    ).where(F.length("s_r") > 0)
    # index side: the d+1 segments of each right string
    seg_l = _seg_len("length(s_r)", "i", k)
    seg_s = _seg_start("length(s_r)", "i", k)
    r_keys = r.select(
        "id_r",
        "s_r",
        F.explode(
            F.expr(
                f"transform(sequence(0, {d}), i -> struct("
                f"i as seg_idx, substring(s_r, {seg_s}, {seg_l}) as seg, "
                f"length(s_r) as target_len))"
            )
        ).alias("k"),
    ).select("id_r", "s_r", "k.*")

    l = left.select(
        F.col(left_id).alias("id_l"), F.col(left_str).alias("s_l")
    ).where(F.length("s_l") > 0)
    # probe side: for every compatible right length La and segment i,
    # the substrings of s_l with the segment's length, start shifted
    # by at most d
    p_seg_l = _seg_len("La", "i", k)
    p_seg_s = _seg_start("La", "i", k)
    probes = (
        f"flatten(transform({_rng('greatest(length(s_l) - ' + str(d) + ', 1)', 'length(s_l) + ' + str(d))}, La -> "
        f"flatten(transform(sequence(0, {d}), i -> "
        f"transform({_rng(f'greatest(1, {p_seg_s} - {d})', f'least(length(s_l) - {p_seg_l} + 1, {p_seg_s} + {d})')}, "
        f"p -> struct(i as seg_idx, substring(s_l, p, {p_seg_l}) as seg, "
        f"La as target_len))))))"
    )
    l_keys = l.select(
        "id_l", "s_l", F.explode(F.expr(probes)).alias("k")
    ).select("id_l", "s_l", "k.*")

    cands = (
        l_keys.join(r_keys, ["seg_idx", "seg", "target_len"])
        .select("id_l", "s_l", "id_r", "s_r")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("s_l", "s_r"))
        .where(F.col("dist") <= d)
        .select("id_l", "id_r", "dist")
    )
