"""Property-based tests (hypothesis) for the pure column functions."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

# full-suite wall-time guard (VERDICT r11 item 1): this suite is
# deselected by the default `-m "not slow"` run; run it with -m ""
pytestmark = pytest.mark.slow


@st.composite
def _dates(draw):
    return draw(
        st.dates(min_value=dt.date(1200, 1, 1), max_value=dt.date(2400, 12, 31))
    )


class TestDateNormalizationProperties:
    """normalize_date must round-trip any real date through every
    unambiguous plain format."""

    @settings(max_examples=30, deadline=None)
    @given(_dates(), st.sampled_from(["%Y-%m-%d", "%Y%m%d", "%d %B %Y"]))
    def test_roundtrip(self, shared_spark, d, fmt):
        from semantic_ann_in_data_lake_spark.functions.dates import normalize_date

        raw = d.strftime(fmt)
        df = shared_spark.createDataFrame([(raw,)], "raw string")
        got = df.select(normalize_date("raw").alias("n")).collect()[0]["n"]
        assert got == d.strftime("%d %B %Y")


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=5)
)
def test_word_shingles_invariants(shared_spark, texts):
    """Shingles are always distinct, sorted, and only contain tokens
    from the source text."""
    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.functions.text import words, word_shingles_from

    df = shared_spark.createDataFrame([(t,) for t in texts], "t string")
    rows = (
        df.select(words("t").alias("w"))
        .select(F.col("w"), word_shingles_from(F.col("w"), 2).alias("sh"))
        .collect()
    )
    for r in rows:
        sh = r["sh"]
        assert sh == sorted(set(sh))
        toks = set(r["w"])
        for s in sh:
            assert set(s.split(" ")) <= toks


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=8))
def test_portable_hash_matches_duckdb(shared_spark, values):
    """The portable hash tier must be bit-identical in DuckDB for
    arbitrary strings (the foundation of every gated hash operator)."""
    import duckdb

    from semantic_ann_in_data_lake_spark.functions.hashing import (
        portable_hash64,
        portable_hash_expr,
    )

    df = shared_spark.createDataFrame([(v,) for v in values], "v string")
    spark_hashes = {
        r["v"]: r["h"]
        for r in df.select("v", portable_hash64("v", seed="p:").alias("h")).collect()
    }
    con = duckdb.connect()
    for v, h in spark_hashes.items():
        expr = portable_hash_expr("?", seed="p:")
        got = con.execute(f"SELECT {expr}", [v]).fetchone()[0]
        assert got == h, v


class TestAsofJoinProperties:
    """asof_join must agree with pandas merge_asof (direction='backward',
    allow_exact_matches=True) on arbitrary keyed event sets, after the
    documented max-id dedup per (key, ts) on the right side."""

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 100)),
            min_size=1, max_size=12,
        ),
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 100)),
            min_size=1, max_size=12,
        ),
    )
    def test_matches_pandas_merge_asof(self, shared_spark, lrows, rrows):
        import pandas as pd

        from semantic_ann_in_data_lake_spark.operators.asof import asof_join

        base = dt.datetime(2024, 1, 1)
        left_pd = pd.DataFrame(
            {
                "event_id": range(len(lrows)),
                "user_id": [k for k, _ in lrows],
                "ts": [base + dt.timedelta(seconds=s) for _, s in lrows],
            }
        )
        right_pd = (
            pd.DataFrame(
                {
                    "rid": range(1000, 1000 + len(rrows)),
                    "user_id": [k for k, _ in rrows],
                    "ts": [base + dt.timedelta(seconds=s) for _, s in rrows],
                }
            )
            # documented dedup: keep max rid per (key, ts)
            .sort_values("rid")
            .groupby(["user_id", "ts"], as_index=False)
            .last()
        )
        left = shared_spark.createDataFrame(left_pd)
        right = shared_spark.createDataFrame(right_pd)
        got = {
            r["event_id"]: r["matched_rid"]
            for r in asof_join(
                left, right, on="user_id", right_cols=("rid",), right_id="rid"
            ).collect()
        }
        want_df = pd.merge_asof(
            left_pd.sort_values(["ts", "event_id"]),
            right_pd.sort_values("ts"),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
            suffixes=("", "_r"),
        )
        want = {
            int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
            for r in want_df.itertuples()
        }
        assert got == want


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8"),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_bpe_roundtrip_arbitrary_unicode(texts):
    """decode(encode(t)) == t for ANY valid-utf8 text, with merges
    trained on an unrelated tiny corpus — the lossless-byte-level
    property must not depend on the training data."""
    from semantic_ann_in_data_lake_spark.functions.bpe import (
        BpeTokenizer,
        train_bpe,
    )

    merges = train_bpe(
        {"the quick brown": 5, "quick quick": 3, "Σπάρκ δεδομένα": 2}, 64
    )
    tok = BpeTokenizer(merges)
    for t in texts:
        assert tok.decode(tok.encode(t)) == t


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=10),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([1, 2]),
)
def test_edit_distance_join_matches_bruteforce_random(shared_spark, strs, d):
    """PassJoin segment blocking equals the brute-force levenshtein
    cross join on arbitrary short strings (worst case for segment
    degeneracy: tiny alphabets, empty segments, len <= d)."""
    import itertools

    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.operators.editjoin import (
        edit_distance_join,
    )

    left = shared_spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], ["lid", "ls"]
    )
    right = shared_spark.createDataFrame(
        [(i + 1000, s) for i, s in enumerate(strs)], ["rid", "rs"]
    )
    got = {
        (r["id_l"], r["id_r"])
        for r in edit_distance_join(
            left, right, "lid", "ls", "rid", "rs", max_dist=d
        ).collect()
    }
    brute = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .where(
            (F.length("ls") > 0)
            & (F.length("rs") > 0)
            & (F.levenshtein("ls", "rs") <= d)
        )
        .collect()
    }
    assert got == brute


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="xy z", min_size=0, max_size=30),
        min_size=2,
        max_size=10,
    ),
    st.sampled_from([0.3, 0.6, 1.0]),
)
def test_jaccard_prefix_join_matches_bruteforce_random(shared_spark, texts, tau):
    """Prefix filtering equals brute-force all-pairs token-set Jaccard
    on arbitrary text (tiny vocab -> maximal token-frequency ties)."""
    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.functions.text import words
    from semantic_ann_in_data_lake_spark.operators.setjoin import (
        jaccard_prefix_join,
    )

    docs = shared_spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    toks = docs.select(
        "doc_id", F.array_sort(F.array_distinct(words("text"))).alias("tk")
    ).where(F.size("tk") > 0)
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("tk").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("tk").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .where(F.round(inter / union, 6) >= tau)
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(docs, threshold=tau).collect()
    }
    assert got == brute


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="xy z", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_remove_shared_segments_identity_when_nothing_shared(
    shared_spark, texts, seg
):
    """With min_docs above the corpus size nothing can be shared: the
    rewrite must be the identity on whitespace-normalized text, and
    n_removed must be 0 — for ANY text and segment width."""
    from semantic_ann_in_data_lake_spark.operators.boilerplate import (
        remove_shared_segments,
    )

    docs = shared_spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = remove_shared_segments(
        docs, seg_words=seg, min_docs=len(texts) + 1
    ).collect()
    assert len(out) == len(texts)
    for r in out:
        toks = [x for x in texts[r["doc_id"]].split(" ") if x]
        assert r["n_removed"] == 0
        assert r["text_clean"] == " ".join(toks)
        import math
        assert r["n_segments"] == math.ceil(len(toks) / seg)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.sampled_from(["p", "q", "r", "s"]), min_size=1, max_size=80),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=2, max_value=16),
)
def test_cms_never_underestimates_random(shared_spark, keys, depth, width):
    """est >= true for every key under arbitrary collision pressure."""
    from collections import Counter

    from semantic_ann_in_data_lake_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    df = shared_spark.createDataFrame([(k,) for k in keys], ["k"])
    out = cms_heavy_hitters(df, "k", k=10, depth=depth, width=width).collect()
    truth = Counter(keys)
    assert {r["key"] for r in out} == set(truth)
    for r in out:
        assert r["true_count"] == truth[r["key"]]
        assert r["est_count"] >= r["true_count"]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(min_size=0, max_size=20), min_size=1, max_size=12, unique=True
    ),
    st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=30),
)
def test_bloom_probe_no_false_negatives_arbitrary_unicode(
    shared_spark, dim_keys, fact_keys
):
    """For ANY key sets (arbitrary unicode, empty strings, overlaps),
    every fact key present in the dim survives the probe — the
    invariant that makes bloom_prune_join result-identical."""
    from semantic_ann_in_data_lake_spark.operators.bloomjoin import (
        bloom_build, bloom_probe,
    )

    dim = shared_spark.createDataFrame([(k,) for k in dim_keys], "k string")
    fact = shared_spark.createDataFrame([(k,) for k in fact_keys], "k string")
    bloom = bloom_build(dim, "k", 1024, num_hashes=4)
    surv = {r["k"] for r in bloom_probe(fact, "k", bloom, 1024, 4).collect()}
    must = set(fact_keys) & set(dim_keys)
    assert must <= surv


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=25,
             unique=True),
    st.integers(min_value=1, max_value=9),
)
def test_shard_assignment_total_and_stable(shared_spark, ids, n):
    """Every id lands in exactly one shard in [0, n); assignment is a
    pure function of (id, salt) — independent of row order."""
    from semantic_ann_in_data_lake_spark.operators.layout import assign_shards

    df = shared_spark.createDataFrame([(i,) for i in ids], "doc_id string")
    a = {r["doc_id"]: r["shard_id"] for r in
         assign_shards(df, "doc_id", n).collect()}
    from pyspark.sql import functions as F

    b = {r["doc_id"]: r["shard_id"] for r in
         assign_shards(df.orderBy(F.col("doc_id").desc()), "doc_id", n)
         .collect()}
    assert a == b and set(a) == set(ids)
    assert all(0 <= s < n for s in a.values())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=150), min_size=5, max_size=60
    ),
    st.sampled_from([0.1, 0.25, 0.5, 0.9, 1.0]),
)
def test_quantiles_from_bins_error_bound_arbitrary(shared_spark, vals, q):
    """For ANY integer sample and quantile, the histogram estimate is
    within one bin width of the exact rank statistic (edge clamping
    included: values outside [lo, lo+n·w) land in edge bins)."""
    import math

    from semantic_ann_in_data_lake_spark.operators.drift import (
        bin_counts, quantiles_from_bins,
    )

    lo, width, n_bins = 0.0, 10.0, 10
    df = shared_spark.createDataFrame([(float(v),) for v in vals], "x double")
    b = bin_counts(df, "x", lo, width, n_bins)
    est = quantiles_from_bins(b, lo, width, (q,)).collect()[0]["est"]
    srt = sorted(vals)
    exact = srt[max(0, math.ceil(q * len(srt)) - 1)]
    # clamp the exact value the way the histogram clamps its bins
    exact_clamped = min(max(float(exact), lo), lo + n_bins * width)
    assert abs(est - exact_clamped) <= width + 1e-9, (est, exact_clamped)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.text(alphabet="abc de", min_size=0, max_size=30),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=1, max_value=6),
)
def test_skew_safe_term_join_always_equals_plain_join(
    shared_spark, docs, floor, max_hot
):
    """For ANY corpus, hot floor, and head cap, the skew-safe split
    must emit exactly the plain join's row multiset — the equivalence
    the oracle hash rides on, pinned beyond the single fixture."""
    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.functions.text import words
    from semantic_ann_in_data_lake_spark.operators.textstats import (
        _skew_safe_term_join,
    )

    df = shared_spark.createDataFrame(docs, "doc_id long, text string")
    tok = df.select("doc_id", F.explode(words("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    plain = sorted(
        map(tuple, tf.join(dfreq, "term").select(
            "term", "doc_id", "tf", "df").collect())
    )
    split = sorted(
        map(tuple, _skew_safe_term_join(
            tf, dfreq, hot_df_floor=floor, max_hot=max_hot
        ).select("term", "doc_id", "tf", "df").collect())
    )
    assert split == plain


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**12))
def test_derive_nlist_known_n_properties(n):
    """derive_nlist(known_n=n): clamped to [16, 4096], monotone in n,
    and ≈ √n inside the clamp band."""
    from semantic_ann_in_data_lake_spark.operators.knn import derive_nlist

    got = derive_nlist(known_n=n)
    assert 16 <= got <= 4096
    assert got == min(4096, max(16, round(n ** 0.5)))
    assert derive_nlist(known_n=n + 1) >= got


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_grouped_running_total_matches_window_property(
    shared_spark, rows, nparts
):
    """grouped_running_total ≡ Window.partitionBy(group) cumulative sum
    for arbitrary group/weight data and partition counts — the skew-safe
    decomposition may never leak partitioning into the totals."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from semantic_ann_in_data_lake_spark.operators.packing import (
        grouped_running_total,
    )

    data = [(g, i, w) for i, (g, w) in enumerate(rows)]
    df = shared_spark.createDataFrame(data, "g string, id long, w long")
    win = (
        Window.partitionBy("g")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["g"], r["id"]): r["run"]
        for r in df.withColumn("run", F.sum("w").over(win)).collect()
    }
    got = {
        (r["g"], r["id"]): r["running"]
        for r in grouped_running_total(
            df, "g", [F.col("id").asc()], "w", num_partitions=nparts
        ).collect()
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.text(alphabet="abcdefg", min_size=11, max_size=24),
    st.text(alphabet="hijklm ", min_size=0, max_size=30),
    st.text(alphabet="nopqrs ", min_size=0, max_size=30),
)
def test_winnowing_guarantee_planted_substring(
    shared_spark, shared, pre, suf
):
    """The winnowing GUARANTEE (Schleimer et al. 2003): two documents
    sharing a verbatim run of >= w+k-1 = 11 chars share at least one
    fingerprint — for ARBITRARY planted substrings and flanks.
    (Flank alphabets are disjoint from the shared alphabet so
    whitespace normalization cannot shorten the planted run.)"""
    from semantic_ann_in_data_lake_spark.operators.winnow import (
        winnow_fingerprints,
    )

    docs = shared_spark.createDataFrame(
        [(1, f"{pre} {shared}"), (2, f"{shared} {suf}")],
        "doc_id long, text string",
    )
    got = {}
    for r in winnow_fingerprints(docs, k=8, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got.get(1, set()) & got.get(2, set())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_kcenter_contract_and_cover_arbitrary_points(
    shared_spark, pts, k
):
    """For arbitrary point sets: the invariant checker returns empty
    (true farthest-first traversal) and the covering certificate
    holds — every point sits within the LAST selected radius of some
    center (the greedy's monotonicity makes radius_k an upper bound
    on the remaining cover radius)."""
    import math

    from semantic_ann_in_data_lake_spark.operators.coreset import (
        kcenter_coreset,
        kcenter_invariant_violations,
    )

    emb = shared_spark.createDataFrame(
        [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    centers = kcenter_coreset(emb, k=k).collect()
    assert kcenter_invariant_violations(
        shared_spark.createDataFrame(centers), emb
    ).count() == 0
    if len(centers) > 1:
        cvecs = {r["vec_id"] for r in centers}
        last_r = max(r["radius"] for r in centers if r["center_rank"] > 1)
        pts_by_id = {i: (float(x), float(y)) for i, (x, y) in enumerate(pts)}
        for i, p in pts_by_id.items():
            d = min(
                math.dist(p, pts_by_id[c]) for c in cvecs
            )
            assert d <= last_r + 1e-9, (i, d, last_r)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="xyz", min_size=0, max_size=3),
        min_size=1,
        max_size=15,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_sorted_neighborhood_definition_arbitrary_keys(
    shared_spark, keys, w
):
    """For arbitrary (duplicate-heavy) key lists and window sizes, the
    blocked pair set equals EXACTLY {(a,b): 0 < rank_b - rank_a < w}
    under the (key, id) total order."""
    from semantic_ann_in_data_lake_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    rows = list(enumerate(keys))
    df = shared_spark.createDataFrame(rows, "uid long, key string")
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    rank = {uid: i + 1 for i, (uid, _) in enumerate(order)}
    want = {
        (a, b) for a in rank for b in rank if 0 < rank[b] - rank[a] < w
    }
    got = {
        (r["uid_a"], r["uid_b"])
        for r in sorted_neighborhood_pairs(
            df, ["key"], "uid", window=w
        ).collect()
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="pq r", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from([0.5, 0.8, 1.0]),
)
def test_containment_prefix_join_matches_bruteforce_random(
    shared_spark, texts, tau
):
    """The containment prefix filter equals brute-force all-ordered-
    pairs shingle containment on arbitrary text (tiny vocab ->
    maximal shingle-frequency ties), with the operator's exact
    float-boundary bias mirrored."""
    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.functions.text import (
        word_shingles_from,
        words,
    )
    from semantic_ann_in_data_lake_spark.operators.setjoin import (
        containment_prefix_join,
    )

    docs = shared_spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sets = docs.select(
        "doc_id", word_shingles_from(words("text"), 3).alias("sh")
    ).where(F.size("sh") > 0)
    a = sets.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"),
        F.size("sh").alias("za"),
    )
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") != F.col("id_b"))
        .where(
            inter.cast("double")
            >= F.lit(tau) * F.col("za").cast("double") - F.lit(1e-9)
        )
        .collect()
    }
    got = {
        (r["id_contained"], r["id_container"])
        for r in containment_prefix_join(docs, threshold=tau).collect()
    }
    assert got == brute


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=20),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=40),
)
def test_token_budget_respected_under_either_tokenizer(
    shared_spark, texts, quota
):
    """select_to_token_budget admits exactly the greedy prefix of each
    group — every admitted row's cum_before is under the quota and the
    admitted SET equals the Python reference walk — whether tokens are
    counted by the whitespace tier or through the exact-BPE tokenizer
    seam (the budget must be enforced in whatever units the seam
    bills)."""
    from pyspark.sql import functions as F

    from semantic_ann_in_data_lake_spark.functions.bpe import (
        BpeTokenizer,
        train_bpe,
    )
    from semantic_ann_in_data_lake_spark.operators.packing import (
        select_to_token_budget,
        token_counts,
    )

    docs = shared_spark.createDataFrame(
        [(i, t, "g") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    quotas = shared_spark.createDataFrame(
        [("g", quota)], "source string, alloc_tokens long"
    )
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    merges = train_bpe(freqs or {"a": 1}, 10)

    for factory in (None, lambda: BpeTokenizer(merges)):
        counts = {
            r["doc_id"]: r["n_tokens"]
            for r in token_counts(docs, tokenizer=factory).collect()
        }
        # Python reference: walk ids ascending, admit while the running
        # total BEFORE the row is under quota
        want, run = set(), 0
        for i in sorted(counts):
            if run < quota:
                want.add(i)
            run += counts[i]
        base = (
            docs
            if factory is not None
            else docs.join(
                token_counts(docs).withColumnRenamed("doc_id", "doc_id"),
                "doc_id",
            )
        )
        sel = select_to_token_budget(
            base,
            quotas,
            group_col="source",
            order_cols=[F.col("doc_id").asc()],
            tokenizer=factory,
        ).collect()
        got = {r["doc_id"] for r in sel}
        assert got == want, (factory is None, counts, quota, got, want)
        assert all(r["cum_before"] < quota for r in sel)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=2, max_value=3),
)
def test_duplicated_span_rewrite_matches_python_model(
    shared_spark, token_docs, n
):
    """duplicated_span_rewrite == a brute-force Python model of the
    canonical-occurrence excision rule (every position covered by a
    non-canonical duplicated n-gram occurrence is removed) for
    arbitrary tiny corpora — including self-repeats, full-document
    collapses, and sub-n documents."""
    from semantic_ann_in_data_lake_spark.operators.spans import (
        duplicated_span_rewrite,
    )

    toks = {i: list(ws) for i, ws in enumerate(token_docs)}
    occs: dict[tuple, list[tuple[int, int]]] = {}
    for d, w in toks.items():
        for p in range(len(w) - n + 1):
            occs.setdefault(tuple(w[p : p + n]), []).append((d, p + 1))
    covered: set[tuple[int, int]] = set()
    for g, os_ in occs.items():
        c = min(os_)
        for d, p in os_:
            if (d, p) != c:
                covered.update((d, j) for j in range(p, p + n))
    want = {}
    for d, w in toks.items():
        kept = [t for j, t in enumerate(w, start=1) if (d, j) not in covered]
        want[d] = (len(w), len(w) - len(kept), " ".join(kept))

    docs = shared_spark.createDataFrame(
        [(d, " ".join(w)) for d, w in toks.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in duplicated_span_rewrite(docs, n=n).collect()
    }
    assert got == want, (toks, n, got, want)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcxyz09", min_size=1, max_size=6),
        min_size=1,
        max_size=4,
    ),
    st.sampled_from([None, "co.uk", "com.au", "co.jp", "com.br", "co.in"]),
)
def test_registrable_domain_matches_python_model(
    shared_spark, labels, suffix
):
    """registrable_domain == a direct Python model of the eTLD+1 rule
    (last two labels; last three when the host ends in a recognised
    multi-label public suffix; NULL when the host IS a public suffix)
    for arbitrary label stacks with and without multi-label
    suffixes."""
    from semantic_ann_in_data_lake_spark.operators.domains import (
        MULTI_LABEL_SUFFIXES,
        registrable_domain,
    )

    host = ".".join(labels + ([suffix] if suffix else []))

    parts = host.split(".")
    if host in MULTI_LABEL_SUFFIXES:
        want = None
    else:
        take3 = any(
            host.endswith("." + s) for s in MULTI_LABEL_SUFFIXES
        ) and len(parts) >= 3
        keep = 3 if take3 else min(len(parts), 2)
        want = ".".join(parts[-keep:])

    df = shared_spark.createDataFrame([(host,)], "host string")
    got = df.select(registrable_domain("host").alias("d")).collect()[0]["d"]
    assert got == want, (host, got, want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=600), max_size=5),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=120),
)
def test_watermark_replay_matches_python_model(
    shared_spark, batches_sec, delay
):
    """watermark_metrics_replay == a pure-Python fold of the advance
    rule (watermark = max prior event second − delay; late = events
    strictly behind it) for arbitrary batch sequences including empty
    batches and out-of-order arrivals."""
    from datetime import datetime, timedelta

    from semantic_ann_in_data_lake_spark.streaming.observe_stream import (
        watermark_metrics_replay,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    schema = (
        "event_id string, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    frames = [
        shared_spark.createDataFrame(
            [
                (f"e{i}{j}", t0 + timedelta(seconds=s), 1, "v", 1.0, "{}")
                for j, s in enumerate(secs)
            ],
            schema,
        )
        for i, secs in enumerate(batches_sec)
    ]
    got = watermark_metrics_replay(frames, delay_seconds=delay)

    seen_max = None
    for secs, g in zip(batches_sec, got):
        wm = None if seen_max is None else seen_max - delay
        assert g["n_rows"] == len(secs)
        assert g["max_event_us"] == (
            None if not secs else (max(secs) * 1_000_000
                                   + int(t0.timestamp()) * 1_000_000)
        )
        # t0.timestamp() is UTC-exact here: the container clock and the
        # pinned Spark session zone are both UTC, so naive-datetime
        # epoch math and epoch_us agree
        if wm is None:
            assert g["watermark_us"] is None
        else:
            assert g["watermark_us"] == (
                wm * 1_000_000 + int(t0.timestamp()) * 1_000_000
            )
        want_late = 0 if wm is None else sum(1 for s in secs if s < wm)
        assert g["late_rows"] == want_late, (secs, wm, g)
        if secs and (seen_max is None or max(secs) > seen_max):
            seen_max = max(secs)


@st.composite
def _random_digraph(draw):
    """Small random directed graph as an edge list (no self loops,
    deduped); node ids from a small pool so structure is dense enough
    to be interesting."""
    n = draw(st.integers(min_value=2, max_value=8))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=n),
                st.integers(min_value=1, max_value=n),
            ).filter(lambda e: e[0] != e[1]),
            min_size=1,
            max_size=16,
            unique=True,
        )
    )
    return edges


@settings(max_examples=12, deadline=None)
@given(_random_digraph())
def test_lpa_matches_python_model_on_random_graphs(shared_spark, edges):
    """Deterministic LPA (most-frequent neighbor label, smallest-label
    ties, isolated keep) equals a direct python model for any graph."""
    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        lpa_communities,
        symmetrize,
    )

    und = {(s, d) for s, d in edges} | {(d, s) for s, d in edges}
    nodes = sorted({v for e in und for v in e})
    lab = {v: v for v in nodes}
    for _ in range(3):
        new = {}
        for v in nodes:
            counts = {}
            for s, d in und:
                if d == v:
                    counts[lab[s]] = counts.get(lab[s], 0) + 1
            new[v] = (
                min(
                    (c for c in counts),
                    key=lambda c: (-counts[c], c),
                )
                if counts
                else lab[v]
            )
        lab = new

    df = shared_spark.createDataFrame(list(edges), "query_id bigint, cand_id bigint")
    got = {
        r["node"]: r["community"]
        for r in lpa_communities(symmetrize(df), iters=3).collect()
    }
    assert got == lab


@settings(max_examples=12, deadline=None)
@given(_random_digraph())
def test_kcore_matches_python_model_on_random_graphs(shared_spark, edges):
    from semantic_ann_in_data_lake_spark.operators.graphrank import (
        kcore,
        symmetrize,
    )

    und = {(s, d) for s, d in edges} | {(d, s) for s, d in edges}

    es = set(und)
    while True:
        deg = {}
        for s, _ in es:
            deg[s] = deg.get(s, 0) + 1
        drop = {v for v, dg in deg.items() if dg < 2}
        if not drop:
            want = deg
            break
        es = {(s, d) for s, d in es if s not in drop and d not in drop}
        if not es:
            want = {}
            break

    df = shared_spark.createDataFrame(list(edges), "query_id bigint, cand_id bigint")
    got = {
        r["node"]: r["degree"]
        for r in kcore(symmetrize(df), k=2, rounds=None).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_random_digraph())
def test_pagerank_mass_conserved_on_random_graphs(shared_spark, edges):
    """With dangling redistribution, total rank is always ~1 no matter
    the topology (the property the textbook treatment exists for)."""
    from semantic_ann_in_data_lake_spark.operators.graphrank import pagerank

    df = shared_spark.createDataFrame(list(edges), "src bigint, dst bigint")
    rows = pagerank(df, iters=3).collect()
    assert abs(sum(r["pr"] for r in rows) - 1.0) < 1e-7


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_png_roundtrip_arbitrary_images(w, h, data):
    """decode(encode(img)) == img for arbitrary RGB rasters, including
    the 1-wide / 1-tall edges where the Sub/Paeth left and upper-left
    neighbors fall off the raster (the codec's off-by-three traps)."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        decode_png,
        encode_png_rgb8,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=3 * w * h,
                max_size=3 * w * h,
            )
        )
    )
    img = decode_png(encode_png_rgb8(w, h, px))
    assert (img["width"], img["height"], img["pixels"]) == (w, h, px)


@settings(max_examples=40, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192_000),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=200
    ),
)
def test_wav_roundtrip_arbitrary_waveforms(rate, samples):
    """decode(encode(xs)) == xs for arbitrary int16 waveforms including
    the empty clip (a zero-length data chunk is legal RIFF)."""
    from semantic_ann_in_data_lake_spark.operators.multimodal import (
        decode_audio,
        encode_wav_pcm16,
    )

    wav = decode_audio(encode_wav_pcm16(rate, samples))
    assert wav["sample_rate"] == rate
    assert wav["samples"] == samples
