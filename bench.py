"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Queries mix the oracle-gated plans (relational aggs, joins, windows,
profiling, evaluation pipeline) with the PRODUCTION-path variants of
the scale operators (broadcast kNN, xxhash64 MinHash-LSH/SimHash) —
bench measures the fast tier, the correctness gate pins the portable
tier, and unit tests prove the tiers agree where exact.

Naming convention (round 11, VERDICT r10 task 8): every bench key is a
REGISTRY name, optionally followed by documented posture suffixes from
:data:`BENCH_SUFFIXES` (``_k10`` = production k, ``_warm`` =
amortized prefit, ``_bcast``/``_lsh`` = strategy posture, ``_fast`` =
xxhash64 tier, ``_w64`` = window posture, ``_csv`` = text-scan tier)
— so cross-round diffs map bench rows to registry entries
mechanically. Pinned by tests/test_plans.py.

Suite composition = the FIXED headline core (bench_queries) + a
CONTINUITY set (every key of the previous round's official inline
record, re-measured as core so consecutive official records and the
driver's same-round c8/c32 scaling pair share a stable inline key set
— VERDICT r11 item 2) + a STALEST-FIRST ROTATION over every registry
entry the core doesn't cover (VERDICT r10 task 2): each round benches
the half of the uncovered pool whose last committed measurement is
oldest (tracked in BENCH_COVERAGE.json), so every registry entry gets
a measured sf-curve at least every 2 rounds. Override the rotation
size with SPARK_GRAFT_BENCH_ROTATE (0 disables). The inline stdout
record carries core + continuity keys only (rotation membership is
per-round; its timings live in BENCH_DETAIL.json); the headline
``value`` covers the FIXED core alone, unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from semantic_ann_in_data_lake_spark.cache import (  # noqa: E402
    cache_scope,
    scoped_persist,
)
from semantic_ann_in_data_lake_spark.operators import dedup  # noqa: E402
from semantic_ann_in_data_lake_spark.operators.knn import knn_join  # noqa: E402
from semantic_ann_in_data_lake_spark.plans import pipeline, registry  # noqa: E402
from semantic_ann_in_data_lake_spark.session import get_spark  # noqa: E402
from semantic_ann_in_data_lake_spark.sources.readers import read_table  # noqa: E402


#: Quadratic-BY-CONSTRUCTION suite entries: each scores (or embeds a
#: stage that scores) all |Q|·|C| pairs on purpose — they are the
#: exactness baselines the ANN tiers are judged against, or recall
#: audits that contain the exact baseline as a term. Their sf-curve
#: ratio is expected to approach n² (pair-op envelope: |Q|·|C| grows
#: 100× for 10× data; wall-clock lands anywhere under that depending
#: on BLAS/layout) and is NOT a regression signal — the artifact tags
#: them so a hot shot (e.g. knn_broadcast_k10's 13× in r8 vs 2.1× in
#: r7, same code) stops re-triggering audits. Every member has a
#: sub-quadratic production twin in the same suite, and the auto
#: dispatcher's byte+pair budgets route oversized calls away from
#: them (PERF.md "exact-baseline family").
EXACT_BASELINE_FAMILY = frozenset(
    {
        "semantic_search_docs_bcast",  # twin: semantic_search_docs_lsh
        "knn_broadcast_l2_k10",           # twin: knn_lsh/ivf/pq tiers
        "knn_pq_l2_k10",                  # ADC broadcast still scores all pairs; twin: knn_ivf_pq_k10
        "hard_negatives_embeddings_bcast",        # twin: ANN strategies of hard_negative_mine
        "bitext_mine_en_de_bcast",           # twin: ANN strategies of mine_bitext
        "semlink_eval_bcast",            # evaluation harness (exact grid leg)
        "grid_eval_discovery_bcast",           # evaluation harness (exact grid leg)
        "ivf_recall_report",           # audit: embeds the exact top-5 baseline
        "ivf_lloyd_recall_report",     # audit: embeds the exact top-5 baseline
        "pq_recall_report",            # audit: exact baseline + quantized rescan
        # rotation-visible registry anchors, quadratic by construction:
        # exact-tier gates, recall audits embedding the exact baseline,
        # and evaluation pipelines whose truth/knn legs are all-pairs
        "knn_exact_l2",
        "knn_broadcast_l2",
        "knn_auto_l2",                 # routes to broadcast at gate scale
        "knn_ivf_probeall_l2",         # exact semantics, all cells probed
        "lsh_recall_report",
        "nndescent_recall_report",
        "graph_search_recall_report",  # exact corpus graph + exact baseline
        "deepjoin_eval",
        "deepjoin_train_eval",         # pair fit Σ|g|² + exact kNN corpus
        "semlink_eval",
        "grid_eval_discovery",
    }
)


#: documented posture suffixes a bench key may append to its registry
#: name (see module doc); order matters only for stripping
BENCH_SUFFIXES = ("_k10_warm", "_k10", "_warm", "_bcast", "_lsh",
                  "_fast", "_w64", "_csv", "_native")


def registry_base(bench_name: str) -> str | None:
    """The registry entry a bench key measures: the key itself, or the
    key stripped of one documented posture suffix. None if neither
    resolves — a naming-convention violation (pinned in tests)."""
    if bench_name in registry.REGISTRY:
        return bench_name
    for suf in BENCH_SUFFIXES:
        if bench_name.endswith(suf):
            base = bench_name[: -len(suf)]
            if base in registry.REGISTRY:
                return base
    return None


#: cross-call cache for the amortized-fit (*_warm) bench entries;
#: keyed by sf_dir so the sf-curve pass refits on its own corpus
_WARM_MODELS: dict = {}


def bench_queries(spark, sf_dir):
    reg = registry.REGISTRY

    def from_registry(name):
        fn, _ = reg[name]
        return lambda: fn(spark, sf_dir)

    def knn_broadcast():
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(emb, emb, k=10, strategy="broadcast")

    def knn_lsh():
        # Production posture: hot-bucket cap on. Duplicate-heavy corpora
        # (the sf1 fixture is 10x copies — deliberately the worst case)
        # collapse near-identical vectors into the same buckets, and an
        # uncapped bucket's per-cogroup BLAS grows quadratically in the
        # duplication factor (measured: ratio 22-74 at sf0.1->sf1
        # uncapped vs ~linear capped; SCALING_sf1.json + PERF.md).
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(emb, emb, k=10, strategy="lsh", max_bucket_size=1000)

    def knn_ivf():
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(emb, emb, k=10, strategy="ivf")

    def knn_pq_bench():
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(emb, emb, k=10, strategy="pq")

    def knn_ivf_pq_bench():
        from semantic_ann_in_data_lake_spark.operators.pq import knn_ivf_pq

        emb = read_table(spark, sf_dir, "embeddings")
        # nlist derived from the candidate count (≈√n) — the fixed
        # nlist=16 posture re-approached |Q|·|C| per cell at sf1 (7.4×,
        # VERDICT r5 item 5)
        return knn_ivf_pq(emb, emb, k=10, nprobe=8)

    def knn_ivf_pq_refine_bench():
        # production posture of the refine tier: derived nlist, ADC
        # shortlist 3·k, exact re-rank on raw vectors (n·3k pairs)
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(
            emb, emb, k=10, strategy="ivf_pq_refine", nprobe=8,
            refine_factor=3,
        )

    def knn_pca_refine_bench():
        # rotate->compress->refine production posture: PCA top-32
        # subspace (one covariance pass + driver eigh), IVF shortlist
        # in the reduced space, exact re-rank on raw vectors
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(
            emb, emb, k=10, strategy="pca_refine", nprobe=8,
            refine_factor=3,
        )

    def knn_opq_refine_bench():
        # OPQ production posture: energy-interleaved rotation, IVF-PQ
        # shortlist on rotated vectors, exact re-rank on raw
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_join(
            emb, emb, k=10, strategy="opq_refine", nprobe=8,
            refine_factor=3,
        )

    def _prefit_models():
        # amortized-fit posture (VERDICT r9 task #7): production callers
        # fit the PCA/OPQ rotation once and reuse it across queries via
        # model=. Fit here, at suite-construction time (UNTIMED), so the
        # *_warm entries report the steady-state probe+refine cost while
        # the cold entries keep tracking the honest fit-included number.
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            pca_fit,
        )

        if _WARM_MODELS.get("sf_dir") != sf_dir:
            emb = read_table(spark, sf_dir, "embeddings")
            _WARM_MODELS.clear()
            _WARM_MODELS["sf_dir"] = sf_dir
            _WARM_MODELS["pca32"] = pca_fit(emb, m=32)
            _WARM_MODELS["pca_full"] = pca_fit(emb)
        return _WARM_MODELS

    def knn_pca_refine_warm():
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            knn_pca_refine,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        return knn_pca_refine(
            emb, emb, k=10, nprobe=8, refine_factor=3,
            model=_prefit_models()["pca32"],
        )

    def knn_opq_refine_warm():
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            knn_opq_refine,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        return knn_opq_refine(
            emb, emb, k=10, nprobe=8, refine_factor=3,
            model=_prefit_models()["pca_full"],
        )

    def knn_nndescent_refine_bench():
        # build-on-compressed / rank-on-raw: descent at 3x degree in
        # the top-32 principal subspace, exact d-dim re-rank
        from semantic_ann_in_data_lake_spark.operators.embedproj import (
            knn_nndescent_refine,
        )

        # production posture: rf=2 with the reverse cap held at the
        # shortlist degree — descent fan-out is (k·rf + rk)² per node,
        # so an uncapped rk=3·k·rf would cost 4x this for ~the same
        # top-10 after the exact re-rank
        emb = read_table(spark, sf_dir, "embeddings")
        return knn_nndescent_refine(
            emb, k=10, refine_factor=2, iters=3, reverse_cap=20,
            model=_prefit_models()["pca32"],
        )

    def knn_nndescent_bench():
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        return nndescent_knn_graph(emb, k=10, iters=3)

    def pagerank_bench():
        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            pagerank,
            symmetrize,
        )
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        edges = symmetrize(nndescent_knn_graph(emb, k=5, iters=2))
        return pagerank(edges, iters=5)

    def hits_bench():
        from semantic_ann_in_data_lake_spark.operators.graphrank import hits
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )
        from pyspark.sql import functions as F

        emb = read_table(spark, sf_dir, "embeddings")
        g = nndescent_knn_graph(emb, k=5, iters=2)
        return hits(
            g.select(
                F.col("query_id").alias("src"), F.col("cand_id").alias("dst")
            ),
            iters=5,
        )

    def kcore_bench():
        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            kcore,
            symmetrize,
        )
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        edges = symmetrize(nndescent_knn_graph(emb, k=5, iters=2))
        return kcore(edges, k=6, rounds=2)

    def _nnd_edges():
        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            symmetrize,
        )
        from semantic_ann_in_data_lake_spark.operators.nndescent import (
            nndescent_knn_graph,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        return symmetrize(nndescent_knn_graph(emb, k=5, iters=2))

    def trustrank_bench():
        from pyspark.sql import functions as F

        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            trustrank,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        seeds = (
            emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(16)
            .select(F.col("vec_id").alias("node"))
        )
        return trustrank(_nnd_edges(), seeds, iters=5)

    def bfs_layers_bench():
        from pyspark.sql import functions as F

        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            bfs_layers,
        )

        emb = read_table(spark, sf_dir, "embeddings")
        seeds = (
            emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(16)
            .select(F.col("vec_id").alias("node"))
        )
        return bfs_layers(_nnd_edges(), seeds, rounds=4)

    def doulion_bench():
        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            triangle_count_doulion,
        )

        return triangle_count_doulion(_nnd_edges(), p_mille=500)

    def hyperanf_bench():
        from semantic_ann_in_data_lake_spark.operators.graphrank import (
            hyperanf,
        )

        return hyperanf(_nnd_edges(), rounds=4)

    def minhash_fast():
        # Production posture: hot-bucket cap on, like knn_lsh above.
        # Uncapped, per-bucket exact verification grows quadratically in
        # duplicate density (the sf1 fixture is 10× copies — worst
        # case; measured 11.1× sf0.1→sf1 uncapped, VERDICT r5 item 4).
        # Recall trade: pairs whose every shared band lands in a
        # >1000-member bucket are skipped; within a capped bucket a
        # deterministic hash-ordered star sample still links the
        # duplicate cluster (dedup.py hot-bucket policy), so exact
        # duplicates remain connected — the cap loses only low-sim
        # borderline pairs inside mega-clusters.
        docs = read_table(spark, sf_dir, "documents")
        return dedup.minhash_near_dups(
            docs, num_hashes=16, bands=8, rows_per_band=2,
            threshold=0.01, hash_portable=False, max_bucket_size=1000,
        )

    def simhash_fast():
        docs = read_table(spark, sf_dir, "documents")
        return dedup.simhash(docs, bits=32, hash_portable=False)

    def doc_search_broadcast():
        from pyspark.sql import functions as FF

        from semantic_ann_in_data_lake_spark.annotate.embedder import (
            hash_embedding_expr,
        )

        d = read_table(spark, sf_dir, "documents")
        emb = scoped_persist(
            d.select(
                FF.col("doc_id").alias("vec_id"),
                hash_embedding_expr("text", 8).alias("embedding"),
            )
        )
        return knn_join(emb, emb, k=3, metric="cosine", strategy="broadcast")

    def doc_search_lsh():
        # The SCALE path for the same workload as doc_search_broadcast:
        # the broadcast tier scores |Q|x|C| pairs (quadratic by design —
        # it is the exactness baseline the ANN tiers are judged against;
        # its sf-curve ratio ~n² is expected, see SCALING_sf1.json),
        # while the LSH tier buckets first and scales near-linearly.
        from pyspark.sql import functions as FF

        from semantic_ann_in_data_lake_spark.annotate.embedder import (
            hash_embedding_expr,
        )

        d = read_table(spark, sf_dir, "documents")
        emb = scoped_persist(
            d.select(
                FF.col("doc_id").alias("vec_id"),
                hash_embedding_expr("text", 8).alias("embedding"),
            )
        )
        return knn_join(
            emb, emb, k=3, metric="cosine", strategy="lsh",
            max_bucket_size=1000,
        )

    def chunk_docs_bench():
        from semantic_ann_in_data_lake_spark.operators.chunking import (
            chunk_documents,
        )

        docs = read_table(spark, sf_dir, "documents")
        return chunk_documents(docs, window=64, stride=32)

    def semlink_eval_broadcast():
        return pipeline.evaluate_discovery(
            spark, sf_dir, k=10, tau=1.3, strategy="broadcast"
        )

    def grid_eval_broadcast():
        return pipeline.grid_evaluate_discovery(spark, sf_dir, strategy="broadcast")

    def csv_scan_pricing():
        # cross-format tier: the q1 aggregation over a CSV copy of
        # lineitem (materialized once, untimed, in main()) — measures
        # the text-scan + cast path against the parquet numbers above
        csv_dir = _csv_copy_dir(sf_dir)
        li = (
            spark.read.option("header", True)
            .schema(
                "l_quantity double, l_extendedprice double, l_discount double, "
                "l_returnflag string, l_linestatus string"
            )
            .csv(csv_dir)
        )
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n"),
        )

    def bitext_bcast():
        # production posture of bitext_mine_en_de: ANN broadcast tier
        # for both directional top-k passes (the registry entry's exact
        # cross-join is the oracle baseline, quadratic by design)
        from pyspark.sql import functions as FF

        from semantic_ann_in_data_lake_spark.annotate.embedder import (
            hash_embedding_expr,
        )
        from semantic_ann_in_data_lake_spark.operators.bitext import (
            mine_bitext,
        )

        d = read_table(spark, sf_dir, "documents")

        def emb(lang):
            return scoped_persist(
                d.where(F.col("lang") == lang).select(
                    "doc_id", hash_embedding_expr("text", 8).alias("embedding")
                )
            )

        return mine_bitext(
            emb("en"), emb("de"), k=4, margin_tau=1.0, strategy="broadcast"
        )

    def hard_negatives_bcast():
        # production tier of hard_negatives_embeddings: broadcast ANN
        # instead of the exact cross join
        from pyspark.sql import functions as FF

        from semantic_ann_in_data_lake_spark.operators.negatives import (
            hard_negative_mine,
        )

        emb = scoped_persist(read_table(spark, sf_dir, "embeddings"))
        positives = (
            emb.alias("a")
            .join(
                emb.alias("b"),
                FF.expr("a.label = b.label AND a.vec_id < b.vec_id"),
            )
            .select(
                FF.col("a.vec_id").alias("a_id"),
                FF.col("b.vec_id").alias("b_id"),
            )
        )
        return hard_negative_mine(
            emb, positives, "vec_id", "embedding", k_neg=3, slack=10,
            metric="cosine", strategy="broadcast",
        )

    def wav_decode_native():
        # native-codec seam A/B row (VERDICT r10 task 5): same decode
        # workload as wav_decode_stats but through the stdlib-wave
        # backed decoder injected via the seam — the per-round measure
        # of what a native codec buys over the pure-Python gate tier
        from semantic_ann_in_data_lake_spark.operators.multimodal import (
            audio_decode_stats,
            native_audio_decoder,
            synthesize_wav_media,
        )

        docs = read_table(spark, sf_dir, "documents")
        return audio_decode_stats(
            synthesize_wav_media(docs), decode_fn=native_audio_decoder()
        )

    _prefit_models()  # untimed: amortized rotations for the *_warm twins

    return {
        "q1_pricing_summary": from_registry("q1_pricing_summary"),
        "q3_top_orders": from_registry("q3_top_orders"),
        "q5_local_supplier": from_registry("q5_local_supplier"),
        "profile_lineitem": from_registry("profile_lineitem"),
        "window_topk_orders": from_registry("window_topk_orders"),
        "events_hourly_rollup": from_registry("events_hourly_rollup"),
        "dedup_exact": from_registry("dedup_exact"),
        "doc_token_stats": from_registry("doc_token_stats"),
        "lang_id": from_registry("lang_id"),
        "hash_embeddings": from_registry("hash_embeddings"),
        "q6_forecast_revenue": from_registry("q6_forecast_revenue"),
        "q18_large_volume_customers": from_registry("q18_large_volume_customers"),
        "profile_lake_core": from_registry("profile_lake_core"),
        "semantic_search_docs_bcast": doc_search_broadcast,
        "semantic_search_docs_lsh": doc_search_lsh,
        "sessionize_events": from_registry("sessionize_events"),
        "knn_broadcast_l2_k10": knn_broadcast,
        "knn_lsh_l2_k10": knn_lsh,
        "knn_ivf_l2_k10": knn_ivf,
        "minhash_lsh_pairs_fast": minhash_fast,
        "simhash_codes_fast": simhash_fast,
        "semlink_eval_bcast": semlink_eval_broadcast,
        "grid_eval_discovery_bcast": grid_eval_broadcast,
        "chunk_docs_w64": chunk_docs_bench,
        "tfidf_top_terms": from_registry("tfidf_top_terms"),
        "asof_join_events": from_registry("asof_join_events"),
        "doc_repetition_stats": from_registry("doc_repetition_stats"),
        "pii_scrub_docs": from_registry("pii_scrub_docs"),
        "q13_order_distribution": from_registry("q13_order_distribution"),
        "q19_disjunctive_revenue": from_registry("q19_disjunctive_revenue"),
        "q1_pricing_summary_csv": csv_scan_pricing,
        "lake_join_discovery": from_registry("lake_join_discovery"),
        # round-3 operators: leak check, packing, skew/band joins, layout
        "decontaminate_docs": from_registry("decontaminate_docs"),
        "pack_sequences_docs": from_registry("pack_sequences_docs"),
        # round-7: mixture assembly (grouped distributed prefix sum),
        # quartile curation profile, multimodal resize plumbing
        "budget_select_docs": from_registry("budget_select_docs"),
        "quality_quartiles_by_source": from_registry("quality_quartiles_by_source"),
        "media_resize_plan": from_registry("media_resize_plan"),
        "media_audio_windows": from_registry("media_audio_windows"),
        "replay_mix_docs": from_registry("replay_mix_docs"),
        "dsir_select_docs": from_registry("dsir_select_docs"),
        "semdedup_check": from_registry("semdedup_check"),
        "winnow_overlap_pairs": from_registry("winnow_overlap_pairs"),
        "record_linkage_scores": from_registry("record_linkage_scores"),
        "kcenter_check": from_registry("kcenter_check"),
        "char_entropy_docs": from_registry("char_entropy_docs"),
        "curation_funnel_docs": from_registry("curation_funnel_docs"),
        "bm25_search_docs": from_registry("bm25_search_docs"),
        "band_join_view_purchase": from_registry("band_join_view_purchase"),
        "salted_heavy_user_rollup": from_registry("salted_heavy_user_rollup"),
        "zorder_key_orders": from_registry("zorder_key_orders"),
        "cross_corpus_near_dups": from_registry("cross_corpus_near_dups"),
        "centroid_per_source": from_registry("centroid_per_source"),
        # round-4 operators. The two similarity JOINS are benched via
        # their bounded registry shapes only: on this deliberately
        # duplicate-heavy corpus a low-τ/d self-join's TRUE answer is
        # ~10⁶-10⁷ pairs (output-bound, not algorithm-bound — measured
        # 964k exact pairs at τ=0.9 even after exact-dedup); production
        # runs dedup_exact first and high τ/d — see PERF.md.
        "dup_span_fraction": from_registry("dup_span_fraction"),
        "bigram_lm_scores": from_registry("bigram_lm_scores"),
        "resample_interpolate_user_value": from_registry("resample_interpolate_user_value"),
        "fuzzy_join_part_names": from_registry("fuzzy_join_part_names"),
        "equidepth_histogram_totalprice": from_registry("equidepth_histogram_totalprice"),
        "winsorized_stats_totalprice": from_registry("winsorized_stats_totalprice"),
        "scd2_user_state": from_registry("scd2_user_state"),
        "event_transition_matrix": from_registry("event_transition_matrix"),
        "knn_pq_l2_k10": knn_pq_bench,
        "knn_ivf_pq_l2_k10": knn_ivf_pq_bench,
        # round-4 continuation: boilerplate rewrite, containment
        # discovery, sketches, hybrid retrieval
        "segment_dedup_rewrite": from_registry("segment_dedup_rewrite"),
        "value_overlap_join_discovery": from_registry("value_overlap_join_discovery"),
        "cms_heavy_hitters_events": from_registry("cms_heavy_hitters_events"),
        "hybrid_search_rrf": from_registry("hybrid_search_rrf"),
        # round-4 continuation 2: scan-stage pruning + corpus alignment
        "bloom_prune_join_orders": from_registry("bloom_prune_join_orders"),
        "dpp_partitioned_join_prune": from_registry("dpp_partitioned_join_prune"),
        "bitext_mine_en_de_bcast": bitext_bcast,
        "psi_drift_snapshots": from_registry("psi_drift_snapshots"),
        "ewma_user_value": from_registry("ewma_user_value"),
        "join_size_orders_lineitem": from_registry("join_size_orders_lineitem"),
        "hard_negatives_embeddings_bcast": hard_negatives_bcast,
        # round-4 continuation 3: reports, diffs, leak-safe splits
        "corpus_datacard": from_registry("corpus_datacard"),
        "table_diff_orders": from_registry("table_diff_orders"),
        "leakage_safe_split_docs": from_registry("leakage_safe_split_docs"),
        "quantiles_from_bins_totalprice": from_registry("quantiles_from_bins_totalprice"),
        # round-8: recall meta-gates (quadratic-by-design audit queries —
        # each embeds the exact broadcast baseline by construction)
        "ivf_recall_report": from_registry("ivf_recall_report"),
        "pq_recall_report": from_registry("pq_recall_report"),
        # round-8: domain-aware curation (row-local parse + anti join +
        # capped window)
        "domain_curation_docs": from_registry("domain_curation_docs"),
        "quality_threshold_sweep": from_registry("quality_threshold_sweep"),
        "pack_sequences_bpe_docs": from_registry("pack_sequences_bpe_docs"),
        "gopher_rules_docs": from_registry("gopher_rules_docs"),
        # round-9: exact-substring dedup rewrite, the IVF-PQ refine
        # tier (production posture), the trained-fit recall audit, and
        # the real PPM decode stage
        "dedup_span_rewrite": from_registry("dedup_span_rewrite"),
        "knn_ivf_pq_refine_l2_k10": knn_ivf_pq_refine_bench,
        "ivf_lloyd_recall_report": from_registry("ivf_lloyd_recall_report"),
        "ppm_decode_stats": from_registry("ppm_decode_stats"),
        # round-10: real RIFF/WAVE PCM16 decode (audio sibling of the
        # PPM leg — Arrow-batched encode + chunk-walking decode),
        # full-PSL domain extraction, HLL cardinality datacard, and the
        # Heaps-law vocabulary growth curve
        "wav_decode_stats": from_registry("wav_decode_stats"),
        "wav_decode_stats_native": wav_decode_native,
        "png_decode_stats": from_registry("png_decode_stats"),
        "media_decode_quarantine": from_registry("media_decode_quarantine"),
        "events_cube_rollup": from_registry("events_cube_rollup"),
        "psl_registrable_domains": from_registry("psl_registrable_domains"),
        "hll_distinct_docs": from_registry("hll_distinct_docs"),
        "vocab_growth_docs": from_registry("vocab_growth_docs"),
        "url_dedup_docs": from_registry("url_dedup_docs"),
        "dedup_span_rewrite2": from_registry("dedup_span_rewrite2"),
        # round-9 second batch: the PCA/JL projection front end
        "knn_pca_refine_l2_k10": knn_pca_refine_bench,
        "embedding_covariance": from_registry("embedding_covariance"),
        "jl_project_emb": from_registry("jl_project_emb"),
        "nb_quality_classifier_docs": from_registry("nb_quality_classifier_docs"),
        "knn_opq_refine_l2_k10": knn_opq_refine_bench,
        # round-9 third batch: the graph family — NN-descent kNN-graph
        # build (production posture: k=10, 3 rounds) and PageRank over
        # the mutual-kNN graph (5 decimal-exact power iterations on the
        # NN-descent edges — linear-in-n end to end, unlike the gated
        # exact-graph variant)
        # round-10: amortized-fit twins — same probe+refine plan as the
        # *_refine_k10 entries but with the PCA/OPQ rotation prefit
        # (untimed, suite-construction time), tracking the steady-state
        # number a model=-reusing production caller sees
        "knn_pca_refine_l2_k10_warm": knn_pca_refine_warm,
        "knn_opq_refine_l2_k10_warm": knn_opq_refine_warm,
        "knn_nndescent_l2_k10": knn_nndescent_bench,
        "knn_nndescent_refine_l2_k10": knn_nndescent_refine_bench,
        "pagerank_knn_graph": pagerank_bench,
        "hits_knn_graph": hits_bench,
        "kcore_knn_graph": kcore_bench,
        "trustrank_knn_graph": trustrank_bench,
        "bfs_layers_knn": bfs_layers_bench,
        "triangles_doulion_knn": doulion_bench,
        "hyperanf_knn": hyperanf_bench,
    }


def _repo_path(name: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), name)


def _bench_round() -> int:
    """The round this bench run belongs to: one past the newest
    committed official BENCH_r*.json (the driver records r{N} AFTER
    the round's bench runs)."""
    import glob
    import re

    best = 0
    for path in glob.glob(_repo_path("BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def _load_coverage_raw() -> dict:
    try:
        with open(_repo_path("BENCH_COVERAGE.json")) as f:
            return json.load(f)
    except Exception:
        return {}


def _load_coverage(rnd: int | None = None) -> dict[str, int]:
    """name -> round of the entry's last committed bench measurement
    (registry names; posture keys are credited to their base).

    When ``rnd`` is given and equals the coverage file's own round, this
    is a SAME-ROUND RERUN (the driver's lower-core scaling pass, or a
    local re-run before the round closes): entries credited this round
    fall back to their PREVIOUS vintage so the rerun resolves the SAME
    stalest-first rotation window as the round's first run — round 11's
    c8 pass resolved a disjoint window, emptying the driver's scaling
    table (VERDICT r11 item 2)."""
    raw = _load_coverage_raw()
    cov = {k: int(v) for k, v in raw.get("last_benched", {}).items()}
    if rnd is not None and raw.get("round") == rnd:
        prev = {k: int(v) for k, v in raw.get("prev_benched", {}).items()}
        for k, v in list(cov.items()):
            if v == rnd:
                cov[k] = prev.get(k, -1)
    return cov


def _save_coverage(benched_names, rnd: int) -> None:
    raw = _load_coverage_raw()
    cov = {k: int(v) for k, v in raw.get("last_benched", {}).items()}
    prev = {k: int(v) for k, v in raw.get("prev_benched", {}).items()}
    if raw.get("round") != rnd:
        prev = {}  # fresh round: previous vintages start from this state
    for n in benched_names:
        base = registry_base(n)
        if base is not None:
            if cov.get(base) is not None and cov[base] != rnd:
                prev[base] = cov[base]
            cov[base] = rnd
    with open(_repo_path("BENCH_COVERAGE.json"), "w") as f:
        json.dump(
            {
                "round": rnd,
                "last_benched": dict(sorted(cov.items())),
                "prev_benched": dict(sorted(prev.items())),
            },
            f, indent=1,
        )


#: rotation name list, computed once per process so the sf-curve pass
#: benches the identical rotation set
_ROTATION_NAMES: list[str] | None = None


def rotation_names(fixed_keys) -> list[str]:
    """Stalest-first rotation over registry entries the fixed suite
    doesn't cover (directly or via a posture key): the half of the
    pool with the oldest committed measurement, never-benched first —
    so every registry entry has a committed sf-curve datapoint at
    most 2 rounds old (VERDICT r10 task 2)."""
    global _ROTATION_NAMES
    if _ROTATION_NAMES is not None:
        return _ROTATION_NAMES
    covered = {registry_base(k) for k in fixed_keys} - {None}
    pool = sorted(n for n in registry.REGISTRY if n not in covered)
    rnd = _bench_round()
    cov = _load_coverage(rnd)
    # tie-break ties in staleness by a per-round deterministic salt,
    # NOT by name: once a full-coverage round leaves every entry at
    # the same vintage, an alphabetical tie-break would re-pin the
    # identical (front-of-alphabet) half every round — including the
    # ~500 s quadratic-by-construction audit anchors — while the back
    # half ages forever. The salt spreads ties uniformly and differs
    # each round, so tied entries alternate windows and the ≤2-round
    # staleness promise actually holds.
    import hashlib

    def _salt(name: str) -> str:
        return hashlib.sha1(f"{rnd}:{name}".encode()).hexdigest()

    pool.sort(key=lambda n: (cov.get(n, -1), _salt(n)))
    default_n = (len(pool) + 1) // 2
    n = int(os.environ.get("SPARK_GRAFT_BENCH_ROTATE", str(default_n)))
    _ROTATION_NAMES = pool[: max(0, n)]
    return _ROTATION_NAMES


def rotation_queries(spark, sf_dir, fixed_keys) -> dict:
    reg = registry.REGISTRY

    def from_registry(name):
        fn, _ = reg[name]
        return lambda: fn(spark, sf_dir)

    return {n: from_registry(n) for n in rotation_names(fixed_keys)}


#: continuity name list, computed once per process (same pattern as
#: _ROTATION_NAMES) so the sf-curve and same-round reruns agree
_CONTINUITY_NAMES: list[str] | None = None


def continuity_names(fixed_keys) -> list[str]:
    """Cross-round comparability set (VERDICT r11 item 2): every query
    name the PREVIOUS round's official inline record carried — and that
    isn't already a fixed-core key — is re-measured as a CORE entry
    (best-of-N) this round. The driver's per-query PERF diff and the
    lower-core scaling rerun both read the inline stdout record, so
    carrying last round's inline keys forward guarantees a large stable
    key intersection (rotation debuts drop out of the inline set after
    one round otherwise, which zeroed PERF_r11's n_common). Continuity
    entries do NOT fold into the headline ``value`` (that stays the
    fixed core, same set as prior rounds); they are reported under
    ``continuity_seconds``."""
    global _CONTINUITY_NAMES
    if _CONTINUITY_NAMES is None:
        fixed = set(fixed_keys)
        _CONTINUITY_NAMES = sorted(
            n
            for n in _prev_round_inlined()
            if n not in fixed and n in registry.REGISTRY
        )
    return _CONTINUITY_NAMES


def _csv_copy_dir(sf_dir: str) -> str:
    return f"/tmp/sals_bench_csv_{os.path.basename(sf_dir.rstrip('/'))}"


def _materialize_csv_copy(spark, sf_dir: str) -> None:
    """One-time (cached) CSV copy of lineitem's q1 columns for the
    cross-format scan benchmark — written untimed during warmup."""
    out = _csv_copy_dir(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        read_table(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_extendedprice", "l_discount",
            "l_returnflag", "l_linestatus",
        ).write.mode("overwrite").option("header", True).csv(out)


def _warm(spark, sf_dir):
    # warm the JVM / parquet footers / codegen so the first timed query
    # doesn't absorb session startup (untimed; not in the output)
    for t in ["region", "lineitem", "documents", "embeddings"]:
        read_table(spark, sf_dir, t).count()
    _materialize_csv_copy(spark, sf_dir)
    # ...and the Python workers: the first mapInPandas pays worker
    # fork + Arrow init (~6 s measured) — warm them too so the
    # UDF-backed queries report steady-state
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()


def _run_suite(spark, sf_dir) -> dict[str, float]:
    # Best-of-N (default 2): a single-shot measurement folds codegen
    # compilation, shuffle-service warmup, and background machine load
    # into whichever query runs first — observed ±2-4× swings on heavy
    # entries within one JVM. The min over two runs is the standard
    # load-insensitive estimator and keeps the suite comparable across
    # rounds run on differently-loaded machines.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    # entries slower than this after rep 1 skip further reps: a second
    # 40 s pass over a quadratic oracle anchor buys noise reduction the
    # family tag already discounts, at real wall-clock cost
    rep_cutoff_s = float(os.environ.get("SPARK_GRAFT_BENCH_REP_CUTOFF", "20"))
    # sub-floor entries earn up to 2 EXTRA reps: the round-11 close-out
    # showed the sub-2 s class wobbling 3-13× in-suite (codegen/JVM
    # warmth dominates at that scale — standalone best-of-3 retimes sat
    # at 0.5-1.4 s where the suite recorded up to 5 s), and extra reps
    # there cost ~1 s each while heavy entries are untouched
    fast_floor_s = float(os.environ.get("SPARK_GRAFT_BENCH_FAST_FLOOR", "2"))
    timings: dict[str, float] = {}
    fixed = bench_queries(spark, sf_dir)
    reg = registry.REGISTRY
    core = dict(fixed)
    for cname in continuity_names(fixed.keys()):
        fn, _ = reg[cname]
        core[cname] = (lambda f: lambda: f(spark, sf_dir))(fn)
    suite = dict(core)
    rotation = rotation_queries(spark, sf_dir, core.keys())
    suite.update(rotation)
    for name, make in suite.items():
        best, n = None, 0
        # rotation entries run ONCE: they exist for the sf-curve shape,
        # not for cross-round deltas (the fixed core keeps best-of-N),
        # and many are quadratic-by-design oracle anchors at sf0.1
        n_reps = 1 if name in rotation else reps
        extra_fast = 0 if name in rotation else 2
        try:
            done = 0
            while done < n_reps or (
                best is not None
                and best < fast_floor_s
                and done < n_reps + extra_fast
            ):
                # cache_scope: operators that persist multi-branch
                # subtrees release their blocks after each query's
                # action, so repeated bench runs in one session can't
                # accumulate cached partitions
                with cache_scope():
                    t0 = time.time()
                    df = make()
                    n = df.count()  # force full execution
                    el = time.time() - t0
                best = el if best is None else min(best, el)
                done += 1
                if el > rep_cutoff_s:
                    break
        except Exception as e:
            # one broken entry must not lose the round's whole record;
            # the failure is loud in stderr and in the detail payload
            timings[name] = -1.0
            print(f"# {name}: FAILED {str(e).splitlines()[0][:160]}",
                  file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
    return timings


def _sf_curve_dir(sf_dir: str) -> str | None:
    """The next-smaller standard scale factor, if present on disk."""
    base = os.path.dirname(sf_dir.rstrip("/"))
    name = os.path.basename(sf_dir.rstrip("/"))
    smaller = {"sf1": "sf0.1", "sf0.1": "sf0.01", "sf0.01": "sf0.001"}.get(name)
    if smaller is None:
        return None
    cand = os.path.join(base, smaller)
    return cand if os.path.isdir(cand) else None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # Quiet the WindowExec "no partition defined" warning for this
    # bench process: every unpartitioned window in the suite runs over
    # a declared-BOUNDED frame (per-partition totals ≤ n_partitions
    # rows, top-k survivors after a limit, one table's column list) —
    # boundedness is pinned by
    # tests/test_plans.py::test_unpartitioned_windows_sit_above_bounded_aggregates,
    # so the warning is noise here, not a scale signal. Log level only;
    # the plans are unchanged.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging backend unavailable — warnings are cosmetic
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    _warm(spark, sf_dir)
    timings = _run_suite(spark, sf_dir)
    failed = sorted(q for q, t in timings.items() if t < 0)
    timings = {q: t for q, t in timings.items() if t >= 0}
    # the headline `value` covers the FIXED core only: the rotation
    # window's composition changes every round (stalest-first) and
    # deliberately includes quadratic-by-construction oracle anchors
    # at sf0.1, so folding it into `value` would make the one number
    # the driver compares across rounds depend on which entries
    # happened to rotate in (observed: 280 s core + 1134 s rotation,
    # of which two all-pairs recall audits were 1016 s). Rotation time
    # is reported under its own key; per-query timings for BOTH sets
    # stay in `queries` and BENCH_DETAIL.json — logged, not capped.
    rot_set = set(rotation_names(()))
    cont_set = set(continuity_names(()))
    # value stays the FIXED core only (same key set as prior rounds):
    # continuity entries are re-measures of last round's inline keys
    # and would double-count rotation-class work into the one number
    # the driver compares across rounds
    total = round(
        sum(
            t
            for q, t in timings.items()
            if q not in rot_set and q not in cont_set
        ),
        3,
    )
    rotation_total = round(
        sum(t for q, t in timings.items() if q in rot_set), 3
    )
    continuity_total = round(
        sum(t for q, t in timings.items() if q in cont_set), 3
    )
    rnd = _bench_round()
    if sf == "0.1":
        # coverage tracks the driver's official per-round sf0.1 pass
        # only — ad-hoc local runs at other sfs must not mark entries
        # as freshly measured
        _save_coverage(timings.keys(), rnd)

    out = {
        "metric": "headline_batch_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "round": rnd,
        "rotation": rotation_names(()),
        "rotation_seconds": rotation_total,
        "continuity_seconds": continuity_total,
    }
    if failed:
        out["failed"] = failed

    # Scaling curve: rerun the suite one scale factor down (10× less
    # data) and report the big/small time ratio per query. With ~10×
    # data a healthy ratio sits WELL below 10 (fixed job overhead
    # dominates the small run); a ratio approaching 100 means
    # super-linear work (an O(n²) plan) and names the offender.
    # Disable with SPARK_GRAFT_SF_CURVE=0.
    small_dir = _sf_curve_dir(sf_dir)
    if small_dir and os.environ.get("SPARK_GRAFT_SF_CURVE", "1") != "0":
        small_sf = os.path.basename(small_dir).replace("sf", "")
        print(f"# sf_curve: rerunning at {small_dir}", file=sys.stderr)
        _materialize_csv_copy(spark, small_dir)
        small = _run_suite(spark, small_dir)
        ratio = {
            q: round(timings[q] / small[q], 2)
            for q in timings
            if small.get(q, 0) > 0
        }
        out["sf_curve"] = {
            "small_sf": float(small_sf),
            "small_queries": small,
            "ratio_big_over_small": ratio,
        }

    # Second decade of the scaling curve (sf0.1 → sf1), opt-in so the
    # driver's per-round bench stays fast: set SPARK_GRAFT_SF1_DIR to a
    # fixture made by scripts/make_sf1.py. Results go to a committed
    # SCALING_sf1.json, not the stdout line.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if sf1_dir and os.path.isdir(sf1_dir):
        print(f"# sf1 up-curve: running at {sf1_dir}", file=sys.stderr)
        _materialize_csv_copy(spark, sf1_dir)
        big = _run_suite(spark, sf1_dir)
        up_ratio = {
            q: round(big[q] / timings[q], 2)
            for q in big
            if timings.get(q, 0) > 0
        }
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "SCALING_sf1.json"), "w") as f:
            json.dump(
                {
                    "big_sf": 1.0,
                    "small_sf": out["sf"],
                    "big_queries": big,
                    "small_queries": timings,
                    "ratio_big_over_small": up_ratio,
                    # by-construction tags: these entries score all
                    # |Q|·|C| pairs on purpose (exactness baselines /
                    # recall audits); their ratio has an n²-ish
                    # envelope and is not a regression signal — see
                    # EXACT_BASELINE_FAMILY and PERF.md
                    "families": {
                        q: "exact_baseline"
                        for q in sorted(EXACT_BASELINE_FAMILY)
                        if q in big
                    },
                    "family_note": (
                        "exact_baseline = quadratic by construction"
                        " (all-pairs exactness baseline or recall"
                        " audit embedding one); pair-op envelope is"
                        " 100x for 10x data, each has a sub-quadratic"
                        " production twin in the same suite"
                    ),
                },
                f, indent=1, sort_keys=True,
            )

    # The driver captures only the last ~2 KB of stdout; r3's full JSON
    # (queries + sf_curve) outgrew that and the official record lost its
    # headline ("parsed": null). Emit a compact final line (≤1.5 KB) and
    # write the complete payload to a committed file instead.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    compact = {
        k: v for k, v in out.items() if k not in ("sf_curve", "rotation")
    }
    compact["n_rotated"] = len(out["rotation"])
    # COPY the timings dict: `out["queries"]` aliases `timings`, and the
    # trim loop below would otherwise shrink both, zeroing the
    # queries_omitted arithmetic (observed: 3 dropped, "omitted": 0).
    # The INLINE record carries core + continuity keys only: rotation
    # membership is salt/vintage-dependent per round, and inlining it
    # made consecutive official records share zero keys (PERF_r11
    # n_common: 0). Rotation timings stay in BENCH_DETAIL.json.
    compact["queries"] = {
        q: t for q, t in compact["queries"].items() if q not in rot_set
    }
    compact["detail_file"] = "BENCH_DETAIL.json"
    n_total = len(timings)
    compact["n_queries"] = n_total
    compact["queries_omitted"] = n_total - len(compact["queries"])
    prev_inlined = _prev_round_inlined()
    line = json.dumps(compact, separators=(",", ":"))
    while len(line.encode()) > 1500 and compact["queries"]:
        # KEEP the previous round's inline keys, drop the fastest of
        # the rest first (VERDICT r11 item 2): the inline set then
        # converges to a stable slowest-N core the driver can diff
        # round-over-round and across the same-round c8/c32 scaling
        # pair; the complete payload is always in the committed
        # BENCH_DETAIL.json.
        qs = compact["queries"]
        pool = [q for q in qs if q not in prev_inlined] or list(qs)
        fastest = min(pool, key=qs.get)
        del qs[fastest]
        compact["queries_omitted"] = n_total - len(qs)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


def _prev_round_inlined() -> frozenset:
    """Inline query names from the latest official BENCH_r*.json, for
    the rotation trim above. Empty set when no record exists (first
    round, or bench run outside the repo)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and int(m.group(1)) > best_n:
            best, best_n = path, int(m.group(1))
    if best is None:
        return frozenset()
    try:
        with open(best) as f:
            rec = json.load(f)
        return frozenset((rec.get("parsed") or {}).get("queries", {}))
    except Exception:
        return frozenset()


if __name__ == "__main__":
    main()
