"""semantic_ann_in_data_lake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference project
``davoudifatemeh/semantic-ann-in-data-lake`` (semantic joinable-column
discovery over a data lake), re-expressed as lazy, Catalyst-optimized
DataFrame operators rather than an eager single-process pandas program.

Layout
------
- ``session``            SparkSession factory tuned for local[N] testing and
                         cluster-scale defaults (AQE, Arrow, shuffle parts).
- ``sources``            readers (CSV dir scan, Parquet, JSON/JSONL),
                         writers, and the cache-or-compute checkpoint helper.
- ``operators.profiler`` the catalog builder: per-column type/null/length
                         stats, distinct samples, most-common values.
- ``operators.knn``      the kNN similarity self-join (exact SQL, broadcast
                         numpy, bucket-LSH and IVF physical strategies;
                         int8 index compression, k-means|| training).
- ``operators.asof``     as-of temporal join (one shuffle-sort).
- ``operators.discovery`` lake-wide joinable-column discovery
                         (profile -> describe -> embed -> kNN -> rank).
- ``operators.chunking`` sliding-token-window document chunking.
- ``operators.evaluation`` P/R/F1 + NDCG@k harness vs. ground-truth pairs.
- ``operators.pairs``    training-pair building + seeded splits.
- ``operators.dedup``    exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                         embedding-cosine near-duplicate detection.
- ``operators.textstats`` language-ID, quality scoring, token counting,
                         fingerprinting, TF-IDF/BM25, repetition filter,
                         PII scrubbing.
- ``operators.multimodal`` binary-column (image/audio/video) plumbing
                         with stubbed decoders + uniform frame sampling.
- ``operators.joins``    hot-key-targeted salted join (with detection)
                         and the banded |a−b| ≤ eps proximity join.
- ``operators.decontam`` benchmark-leak detection/filtering (n-gram
                         overlap vs an evaluation set).
- ``operators.packing``  token-budget sequence packing and mixture
                         assembly (quota-fill selection) via plain and
                         grouped distributed prefix sums.
- ``operators.layout``   Z-order (Morton) clustering writes + parquet
                         small-file compaction.
- ``functions``          reusable column expressions: portable hashes,
                         vector math (incl. per-key centroids), date
                         normalization, serialization.
- ``functions.bpe``      corpus-trained byte-level BPE (train / encode /
                         decode / artifacts) behind the token seam.
- ``annotate``           LLM-annotation stage plumbing with deterministic
                         local fallbacks + HTTP embedder/annotator
                         clients; model quality scoring; corruption +
                         synonym operators.
- ``functions.skew``     blanket salted join + two-stage skew
                         aggregation (see operators.joins for the
                         hot-key tier).
- ``streaming``          Structured Streaming extensions: watermarked
                         rollups (tumbling/sliding), stateful
                         sessionization, stream-stream interval join,
                         native + foreachBatch dedup, incremental
                         embedding / near-dup / materialized rollup —
                         extension, not parity.
"""

__version__ = "0.3.0"
