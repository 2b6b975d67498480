"""The SQL registration layer: operators consumable from spark.sql."""

from __future__ import annotations


def test_sql_over_lake_and_derived_views(spark, sf_dir):
    from semantic_ann_in_data_lake_spark.plans.views import (
        register_derived_views,
        register_views,
    )

    assert len(register_views(spark, sf_dir)) == 10
    register_derived_views(spark, sf_dir)

    # plain SQL across a raw table and a derived operator view
    row = spark.sql(
        """
        SELECT p.col_type, count(*) AS n
        FROM catalog_profiles p
        WHERE p.table_name = 'lineitem'
        GROUP BY p.col_type ORDER BY n DESC LIMIT 1
        """
    ).collect()[0]
    assert row["n"] >= 4  # lineitem is mostly floats/integers

    knn = spark.sql(
        """
        SELECT k.query_id, count(*) AS n_neighbors
        FROM knn_neighbors k JOIN embeddings e ON k.query_id = e.vec_id
        GROUP BY k.query_id
        """
    ).collect()
    assert all(r["n_neighbors"] == 5 for r in knn)

    sig = spark.sql(
        "SELECT count(*) AS n FROM minhash_signatures WHERE size(minhash) = 16"
    ).collect()[0]
    assert sig["n"] > 0


def test_sql_over_round3_views(spark, sf_dir):
    """Plain SQL composition over the round-3 derived relations: join
    quality scores onto packing bins and aggregate per bin."""
    from semantic_ann_in_data_lake_spark.plans.views import (
        register_derived_views,
        register_views,
    )

    register_views(spark, sf_dir)
    register_derived_views(spark, sf_dir)
    rows = spark.sql(
        """
        SELECT b.bin_id, count(*) AS n_docs, round(avg(s.score), 4) AS avg_q
        FROM doc_pack_bins b JOIN doc_quality_scores s USING (doc_id)
        GROUP BY b.bin_id ORDER BY b.bin_id LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    assert all(r["n_docs"] >= 1 and 0.0 <= r["avg_q"] <= 1.0 for r in rows)
