"""Semantic invariants for the round-3 pipeline operators — properties
the DuckDB parity gate can't express (it proves engine agreement, not
that the algorithm has the intended shape)."""

from __future__ import annotations

from gmall_flink_20_spark.queries import QUERIES


def test_unigram_lm_invariants(spark, sf_dir):
    got = QUERIES["docs_unigram_lm"](spark, sf_dir).toPandas()
    assert (got["min_tf"] >= 1).all()
    # every occurrence contributes at least frequency 1
    assert (got["sum_tf"] >= got["n_tokens"]).all()
    assert ((got["lm_score"] > 0) & (got["lm_score"] <= 1)).all()


def test_ccnet_buckets_are_balanced_per_lang(spark, sf_dir):
    got = QUERIES["docs_ccnet_buckets"](spark, sf_dir).toPandas()
    for _, grp in got.groupby("lang"):
        sizes = grp["bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1  # ntile(3) balance
        # head scores dominate tail scores within a language
        if {"head", "tail"} <= set(sizes.index):
            assert (
                grp[grp.bucket == "head"]["lm_score"].min()
                >= grp[grp.bucket == "tail"]["lm_score"].max()
            )


def test_quality_classifier_kept_matches_score(spark, sf_dir):
    got = QUERIES["docs_quality_classifier"](spark, sf_dir).toPandas()
    assert ((got["clf_score"] >= 0.0) == (got["kept"] == 1)).all()


def test_lang_balance_caps_every_language_at_min(spark, sf_dir):
    docs = QUERIES["docs_lang_balance"](spark, sf_dir).toPandas()
    from gmall_flink_20_spark.io import load_table

    full = load_table(spark, sf_dir, "documents").toPandas()
    min_count = full["lang"].value_counts().min()
    out_counts = docs["lang"].value_counts()
    assert set(out_counts.index) == set(full["lang"].unique())
    assert (out_counts == min_count).all()
    assert set(docs["doc_id"]) <= set(full["doc_id"])


def test_mixture_weights_bounds(spark, sf_dir):
    got = QUERIES["docs_mixture_weights"](spark, sf_dir).toPandas()
    assert ((got["weight"] > 0) & (got["weight"] <= 1.0)).all()
    assert (got["expected_tokens"] <= got["n_tokens"]).all()
    # weight-1 domains keep everything
    full = got[got["weight"] == 1.0]
    assert (full["expected_tokens"] == full["n_tokens"]).all()


def test_dedup_incremental_survivors_unique_and_not_in_base(spark, sf_dir):
    from pyspark.sql import functions as F

    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators.sampling import sample_hash

    got = QUERIES["docs_dedup_incremental"](spark, sf_dir).toPandas()
    assert got["content_hash"].is_unique
    docs = load_table(spark, sf_dir, "documents")
    base_hashes = set(
        docs.filter(F.pmod(sample_hash("doc_id", "incr"), F.lit(4)) != 0)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .toPandas()["h"]
    )
    assert not (set(got["content_hash"]) & base_hashes)


def test_containment_ratios_bounded(spark, sf_dir):
    got = QUERIES["docs_containment_pairs"](spark, sf_dir).toPandas()
    for c in ("containment_a", "containment_b"):
        assert ((got[c] > 0) & (got[c] <= 1.0)).all()
    assert (got[["containment_a", "containment_b"]].max(axis=1) >= 0.5).all()
    assert (got["inter_sz"] <= got[["sz_a", "sz_b"]].min(axis=1)).all()


def test_knn_graph_ranks_and_no_self_edges(spark, sf_dir):
    got = QUERIES["emb_knn_graph"](spark, sf_dir).toPandas()
    assert ((got["rank"] >= 1) & (got["rank"] <= 3)).all()
    assert (got["vec_id"] != got["neighbor_id"]).all()
    # ranks are dense per vector: a vector with rank r also has 1..r-1
    per = got.groupby("vec_id")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()


def test_ccnet_buckets_approx_agrees_with_exact(spark, sf_dir):
    """The scale-path sketch-cutoff form must land ≥90% of documents in
    the same tercile as the exact ntile form (sketch rank error and tie
    handling account for the rest)."""
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators.lm import ccnet_buckets_approx

    docs = load_table(spark, sf_dir, "documents")
    exact = QUERIES["docs_ccnet_buckets"](spark, sf_dir).toPandas()
    approx = ccnet_buckets_approx(docs).toPandas()
    merged = exact.merge(approx, on="doc_id", suffixes=("_e", "_a"))
    assert len(merged) == len(exact)
    agreement = (merged["bucket_e"] == merged["bucket_a"]).mean()
    assert agreement >= 0.90, f"agreement {agreement:.3f}"


def test_ccnet_buckets_approx_has_no_window(spark, sf_dir):
    # the point of the approx form: zero Window operators (no per-language
    # single-task sort) — cutoffs arrive via a broadcast join
    from tests.test_scale_plans import plan_of

    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators.lm import ccnet_buckets_approx

    plan = plan_of(ccnet_buckets_approx(load_table(spark, sf_dir, "documents")))
    import re

    assert not re.findall(r"\(\d+\) Window\n", plan)
    assert "BroadcastHashJoin" in plan


def test_lang_outliers_centroid_broadcast(spark, sf_dir):
    from tests.test_scale_plans import plan_of

    plan = plan_of(QUERIES["emb_lang_outliers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    got = QUERIES["emb_lang_outliers"](spark, sf_dir).toPandas()
    assert ((got["is_outlier"] == 1) == (got["centroid_cos"] < 0.0)).all()
