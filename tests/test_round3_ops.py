"""Unit tests: round-3 operators — per-group cap, Gopher filter,
semantic dedup, ANN recall evaluation."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gmall_flink_20_spark.operators import ann, sampling, similarity, text
from gmall_flink_20_spark.operators.sampling import sample_hash


def test_per_group_cap_equals_single_phase(spark):
    # the two-level top-k must return EXACTLY the one-phase row_number
    # result for any fanout (any global top-k row is top-k in its bucket)
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    got = sampling.per_group_cap(df, k=5, fanout=8)
    w = Window.partitionBy("source").orderBy(sample_hash("doc_id", "cap"), "doc_id")
    want = (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 5).drop("_rn")
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_per_group_cap_respects_cap_and_determinism(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 290, "monster").otherwise("tiny").alias("source"),
    )
    got = sampling.per_group_cap(df, k=10, fanout=4).groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert counts["monster"] == 10  # capped
    assert counts["tiny"] == 10  # all kept (group smaller than cap)
    # deterministic across repartitionings
    again = sampling.per_group_cap(df.repartition(13), k=10, fanout=4)
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id
        for r in sampling.per_group_cap(df.coalesce(1), k=10, fanout=4).collect()
    )


def test_gopher_filter_rules(spark):
    long_ok = " ".join(["the", "and", "data"] * 20)  # 60 words, stopwords present
    too_short = "the and tiny"
    no_stopwords = " ".join(["data"] * 60)
    long_words = " ".join(["the", "and"] + ["x" * 30] * 58)  # mean len > 10
    docs = spark.createDataFrame(
        [(1, long_ok), (2, too_short), (3, no_stopwords), (4, long_words)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.gopher_filter(docs).collect()}
    assert out[1].kept == 1
    assert out[2].kept == 0 and out[2].n_words == 3
    assert out[3].kept == 0 and out[3].n_stop_hits == 0
    assert out[4].kept == 0 and out[4].mean_word_len > 10


def test_semantic_dedup_keeps_cluster_minimum(spark, sf_dir):
    from gmall_flink_20_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = ann.semantic_dedup(emb, threshold=0.25)
    rows = out.collect()
    assert len(rows) == emb.count()  # every vector gets a verdict
    # the lowest-id vector of every cluster has no lower-id neighbor,
    # so it must always be kept
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.kept == 1


def test_ann_recall_exact_vs_itself_is_one(spark, sf_dir):
    from gmall_flink_20_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity.ann_bruteforce_topk(emb, list(range(5)), 3)
    out = ann.ann_recall(exact, exact, 3).collect()
    assert len(out) == 5
    assert all(r.recall == 1.0 and r.n_hits == 3 for r in out)


def test_ann_recall_includes_zero_hit_queries(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99)], "query_id long, neighbor_id long"
    )
    out = {r.query_id: r for r in ann.ann_recall(approx, exact, 2).collect()}
    assert out[1].n_hits == 1 and out[1].recall == 0.5
    assert out[2].n_hits == 0 and out[2].recall == 0.0  # not dropped
