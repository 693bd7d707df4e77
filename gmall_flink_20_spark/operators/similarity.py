"""Similarity search over an embedding column (beyond-reference scope).

Brute-force cosine top-k is the correctness baseline; the scale path
(LSH/IVF bucketing so each query only scans one bucket's partitions) builds
on the same kernels. The dot product is a built-in fold
(``zip_with`` + ``aggregate``) — JVM-side, codegen'd, no Python in the
loop; at 100 TB a vectorized Pandas-UDF batch kernel over ``mapInPandas``
is the alternative when vectors are wide (both kernels share this module).

Determinism: ranks (not raw cosines) are the output contract; scores are
computed in double with a left-to-right fold, matching the oracle's
sequential loop, and ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine", "ann_bruteforce_topk", "lang_centroid_outliers"]


def dot(x: Column, y: Column) -> Column:
    """Sequential double fold of an element-wise product (matches the
    oracle's loop order bit-for-bit)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(x: Column) -> Column:
    return F.sqrt(dot(x, x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns.

    NOTE: computes both norms inline (3 folds per pair). In pairwise
    operators, precompute ``norm`` once per row instead and divide —
    higher-order folds are interpreted, so per-pair norm recomputation
    triples the dominant cost (see ann_bruteforce_topk)."""
    return dot(a, b) / (norm(a) * norm(b))


def ann_bruteforce_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The query side is tiny by construction → broadcast it; the corpus scan
    is then embarrassingly parallel with zero shuffle before the final
    per-query top-k (a rank over ≤ |queries|·|corpus| scored rows, which
    AQE coalesces). For 100 TB corpora the same plan holds: broadcast the
    query batch, scan the corpus once.
    """
    queries = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(F.col(vec_col)).alias("qn"),
        )
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("nn"),
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lang_centroid_outliers(
    docs: DataFrame,
    emb: DataFrame,
    threshold: float = 0.0,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    lang_col: str = "lang",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-based label-outlier detection: score every document's
    cosine against its LANGUAGE's embedding centroid and flag the ones
    below ``threshold`` — the cross-modal QC pass that catches
    mislabeled language tags (and, with any categorical label, corrupted
    class assignments) before training.

    Scale shape: the doc↔embedding equi-join hash-partitions on the id
    (at 100 TB both sides are id-bucketed, so this co-locates); the
    per-language centroid is ONE map-side-combined posexplode aggregate
    reduced to |langs|·dim rows, reassembled into |langs| array rows and
    BROADCAST back — the corpus is never shuffled for scoring, and the
    cosine is the row-local sequential-fold kernel.

    Determinism contract: centroid dims are round(avg, 6) — the same
    cross-engine float-summation guard as the k-means training contract
    (operators/ann.kmeans_centroids_local); the cosine then folds exact
    literals in a fixed order on both engines.
    """
    joined = docs.select(
        F.col(doc_id_col), F.col(lang_col)
    ).join(
        emb.select(F.col(vec_id_col).alias(doc_id_col), F.col(vec_col)),
        doc_id_col,
    )
    cents = (
        joined.select(F.col(lang_col), F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
        .groupBy(lang_col, "_pos")
        .agg(F.round(F.avg(F.col("_x").cast("double")), 6).alias("_m"))
        .groupBy(lang_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))), lambda s: s["_m"]
            ).alias("_cv")
        )
    )
    scored = joined.join(F.broadcast(cents), lang_col).withColumn(
        "centroid_cos",
        dot(F.col(vec_col), F.col("_cv")) / (norm(F.col(vec_col)) * norm(F.col("_cv"))),
    )
    return scored.select(
        F.col(doc_id_col),
        F.col(lang_col),
        "centroid_cos",
        (F.col("centroid_cos") < F.lit(float(threshold))).cast("long").alias("is_outlier"),
    )
