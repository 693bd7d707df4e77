"""Distributed connected components — duplicate-cluster resolution.

The missing endgame of every dedup pipeline: LSH/verify emits *pairs*
(`dedup.py:neardup_verified`), but removal needs *clusters* — if A~B and
B~C, exactly one of {A, B, C} survives even though (A, C) was never
emitted as a pair. That closure is a connected-components problem on the
pair graph.

Spark-first design: the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014) expressed as DataFrame ops. Each round is one shuffle (a window
min per endpoint); the edge set monotonically contracts toward one star
per component rooted at its minimum id, converging in O(log² n) rounds
regardless of component diameter — unlike naive min-label propagation,
which needs O(diameter) rounds and dies on chain-shaped clusters at
scale. Per-round ``localCheckpoint`` truncates the growing lineage (on a
real cluster, set a reliable checkpoint dir and use ``checkpoint``
instead; the hook is the ``materialize`` parameter).

No reference parity: the reference (Flink demo suite) has no graph
operators; this extends the training-data pipeline (build brief).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["connected_components", "neardup_clusters", "resolve_duplicates"]


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (lo, hi) form, no self-loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u, connect each strictly-larger neighbor to
    min(Γ(u) ∪ {u}). High-degree hubs shrink here: their neighbors all
    re-point to the component minimum in one round."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    w = Window.partitionBy("src")
    m = F.least(F.col("src"), F.min("dst").over(w))
    out = (
        sym.withColumn("m", m)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("m").alias("src"), F.col("dst").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    """For every node u, connect its smaller-or-equal neighbors (and u
    itself) to min(Γ⁻(u) ∪ {u}) — flattens chains into stars."""
    # canonical (lo, hi): group by the larger endpoint hi = u, Γ⁻(u) = lo's
    w = Window.partitionBy("dst")
    m = F.min("src").over(w)  # all src < dst, so min includes the root
    nb = edges.withColumn("m", m)
    to_min = nb.select(F.col("m").alias("src"), F.col("src").alias("dst"))
    self_edge = nb.select(F.col("m").alias("src"), F.col("dst").alias("dst"))
    out = to_min.union(self_edge)
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    materialize: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """(src, dst) undirected edges → (id, component) for EVERY node that
    appears in an edge, where component = minimum node id reachable.

    Driver-side loop, distributed work: each iteration is a fixed small
    number of shuffles and the driver only ever sees a 2-value
    convergence signature (count + hash-sum), never data. ``materialize``
    defaults to eager ``localCheckpoint`` — swap for
    ``lambda df: df.checkpoint()`` on a cluster with a checkpoint dir.
    """
    if materialize is None:
        materialize = lambda df: df.localCheckpoint(eager=True)  # noqa: E731

    e = materialize(_canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))))
    prev_sig = None
    for _ in range(max_iter):
        e = materialize(_small_star(_large_star(e)))
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold: overflow-free under ANSI mode, order-independent
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(theoretical bound is O(log^2 n) — raise max_iter)"
        )
    # fixpoint = disjoint stars: every edge is (root, member), root = min id
    members = e.select(F.col("dst").alias("id"), F.col("src").alias("component"))
    roots = e.select(F.col("src").alias("id"), F.col("src").alias("component")).distinct()
    return members.union(roots)


def neardup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Verified near-dup pairs → (doc_id, cluster_id): the transitive
    closure of 'is a near-duplicate of', labeled by the minimum doc id of
    each cluster. Docs in no pair are absent (they are their own
    singleton cluster by convention)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )


def resolve_duplicates(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    rank_cols: list | None = None,
) -> DataFrame:
    """Keep exactly one document per duplicate cluster (plus every
    unclustered doc). Default canonical = the cluster-minimum id (a pure
    anti-join — no shuffle of ``docs`` beyond the join itself);
    ``rank_cols`` instead keeps the best row per cluster by those columns
    (descending, id ascending as the tiebreak) via one window."""
    if rank_cols is None:
        losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias("__loser")
        )
        return docs.join(
            losers, docs[id_col] == F.col("__loser"), "left_anti"
        )
    joined = docs.join(
        clusters.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn("__cl", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    w = Window.partitionBy("__cl").orderBy(
        *[F.desc(c) for c in rank_cols], F.asc(id_col)
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cl", "cluster_id")
    )
