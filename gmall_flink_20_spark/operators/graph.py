"""Iterative graph algorithms as DataFrame plans (no GraphX dependency).

PageRank here is the Pregel iteration shape done Spark-first: each
superstep is one join (ranks → out-edges) plus one aggregation
(contributions → new ranks). The edge frame is the loop invariant — at
scale, repartition it ONCE on src and every iteration's join reuses that
partitioning instead of re-shuffling the (much larger) edge set against
the (small) rank frame.

Determinism contract (mirrored by the SQL oracle's unrolled-CTE chain,
the same pattern the Lloyd/k-means oracles use): fixed iteration count,
ranks rounded to 8 decimals each superstep so float summation order
cannot drift the two engines apart, damping terms combined with an
identical expression tree.

No reference parity: the reference (Flink demo suite) has no graph
operators; this extends the analytics surface (build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_stats", "kcore", "label_propagation", "modularity"]


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    decimals: int = 8,
) -> DataFrame:
    """Weighted PageRank over an edge list, ``iters`` supersteps:
    pr⁰ = 1/N;  prᵗ⁺¹(v) = (1−d)/N + d · Σ_{(u,v)∈E} prᵗ(u)·w(u,v)/out_w(u).

    Nodes are every id appearing as src or dst; dangling nodes (no
    out-edges) keep their teleport share (their mass is not
    redistributed — the simple variant, stated so the oracle matches).

    Plan per superstep: one broadcast of the rank frame (|nodes| rows ≪
    |edges|) against the edge frame, one map-side-combined sum per dst.
    The edge frame with its precomputed out-weights is built once and
    persisted — the loop never recomputes or reshuffles it.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), w.alias("_w")
    )
    from ._cache import eager_persist

    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    e = eager_persist(e.join(out_w, "_src"))
    nodes = eager_persist(
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # tiny frame, already materialized
    init = F.round(F.lit(1.0) / F.lit(float(n_nodes)), decimals)
    pr = nodes.select("node", init.alias("pr"))
    teleport = F.lit(1.0 - float(damping)) / F.lit(float(n_nodes))
    for _ in range(int(iters)):
        contrib = (
            e.join(
                F.broadcast(pr.select(F.col("node").alias("_src"), "pr")), "_src"
            )
            .select(
                F.col("_dst").alias("node"),
                (F.col("pr") * F.col("_w") / F.col("_out_w")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            F.round(
                teleport + F.lit(float(damping)) * F.coalesce(F.col("_in"), F.lit(0.0)),
                decimals,
            ).alias("pr"),
        )
    return pr


def triangle_stats(
    edges: DataFrame,
    src: str = "item_a",
    dst: str = "item_b",
) -> DataFrame:
    """Global triangle census over an undirected edge list (one row per
    edge, ``src < dst``): nodes, edges, wedges (open 2-paths), triangles,
    and the global clustering coefficient 3·T/W — the standard graph-
    health summary for a co-interaction graph (a collapsing coefficient
    flags bot rings / degenerate recommendation neighborhoods).

    Plan shape — the compact-forward orientation every distributed
    triangle count uses: each edge orients from its lower-(degree, id)
    endpoint to the higher one, making the graph a DAG where every
    triangle closes EXACTLY once and each join fan-out is bounded by the
    oriented out-degree ≤ O(√|E|) (arboricity bound) instead of the max
    raw degree — the difference between a hub node exploding the join
    and not. Two hash self-joins on the oriented list; degrees and
    wedge counts are map-side-combined aggregates. Everything is exact
    integer arithmetic; the coefficient is one round-6 division.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("a").alias("b"), F.col("d").alias("_db"))
    ranked = e.join(da, "a").join(db, "b")
    oriented = ranked.select(
        F.when(
            (F.col("_da") < F.col("_db"))
            | ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
        .alias("_e")
    ).select(F.col("_e.u").alias("u"), F.col("_e.v").alias("v"))
    # triangle in the DAG = x→y, x→z, y→z (x the source-most node):
    # wedge x→y→z from two oriented hops, closed by the x→z edge
    p1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    p2 = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    p3 = oriented.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = (
        p1.join(p2, "y")
        .join(p3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        # per-node wedge count d·(d−1)/2 cast long BEFORE the sum: the
        # per-node product stays < 2^53 (exact in double) while a
        # corpus-wide sum-then-divide could not
        F.sum(((F.col("d") * (F.col("d") - 1)) / 2).cast("long"))
        .cast("long")
        .alias("n_wedges"),
    )
    ecount = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        stats.crossJoin(ecount)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.round(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("global_clustering"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int | None = None,
    src: str = "item_a",
    dst: str = "item_b",
    max_iter: int = 31,
    materialize=None,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    whose degree in the REMAINING subgraph is below k, until fixpoint —
    the standard "dense cohesive subgraph" extraction (the third graph
    fixpoint here, beside pagerank's value iteration and
    connected_components' star contraction). Emits the surviving nodes
    with their within-core degree and the k used.

    ``k=None`` derives k = max_degree // 2 + 1 from the initial degree
    distribution (exact integer arithmetic both engines reproduce), so
    the peel does real cascading work across corpus scales instead of
    keeping or deleting everything at a fixed constant.

    Driver-side loop, distributed work (the connected_components
    pattern): each round is one map-side-combined degree count + two
    semi-joins, materialized via eager localCheckpoint; the driver only
    ever sees the edge count. Convergence = edge count unchanged (a
    node dies only with its incident edges, so count-stable ⇔
    fixpoint); rounds are bounded by the peeling depth, max_iter guards
    pathological chains.

    Budget alignment (ADVICE r7): the loop needs one confirming
    no-change round, so max_iter=31 supports exactly 30 PRODUCTIVE
    peels — the same bound as the items_kcore oracle, which unrolls 30
    MATERIALIZED peel rounds (idempotent past the fixpoint but silently
    non-fixpoint beyond 30). A graph needing a 31st productive peel
    raises here rather than silently diverging from the oracle;
    tests/test_graph_ops.py pins both sides of the boundary with a
    pendant-chain cascade.
    """
    if materialize is None:
        materialize = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    e = materialize(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    if k is None:
        max_deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.max("d"))
            .first()[0]
        )
        k = int(max_deg) // 2 + 1 if max_deg is not None else 1
    prev = None
    for _ in range(max_iter):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = deg.filter(F.col("d") >= k)
        e = materialize(
            e.join(alive.select(F.col("node").alias("a")), "a", "semi").join(
                alive.select(F.col("node").alias("b")), "b", "semi"
            )
        )
        n = e.count()
        if n == prev:
            break
        prev = n
    else:
        raise RuntimeError(f"kcore did not stabilize in {max_iter} rounds")
    return (
        e.select(F.col("a").alias("item_id"))
        .unionAll(e.select(F.col("b").alias("item_id")))
        .groupBy("item_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree_in_core"))
        .withColumn("k_used", F.lit(int(k)).cast("long"))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "item_a",
    dst: str = "item_b",
    materialize=None,
) -> DataFrame:
    """Community detection by synchronous label propagation (LPA) over
    an undirected edge list — the fourth graph fixpoint here, beside
    pagerank (value iteration), connected-components (star contraction)
    and kcore (peeling). Each node starts labeled with its own id; each
    round every node adopts the most frequent label among its neighbors
    AND itself (the self-vote damps the 2-coloring oscillation plain
    synchronous LPA exhibits on bipartite structures), ties broken by
    the MINIMUM label. A FIXED round count with that total tie-break
    makes the result a pure function of the graph, so the DuckDB oracle
    can replay the identical schedule as unrolled CTEs — the pagerank /
    Lloyd determinism contract, not a convergence test.

    Output: (item_id, community, community_size) — the final label per
    node plus how many nodes share it.

    Plan per round: the label frame (|nodes| rows) joins the persisted
    SYMMETRIC edge frame once (both directions pre-unioned into the
    loop invariant — r13, was one join per direction), one map-side-
    combined count per (node, label), one min(struct) argmin — no row
    ever carries more than (node, label). Labels are localCheckpoint-
    materialized per round to truncate lineage; the driver never
    collects anything.
    """
    if materialize is None:
        materialize = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    from ._cache import eager_persist

    # the PROJECTION is what gets persisted (not the symmetric union):
    # callers like items_modularity join the same edge frame again, and
    # their scans cache-hit this plan prefix — persisting only the union
    # would silently recompute the edge builder for them (measured +0.8 s)
    e = eager_persist(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    # symmetric edge frame assembled from the cached projection (r13
    # optimization, guide §2.4): voting joined the label frame twice per
    # round (once per direction); pre-unioning the reversed edges makes
    # each round ONE join — same vote multiset, half the per-round joins
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = materialize(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels.select(F.col("node").alias("b"), "lbl"), "b")
            .select(F.col("a").alias("node"), "lbl")
            .unionAll(labels.select("node", "lbl"))
        )
        labels = materialize(
            votes.groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), "lbl")).alias("m"))
            .select("node", F.col("m.lbl").alias("lbl"))
        )
    from pyspark.sql import Window

    return labels.select(
        F.col("node").alias("item_id"),
        F.col("lbl").cast("long").alias("community"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lbl"))
        .cast("long")
        .alias("community_size"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "item_a",
    dst: str = "item_b",
) -> DataFrame:
    """Newman modularity Q of a node partition over an undirected edge
    list: Q = Σ_c [ e_c/m − (d_c/2m)² ] — the standard "is this
    community structure better than chance" score (positive ⇒ denser
    inside communities than a degree-preserving random rewiring).
    ``labels`` is (item_id, community), e.g. label_propagation output.

    One row: (n_communities, n_edges, intra_edges, modularity).

    Coverage contract: Q is computed over the LABELED subgraph — m,
    the degree sums, and the intra counts all derive from the same
    tagged edge frame, so a ``labels`` input that misses some endpoint
    yields a self-consistent Q of the covered subgraph rather than an
    inconsistent mix of full-graph m with partial-graph terms (with
    label_propagation over the same edge frame, coverage is total and
    the two readings coincide).

    Plan shape: two broadcast-joinable label lookups against the edge
    list (the label frame is |nodes| ≪ |edges| at scale), one map-side
    combined per-community aggregate of (intra-edge count, degree sum),
    then a one-row reduce. All counts integer-exact; Q is assembled in
    one double expression with a fixed operation order, mirrored by the
    oracle, rounded 6.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    la = labels.select(F.col("item_id").alias("a"), F.col("community").alias("ca"))
    lb = labels.select(F.col("item_id").alias("b"), F.col("community").alias("cb"))
    tagged = e.join(la, "a").join(lb, "b")
    # per-community degree sum: each edge endpoint contributes 1
    deg = (
        tagged.select(F.col("ca").alias("c"))
        .unionAll(tagged.select(F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("d_c"))
    )
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    per_c = deg.join(intra, "c", "left").select(
        "c",
        "d_c",
        F.coalesce(F.col("e_c"), F.lit(0)).cast("long").alias("e_c"),
    )
    m = tagged.agg(F.count(F.lit(1)).cast("long").alias("m"))
    return (
        per_c.crossJoin(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.max("m").cast("long").alias("n_edges"),
            F.sum("e_c").cast("long").alias("intra_edges"),
            (
                F.round(
                    F.sum(
                        F.col("e_c").cast("double") / F.col("m").cast("double")
                        - (
                            F.col("d_c").cast("double")
                            / (F.lit(2.0) * F.col("m").cast("double"))
                        )
                        * (
                            F.col("d_c").cast("double")
                            / (F.lit(2.0) * F.col("m").cast("double"))
                        )
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("modularity"),
        )
    )
