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

__all__ = [
    "mahalanobis_outliers",
    "cosine",
    "ann_bruteforce_topk",
    "ann_bruteforce_topk_arrow",
    "lang_centroid_outliers",
    "label_centroid_drift",
    "covariance_matrix",
    "correlation_matrix",
    "top_eigvec_local",
    "top_eigvecs_local",
    "pca_project",
    "pca_project2",
    "sq8_recall",
    "binary_hamming_recall",
]


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


def covariance_matrix(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Corpus covariance of an embedding column — the Gramian pass every
    whitening / PCA / drift-monitoring pipeline runs first. Emits one row
    per upper-triangle cell: (i, j, n, sxy, cov) where sxy is the raw
    second moment Σ x_i·x_j and cov the centered covariance.

    Scale shape (MLlib RowMatrix.computeGramian): each partition folds
    its rows into ONE dim×dim BLAS outer-product accumulator inside an
    Arrow-batched ``mapInPandas`` — dim² work per row, not dim² ROWS per
    row (the declarative double-explode would shuffle |corpus|·dim²
    rows; this shuffles dim² rows PER PARTITION). Per-dim sums ride the
    same pass as j = -1 marker rows; one tiny groupBy folds partials.

    Float contract: products accumulate in float64; partial-sum order
    differs from the oracle's row order, so both engines round the
    moments to 4 decimals (absolute sums are O(corpus), double error is
    ~1e-12 relative — the same argument every summed-double gate here
    relies on) and derive cov from the ROUNDED moments with an identical
    expression tree.
    """
    import numpy as np
    import pandas as pd

    d = int(dim)

    def _gram(batches):
        acc = np.zeros((d, d), dtype=np.float64)
        sums = np.zeros(d, dtype=np.float64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["_v"].tolist(), dtype=np.float64)
            acc += x.T @ x
            sums += x.sum(axis=0)
            n += len(pdf)
        if n == 0:
            return
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(d)]).astype("int32"),
                "j": np.concatenate([ju, np.full(d, -1)]).astype("int32"),
                "sxy": np.concatenate([acc[iu, ju], sums]),
                "n": np.full(iu.size + d, n, dtype="int64"),
            }
        )

    parts = (
        emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .mapInPandas(_gram, schema="i int, j int, sxy double, n long")
        .groupBy("i", "j")
        # + 0.0 normalizes IEEE signed zero (-0.0 + 0.0 = +0.0) so the
        # bitwise-hash contract can't diverge when a moment rounds to zero
        # from below in one engine and from above in the other.
        .agg(
            (F.round(F.sum("sxy"), 4) + F.lit(0.0)).alias("sxy"),
            F.sum("n").cast("long").alias("n"),
        )
    )
    moments = parts.filter(F.col("j") >= 0)
    sums = parts.filter(F.col("j") == -1).select(
        F.col("i").alias("_si_dim"), F.col("sxy").alias("_s")
    )
    si = sums.select(F.col("_si_dim").alias("i"), F.col("_s").alias("_si"))
    sj = sums.select(F.col("_si_dim").alias("j"), F.col("_s").alias("_sj"))
    nd = F.col("n").cast("double")
    return (
        moments.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.col("n"),
            F.col("sxy"),
            (
                F.round(
                    F.col("sxy") / nd - (F.col("_si") / nd) * (F.col("_sj") / nd), 6
                )
                + F.lit(0.0)  # signed-zero normalization (see sxy above)
            ).alias("cov"),
        )
    )


def correlation_matrix(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Pearson correlation of embedding dimensions, derived from the
    Gramian pass: corr(i,j) = cov(i,j)/√(var(i)·var(j)). The covariance
    frame is computed ONCE (persisted — it feeds the main triangle and
    both diagonal lookups) and the diagonal broadcasts, so the whole
    operator adds two tiny joins to the single Gramian scan.

    Zero-variance dimensions yield NULL correlation (explicit guard, not
    a NaN leak). Determinism: corr derives from the already-rounded
    covariances with an identical expression tree in both engines.
    """
    from ._cache import eager_persist

    cov = eager_persist(covariance_matrix(emb, vec_col=vec_col, dim=dim))
    diag = cov.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("_d"), F.col("cov").alias("_var")
    )
    vi = diag.select(F.col("_d").alias("i"), F.col("_var").alias("_vi"))
    vj = diag.select(F.col("_d").alias("j"), F.col("_var").alias("_vj"))
    return (
        cov.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .select(
            "i",
            "j",
            "cov",
            F.when(
                (F.col("_vi") > 0) & (F.col("_vj") > 0),
                F.round(F.col("cov") / F.sqrt(F.col("_vi") * F.col("_vj")), 6)
                + F.lit(0.0),  # signed-zero normalization
            ).alias("corr"),
        )
    )


def ann_bruteforce_topk_arrow(
    emb: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The Arrow-batched sibling of ``ann_bruteforce_topk`` — the kernel
    the module docstring reserves for WIDE vectors: the query matrix is
    closed over as a numpy literal (tiny), each executor batch scores
    ALL queries against its corpus rows with one BLAS matmul inside
    ``mapInPandas``, and only the per-batch rows survive to the same
    final per-query rank. Higher-order-fold scoring is interpreted
    per-element; the matmul is O(1) Python overhead per BATCH — the
    crossover lands well under dim 64 × thousands of rows.

    Same contract as the fold kernel (ties on neighbor id, self
    excluded); ``emb_ann_topk_arrow`` pins rank-identical output under
    the same oracle, and a test asserts kernel equivalence directly.
    """
    import numpy as np
    import pandas as pd

    q_rows = sorted(
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, vec_col)
        .collect()
    )
    if not q_rows:
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank long"
        )
    q_ids = np.array([i for i, _ in q_rows], dtype=np.int64)
    qm = np.array([v for _, v in q_rows], dtype=np.float64)
    qn = np.sqrt((qm * qm).sum(axis=1))

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["_v"].tolist(), dtype=np.float64)
            nn = np.sqrt((x * x).sum(axis=1))
            cos = (x @ qm.T) / np.outer(nn, qn)  # rows × queries
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(q_ids, n),
                    "neighbor_id": np.repeat(pdf["_id"].to_numpy(), q_ids.size),
                    "score": cos.ravel(),
                }
            )

    scored = (
        emb.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
        )
        .mapInPandas(_score, schema="query_id long, neighbor_id long, score double")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))
    )


def top_eigvec_local(
    emb: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
    dim: int = 64,
    decimals: int = 6,
) -> list[float]:
    """Leading eigenvector of the corpus covariance by deterministic
    power iteration — the MLlib PCA split: the Gramian is DISTRIBUTED
    (``covariance_matrix``, one corpus scan), the eigen-solve runs on
    the driver over the collected dim×dim cell frame (~16 KB — the same
    artifact-sized state as the k-means centroids).

    Determinism contract (mirrored by the oracle's unrolled CTE chain):
    init is the uniform unit vector (1/√dim rounded), each step rounds
    the normalized vector to ``decimals`` so float summation order can
    never drift the engines apart; C is PSD and v₀ positive, so there
    is no sign ambiguity.

    Memoized per (input plan, params) through the shared quantizer
    artifact cache — the eigenvector is a train-once artifact exactly
    like centroids/codebooks (both PCA queries reuse it instead of
    re-running the Gramian).
    """
    import numpy as np

    from .ann import _ARTIFACT_MEMO, _ARTIFACT_MEMO_CAP, _memo_fingerprint

    memo_key = (
        "eigvec",
        _memo_fingerprint(emb),
        int(iters),
        vec_col,
        int(dim),
        int(decimals),
    )
    hit = _ARTIFACT_MEMO.get(memo_key)
    if hit is not None:
        return list(hit)

    d = int(dim)
    cells = covariance_matrix(emb, vec_col=vec_col, dim=d).collect()
    c = np.zeros((d, d), dtype=np.float64)
    for r in cells:
        c[r.i, r.j] = r.cov
        c[r.j, r.i] = r.cov
    v = np.full(d, round(1.0 / float(np.sqrt(d)), decimals), dtype=np.float64)
    for _ in range(int(iters)):
        w = c @ v
        nrm = float(np.sqrt((w * w).sum()))
        v = np.round(w / nrm, decimals) + 0.0  # signed-zero normalization
    out = [float(x) for x in v]
    if len(_ARTIFACT_MEMO) >= _ARTIFACT_MEMO_CAP:
        _ARTIFACT_MEMO.clear()
    _ARTIFACT_MEMO[memo_key] = list(out)
    return out


def pca_project(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """PCA-1 projection: every vector's coordinate along the leading
    covariance eigenvector — the 1-D corpus layout used for drift
    monitoring, ordering-by-content, and coarse bucketing. The
    eigenvector is a driver-side literal (see ``top_eigvec_local``), so
    the projection pass is ROW-LOCAL: one sequential fold per row, zero
    shuffle, the corpus is scanned once beyond the Gramian pass.
    """
    v = top_eigvec_local(emb, iters=iters, vec_col=vec_col, dim=dim)
    varr = F.array(*[F.lit(float(x)) for x in v])
    proj = F.aggregate(
        F.zip_with(F.col(vec_col), varr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # + 0.0: signed-zero normalization for the bitwise hash contract
    return emb.select(F.col(id_col), (F.round(proj, 6) + F.lit(0.0)).alias("pc1"))


def top_eigvecs_local(
    emb: DataFrame,
    n_components: int = 2,
    iters: int = 3,
    vec_col: str = "embedding",
    dim: int = 64,
    decimals: int = 6,
) -> list[list[float]]:
    """Leading ``n_components`` covariance eigenvectors by power
    iteration + Hotelling deflation: after each component, C ←
    C − λ·v·vᵀ with λ = vᵀCv, and the next component is power-iterated
    on the deflated matrix. Same driver-side artifact shape and
    determinism contract as ``top_eigvec_local`` (the Gramian is the one
    distributed pass; each λ is rounded like the vector supersteps so
    the deflated matrix is an exact expression over rounded inputs).
    """
    import numpy as np

    from .ann import _ARTIFACT_MEMO, _ARTIFACT_MEMO_CAP, _memo_fingerprint

    memo_key = (
        "eigvecs",
        _memo_fingerprint(emb),
        int(n_components),
        int(iters),
        vec_col,
        int(dim),
        int(decimals),
    )
    hit = _ARTIFACT_MEMO.get(memo_key)
    if hit is not None:
        return [list(v) for v in hit]

    d = int(dim)
    cells = covariance_matrix(emb, vec_col=vec_col, dim=d).collect()
    c = np.zeros((d, d), dtype=np.float64)
    for r in cells:
        c[r.i, r.j] = r.cov
        c[r.j, r.i] = r.cov
    out: list[list[float]] = []
    for _ in range(int(n_components)):
        v = np.full(d, round(1.0 / float(np.sqrt(d)), decimals), dtype=np.float64)
        for _ in range(int(iters)):
            w = c @ v
            nrm = float(np.sqrt((w * w).sum()))
            v = np.round(w / nrm, decimals) + 0.0  # signed-zero normalization
        out.append([float(x) for x in v])
        lam = round(float(v @ c @ v), decimals)
        # (lam*v_i)*v_j association matches the oracle's expression tree
        c = c - np.outer(lam * v, v)
    if len(_ARTIFACT_MEMO) >= _ARTIFACT_MEMO_CAP:
        _ARTIFACT_MEMO.clear()
    _ARTIFACT_MEMO[memo_key] = [list(v) for v in out]
    return out


def pca_project2(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """2-D PCA projection (pc1, pc2) — the corpus scatter-plot /
    coarse-bucketing layout. Both eigenvectors are driver-side literals
    (deflation, see ``top_eigvecs_local``); the projection stays one
    row-local pass with two folds, zero shuffle.
    """
    v1, v2 = top_eigvecs_local(emb, n_components=2, iters=iters, vec_col=vec_col, dim=dim)

    def fold(v: list[float]):
        varr = F.array(*[F.lit(float(x)) for x in v])
        return F.aggregate(
            F.zip_with(F.col(vec_col), varr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return emb.select(
        F.col(id_col),
        (F.round(fold(v1), 6) + F.lit(0.0)).alias("pc1"),
        (F.round(fold(v2), 6) + F.lit(0.0)).alias("pc2"),
    )


def label_centroid_drift(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-subgroup embedding drift monitor: each label's centroid scored
    against the corpus centroid — cosine and L2 distance per label. The
    standing QC for "did one source/shard/batch drift away from the
    corpus?" (the group-level complement of ``lang_centroid_outliers``,
    which scores individual vectors).

    Scale shape: both centroid families reduce to (labels × dim) and
    (dim) rows via map-side-combined aggregates over the exploded
    corpus — the corpus shuffles dim rows per input row once, everything
    downstream operates on KB-scale frames. No broadcast of the corpus,
    no pairwise work.

    Float contract: per-dim sums rounded to 4 (the summed-double gate);
    means derived from rounded sums; cosine/L2 computed as DETERMINISTIC
    sequential folds over pos-sorted mean arrays so both engines add in
    the identical order; round-6 + signed-zero normalization on outputs.
    """
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    lbl = ex.groupBy("label", "pos").agg(
        F.round(F.sum("x"), 4).alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    glob = ex.groupBy("pos").agg(
        F.round(F.sum("x"), 4).alias("_gs"), F.count(F.lit(1)).alias("_gn")
    )
    j = lbl.join(F.broadcast(glob), "pos").select(
        "label",
        "pos",
        (F.col("_s") / F.col("_n")).alias("_m"),
        (F.col("_gs") / F.col("_gn")).alias("_gm"),
        F.col("_n"),
    )
    a = j.groupBy("label").agg(
        F.max("_n").cast("long").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_m"))), lambda s: s["_m"]
        ).alias("_mv"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_gm"))), lambda s: s["_gm"]
        ).alias("_gv"),
    )

    def fold2(u, v, fn):
        return F.aggregate(
            F.zip_with(u, v, fn), F.lit(0.0), lambda acc, x: acc + x
        )

    dot_mg = fold2(F.col("_mv"), F.col("_gv"), lambda a_, b_: a_ * b_)
    n2m = fold2(F.col("_mv"), F.col("_mv"), lambda a_, b_: a_ * b_)
    n2g = fold2(F.col("_gv"), F.col("_gv"), lambda a_, b_: a_ * b_)
    l2 = fold2(F.col("_mv"), F.col("_gv"), lambda a_, b_: (a_ - b_) * (a_ - b_))
    return a.select(
        F.col("label").cast("long").alias("label"),
        "n",
        # zero-norm centroid (degenerate corpus) has no defined angle:
        # explicit NULL in both engines instead of NULL-vs-inf divergence
        F.when(
            (n2m > 0) & (n2g > 0),
            F.round(dot_mg / F.sqrt(n2m * n2g), 6) + F.lit(0.0),
        ).alias("cos_to_global"),
        (F.round(F.sqrt(l2), 6) + F.lit(0.0)).alias("l2_to_global"),
    )


def mahalanobis_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Diagonal-covariance Mahalanobis distance per vector — the standard
    embedding-QC outlier score (encoder glitches, wrong-modality rows,
    truncated inputs land far from the per-dimension envelope even when
    their norm looks normal). Emits ``(id, maha2)`` for every row;
    downstream curation thresholds or top-k's the score column like any
    per-document quality score.

    Scale shape: ONE map-side-combined aggregate reduces the corpus to
    a ``dim``-row stats frame (sum, sum-of-squares, count per position);
    means/variances derive from it and fold into a broadcast literal
    pair of arrays; scoring is then ROW-LOCAL (zip_with + sequential
    fold) on a second corpus scan — no window, no join, no per-row
    shuffle. Zero-variance dimensions contribute 0 (explicit guard, not
    a NaN) in both engines.

    Float contract: per-dim sums rounded to 4 (the summed-double gate,
    as label_centroid_drift); var = (ss − s·s/n)/n from the rounded
    sums; the score folds dimension terms in ascending position order —
    matching the oracle's ordered list_sum bit-for-bit; round-6 + 0.0.
    """
    ex = emb.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    stats = ex.groupBy("pos").agg(
        F.round(F.sum("x"), 4).alias("_s"),
        F.round(F.sum(F.col("x") * F.col("x")), 4).alias("_ss"),
        F.count(F.lit(1)).alias("_n"),
    )
    cons = stats.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("pos", (F.col("_s") / F.col("_n")).alias("m")))
            ),
            lambda s: s["m"],
        ).alias("_mu"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        (
                            (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n"))
                            / F.col("_n")
                        ).alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("_vr"),
    )
    diff2 = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("_mu"),
        lambda x, m: (x - m) * (x - m),
    )
    terms = F.zip_with(
        diff2, F.col("_vr"), lambda d2, v: F.when(v > 0, d2 / v).otherwise(F.lit(0.0))
    )
    score = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    return emb.crossJoin(F.broadcast(cons)).select(
        F.col(id_col), (F.round(score, 6) + F.lit(0.0)).alias("maha2")
    )


def matryoshka_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: tuple[int, ...] = (8, 16, 32),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of PREFIX-truncated cosine search against the full-dim
    exact top-k, one row per truncation width — the evaluation behind
    Matryoshka-style dimension reduction (Kusupati et al. 2022): how
    much retrieval quality survives if the index stores only the first
    d coordinates.  The dimension-axis complement to the existing
    compression dials (``emb_ann_pq`` quantizes values, this truncates
    coordinates; ``emb_ann_recall`` grades bucketing).

    Output: (dim, n_queries, total_hits, mean_recall) with
    mean_recall = total_hits / (k·n_queries) — integer counts and ONE
    fixed division, so cross-engine float drift cannot touch the values
    (ranking near-ties break on neighbor id, as all ANN ops here).

    Scale shape: ONE corpus scan — the broadcast query batch joins the
    corpus once, every truncation's score is computed row-locally from
    array slices of the same pair, and the (dim, score) pairs unpivot
    in-row via ``inline`` before a single (query, dim)-partitioned
    top-k window over |queries|·|dims|·|corpus| scored rows (AQE
    coalesces).  The exact side reuses ``ann_bruteforce_topk`` and is
    |queries|·k rows — broadcast into the hit join.
    """
    exact = ann_bruteforce_topk(emb, query_ids, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    # prefix norms are per-ROW quantities: compute each side's once
    # before the join (the `cosine` docstring's rule — per-pair norm
    # recomputation would triple the interpreted-fold work)
    queries = emb.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        *[norm(F.slice(vec_col, 1, int(d))).alias(f"qn_{d}") for d in dims],
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        *[norm(F.slice(vec_col, 1, int(d))).alias(f"nn_{d}") for d in dims],
    )
    pairs = F.broadcast(queries).join(
        corpus, F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(int(d)).cast("long").alias("dim"),
                        (
                            dot(F.slice("qv", 1, int(d)), F.slice("nv", 1, int(d)))
                            / (F.col(f"qn_{d}") * F.col(f"nn_{d}"))
                        ).alias("score"),
                    )
                    for d in dims
                ]
            )
        ),
    )
    w = Window.partitionBy("query_id", "dim").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    approx = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("dim", "query_id", "neighbor_id")
    )
    hits = approx.join(F.broadcast(exact), ["query_id", "neighbor_id"]).groupBy(
        "dim"
    ).agg(F.count(F.lit(1)).cast("long").alias("total_hits"))
    denom = float(k * len(query_ids))
    # every dim level appears (k·|queries| ranked rows each) — left join
    # from the literal dim frame so a zero-hit level still emits a row
    dims_df = emb.sparkSession.createDataFrame(
        [(int(d),) for d in sorted(dims)], "dim long"
    )
    return (
        # left-outer can only broadcast the BUILD (right) side — the
        # |dims|-row hits frame; a left-side hint would be dead
        dims_df.join(F.broadcast(hits), "dim", "left")
        .select(
            "dim",
            F.lit(len(query_ids)).cast("long").alias("n_queries"),
            F.coalesce(F.col("total_hits"), F.lit(0).cast("long")).alias("total_hits"),
            (
                F.round(
                    F.coalesce(F.col("total_hits"), F.lit(0)).cast("double")
                    / F.lit(denom),
                    6,
                )
                + F.lit(0.0)
            ).alias("mean_recall"),
        )
    )


def sq8_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of int8 SCALAR-quantized cosine search against the exact
    float top-k — the value-quantization quality dial next to PQ
    (subspace codebooks), Matryoshka (prefix truncation) and binary
    (sign bits): SQ8 is the FAISS ``SQ8``/Milvus default that cuts the
    index 4× with near-lossless recall.

    Train: per-dimension corpus (min, max) — one aggregate, a
    2·dim-double artifact. Encode: code_i = floor((x_i − mn_i)·255/span_i
    + 0.5) clamped to [0, 255] (explicit half-up, no banker's rounding
    ambiguity cross-engine). Search is ASYMMETRIC (ADC-style): the query
    stays float, the corpus vector is dequantized mn_i + code_i·span_i/255
    — the standard SQ trade.

    Output: ONE row (n_queries, n_corpus, total_hits, recall) —
    integer hit counts and a single fixed division, so cross-engine
    float drift cannot touch the values (near-ties break on neighbor_id
    as in every ANN op here).

    Scale shape: the (min, max) train pass is a map-side-combined
    aggregate; its one-row result broadcasts via crossJoin into a single
    corpus scan that quantizes, dequantizes and scores row-locally
    against the broadcast query batch — zero corpus shuffle before the
    per-query top-k window (AQE coalesces). Identical plan at 100 TB.
    """
    exact = ann_bruteforce_topk(emb, query_ids, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    stats = emb.agg(
        F.array(
            *[F.min(F.col(vec_col)[i].cast("double")) for i in range(dim)]
        ).alias("mn"),
        F.array(
            *[F.max(F.col(vec_col)[i].cast("double")) for i in range(dim)]
        ).alias("mx"),
    )

    def deq(x: Column, i: Column) -> Column:
        mn_i = F.get("mn", i)
        span = F.get("mx", i) - mn_i
        code = F.least(
            F.greatest(
                F.floor((x.cast("double") - mn_i) * F.lit(255.0) / span + F.lit(0.5)),
                F.lit(0).cast("long"),
            ),
            F.lit(255).cast("long"),
        )
        return F.when(span > 0, mn_i + code.cast("double") * span / F.lit(255.0)).otherwise(mn_i)

    corpus = (
        emb.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.transform(F.col(vec_col), deq).alias("dv"),
        )
        .select("neighbor_id", "dv", norm(F.col("dv")).alias("dn"))
    )
    queries = emb.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", dot(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    approx = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id")
    )
    hits = approx.join(F.broadcast(exact), ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("total_hits")
    )
    n_corpus = emb.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    denom = float(k * len(query_ids))
    return (
        hits.crossJoin(F.broadcast(n_corpus)).select(
            F.lit(len(query_ids)).cast("long").alias("n_queries"),
            "n_corpus",
            F.coalesce(F.col("total_hits"), F.lit(0).cast("long")).alias("total_hits"),
            (
                F.round(
                    F.coalesce(F.col("total_hits"), F.lit(0)).cast("double") / F.lit(denom), 6
                )
                + F.lit(0.0)
            ).alias("recall"),
        )
    )


def binary_hamming_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of SIGN-BIT (1-bit) quantized Hamming search against the
    exact float cosine top-k — the most aggressive point on the
    compression ladder (64× vs float32): bit_i = x_i > 0, distance =
    popcount(bits_q XOR bits_c). The centered-embedding sign trick
    behind binary IVF indexes and hash-based retrieval.

    Ranking is INTEGER-ONLY (hamming asc, neighbor_id asc), so the
    approximate side is bit-deterministic cross-engine by construction;
    recall then needs only integer hit counts + one fixed division.

    Scale shape: bits are computed row-locally in one corpus scan (a
    64-term boolean fold — no train pass at all), the query batch
    broadcasts, and the only wide op is the per-query top-k window.
    At 100 TB the same plan holds; a production index would pack the
    bits into one long and XOR/popcount, which Catalyst would fold the
    same way — kept elementwise here for oracle-identical shape.
    """
    exact = ann_bruteforce_topk(emb, query_ids, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    bits = lambda c: F.transform(c, lambda x: (x.cast("double") > 0).cast("int"))  # noqa: E731
    queries = emb.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"), bits(F.col(vec_col)).alias("qb")
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), bits(F.col(vec_col)).alias("nb")
    )
    hamming = F.aggregate(
        F.zip_with("qb", "nb", lambda a, b: (a != b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("hd", hamming)
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hd"), F.asc("neighbor_id"))
    approx = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id")
    )
    hits = approx.join(F.broadcast(exact), ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("total_hits")
    )
    n_corpus = emb.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    denom = float(k * len(query_ids))
    return (
        hits.crossJoin(F.broadcast(n_corpus)).select(
            F.lit(len(query_ids)).cast("long").alias("n_queries"),
            "n_corpus",
            F.coalesce(F.col("total_hits"), F.lit(0).cast("long")).alias("total_hits"),
            (
                F.round(
                    F.coalesce(F.col("total_hits"), F.lit(0)).cast("double") / F.lit(denom), 6
                )
                + F.lit(0.0)
            ).alias("recall"),
        )
    )
