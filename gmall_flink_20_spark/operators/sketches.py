"""Sketch aggregates under value gates.

Approximate aggregates (quantile sketches, HLL) have no engine-independent
oracle — two engines' estimates legitimately differ. The gateable form is
the ERROR-BOUND check (same pattern as distinct.approx_unique_count_checked):
compute the estimate AND the exact bound test in one plan, emit the exact
part plus a boolean; the SQL oracle emits the exact part plus literal TRUE,
so a hash match proves the estimator's contract held on every group.

``percentile_approx`` is Spark's Greenwald-Khanna-style sketch: with
``accuracy`` A it guarantees a DETERMINISTIC rank error ε = 1/A around
the target rank ⌈p·n⌉. ``approx_quantiles_checked`` asserts exactly
that, via one extra keyed pass that ranks each estimate against the
group's values: the estimate's rank interval [count_< + 1, count_≤]
must intersect ⌈p·n⌉ ± max(1, ε·n). The one-rank floor mirrors the HLL
gate's absolute floor — at tiny n the ε·n band collapses below the
sketch's tie/boundary resolution (empirically Spark's summaries land
within 1 rank of the band there; the theoretical ε·n bound governs as
n grows).

Scale shape: the sketch itself is a mergeable partial aggregate (one
shuffle on the group key, constant state per group); the bound check adds
one broadcast of the tiny per-group estimates and a second keyed pass —
and is a harness/validation construct, not something a production job
re-runs per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_quantiles_checked", "cms_counts", "mg_heavy_hitters_checked"]


def approx_quantiles_checked(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    accuracy: int = 100,
) -> DataFrame:
    """Per group: exact row count plus one boolean per requested quantile
    asserting the sketch estimate's rank interval intersects
    ⌈p·n⌉ ± max(1, ε·n), ε = 1/accuracy.

    Checked as: count(v ≤ est) ≥ ⌈p·n⌉ − slack  AND
    count(v < est) + 1 ≤ ⌈p·n⌉ + slack. Emits (group, n_rows,
    q<pp>_ok...)."""
    eps = 1.0 / accuracy
    vals = df.select(F.col(group_col), F.col(value_col).alias("_v"))
    agg = vals.groupBy(group_col).agg(
        F.percentile_approx("_v", list(probs), accuracy).alias("_qs"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    est = agg.select(
        F.col(group_col),
        F.col("n_rows"),
        F.posexplode("_qs").alias("_pi", "_est"),
    )
    ranked = (
        vals.join(F.broadcast(est), group_col)
        .groupBy(group_col, "_pi", "n_rows", "_est")
        .agg(
            F.sum((F.col("_v") <= F.col("_est")).cast("long")).alias("_le"),
            F.sum((F.col("_v") < F.col("_est")).cast("long")).alias("_lt"),
        )
    )
    p_arr = F.array(*[F.lit(p) for p in probs])
    target = F.ceil(F.element_at(p_arr, F.col("_pi") + 1) * F.col("n_rows")).cast(
        "double"
    )
    slack = F.greatest(F.lit(1.0), F.lit(eps) * F.col("n_rows").cast("double"))
    checked = ranked.withColumn(
        "_ok",
        (F.col("_le").cast("double") >= target - slack)
        & (F.col("_lt").cast("double") + 1.0 <= target + slack),
    )
    flags = [
        F.max(F.when(F.col("_pi") == i, F.col("_ok"))).alias(
            f"q{int(round(p * 100)):02d}_ok"
        )
        for i, p in enumerate(probs)
    ]
    return checked.groupBy(group_col, "n_rows").agg(*flags)


def cms_counts(
    df: DataFrame,
    item_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Count-min sketch frequencies with the exact counts alongside.

    Unlike the quantile/HLL estimators, a CMS with FIXED hash functions
    is fully deterministic, so the whole thing sits under the exact
    value gate: both engines build the identical d×w sketch (md5-derived
    row hashes) and read back identical estimates. Emits per distinct
    item: the CMS estimate, the exact count, and the overcount — whose
    non-negativity is the sketch's one-sided guarantee (est ≥ exact,
    always; collisions only ever inflate).

    Plan shape for 100 TB: the sketch build is ONE explode(d) +
    map-side-combined count — shuffle volume is ≤ d·w cells however
    large the input; the readback joins the distinct items against the
    BROADCAST sketch (d·w rows, ~32 KB here) and takes a min over d.
    The exact side is the same one-shuffle count any exact top-k needs;
    in production you'd drop it and keep only the sketch — it's emitted
    here because the gate proves the estimator against it.
    """
    items = df.select(F.col(item_col).cast("long").alias("item"))
    rows = items.select(
        "item",
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row_id"),
    ).select(
        "item",
        "row_id",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(row_id AS STRING), ':', "
            "CAST(item AS STRING))), 1, 15), 16, 10) AS BIGINT) "
            f"% {w}"
        ).alias("bucket"),
    )
    sketch = rows.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("cell"))
    exact = items.groupBy("item").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.select(
        "item",
        "exact_cnt",
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row_id"),
    ).select(
        "item",
        "exact_cnt",
        "row_id",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(row_id AS STRING), ':', "
            "CAST(item AS STRING))), 1, 15), 16, 10) AS BIGINT) "
            f"% {w}"
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("item", "exact_cnt")
        .agg(F.min("cell").cast("long").alias("est_cnt"))
        .select(
            F.col("item").alias("item_id"),
            "est_cnt",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            (F.col("est_cnt") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
    )


def mg_heavy_hitters_checked(
    df: DataFrame, key_col: str, k: int = 32
) -> DataFrame:
    """Misra-Gries heavy hitters under the error-bound gate (the WA6
    pattern): every key whose true count exceeds n/(k+1) must survive
    the distributed sketch with its estimate in [true − n/(k+1), true].

    Distributed shape (Agarwal et al., "Mergeable Summaries"): each
    partition runs a capacity-k MG sketch over its rows inside
    ``mapInPandas`` (k counters, ~k·16 bytes — the whole summary is
    smaller than one parquet footer), and merging is a plain SUM of the
    per-partition counters: each partition's error is ≤ n_p/(k+1), so
    the summed error is ≤ n/(k+1) — the published bound without any
    cross-partition truncation step. The exact counts (needed for the
    gate anyway) come from one map-side-combined aggregate.

    The estimates themselves are partitioning-dependent (no
    engine-independent oracle exists), so — like the HLL gate — the
    OUTPUT is (key, exact count, bound-held boolean) for the provably
    heavy keys, and the SQL oracle emits the exact counts with literal
    TRUE: a hash match proves both coverage and the bound.
    """
    import pandas as pd

    kk = int(k)

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf["_k"].tolist():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < kk:
                    counters[v] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()), "est": list(counters.values())}
            )

    keyed = df.select(F.col(key_col).cast("long").alias("_k"))
    summary = (
        keyed.mapInPandas(_mg, schema="item long, est long")
        .groupBy("item")
        .agg(F.sum("est").cast("long").alias("est"))
    )
    exact = keyed.groupBy(F.col("_k").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    total = keyed.agg(F.count(F.lit(1)).alias("_total"))
    thresh = F.col("_total") / F.lit(float(kk + 1))
    heavy = (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("exact_cnt") > thresh)
        .join(summary, "item", "left")
    )
    return heavy.select(
        F.col("item").alias("item_id"),
        "exact_cnt",
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("exact_cnt"))
            & ((F.col("exact_cnt") - F.col("est")) <= F.col("_total") / F.lit(float(kk + 1)))
        ).alias("mg_within_bound"),
    )
