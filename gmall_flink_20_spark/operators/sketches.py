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

__all__ = [
    "approx_quantiles_checked",
    "cms_counts",
    "mg_heavy_hitters_checked",
    "kmv_sketches",
    "theta_overlap",
]


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


# ------------------------------------------------------------------ KMV/theta
# Bottom-k ("KMV" / theta) distinct sketches with SET ALGEBRA — the one
# distinct-count structure HLL cannot give you: because the sketch IS a
# uniform sample of the hashed key space below a threshold theta, two
# sketches intersect/union meaningfully, so |A ∩ B| and |A ∪ B| are
# estimable from k-sized state per key. Fixed md5-derived hashes make
# the whole estimator deterministic — like cms_counts it sits under the
# EXACT value gate (the DuckDB oracle reproduces every estimate
# bit-for-bit), not a weaker error-bound check.
KMV_M = 16**15  # hash domain [0, M): 60-bit md5 prefix, same as minhash


def _hash60(col: str) -> "F.Column":
    """Deterministic 60-bit hash of a column (md5 prefix as bigint) —
    the same base-hash construction the minhash pipeline uses, so both
    engines evaluate it identically."""
    return F.expr(
        f"CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )


def kmv_sketches(
    d: DataFrame, k: int = 256, salt_buckets: int = 32
) -> DataFrame:
    """Per key of a distinct (key, uh) frame: the bottom-k sketch.

    Emits (key, n_exact, theta, sketch) where theta is the k-th smallest
    hash (or M when the key has fewer than k distinct hashes — exact
    mode) and sketch is the sorted array of hashes strictly below theta
    (k−1 values when saturated).

    Scale shape: the k-min is TWO-PHASE so no task ever sorts a whole
    key's distinct set — a local k-min per (key, hash-salt bucket)
    window (each partition holds ~1/salt_buckets of the key's hashes),
    then the global k-min over the ≤ salt_buckets·k survivors. The
    per-key state is O(k) regardless of input size; n_exact is the
    audit column a production job would drop.
    """
    from pyspark.sql import Window

    n = d.groupBy("key").agg(F.count(F.lit(1)).alias("n_exact"))
    w_loc = Window.partitionBy(
        "key", F.pmod(F.col("uh"), F.lit(salt_buckets))
    ).orderBy("uh")
    local = d.withColumn("_rn", F.row_number().over(w_loc)).filter(
        F.col("_rn") <= k
    )
    w_glob = Window.partitionBy("key").orderBy("uh")
    kmin = (
        local.drop("_rn")
        .withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= k)
    )
    sk = kmin.groupBy("key").agg(F.sort_array(F.collect_list("uh")).alias("kmin"))
    return (
        sk.join(n, "key")
        .select(
            "key",
            "n_exact",
            F.when(F.size("kmin") < k, F.lit(KMV_M))
            .otherwise(F.element_at("kmin", k))
            .alias("theta"),
            "kmin",
        )
        .select(
            "key",
            "n_exact",
            "theta",
            F.expr("filter(kmin, h -> h < theta)").alias("sketch"),
        )
    )


def theta_overlap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int = 256,
    salt_buckets: int = 32,
) -> DataFrame:
    """Pairwise distinct-set overlap between key groups via theta-sketch
    algebra: for each key pair (a < b), the estimated distinct-id counts
    of each side, of the intersection, and of the union — plus the exact
    audit columns the gate proves them against.

    Estimator: with theta_ab = min(theta_a, theta_b), every sketch value
    below theta_ab is a uniform sample of the key's id set at rate
    theta_ab/M, so est = |below-theta values| · M / theta_ab, applied to
    the per-key, intersected, and unioned value sets alike (the standard
    theta-sketch set-operation rule). Deterministic given the fixed
    hash: the oracle reproduces every double bit-for-bit.

    Scale shape: ONE distinct shuffle on (key, hash) feeds everything
    (persisted — it is read by the sketch pass, the count pass, and the
    exact-intersection audit); sketches are O(k) per key, and the pair
    expansion is |keys|² over k-sized arrays — constant-size work
    however large the input. The exact-intersection join (on the hash,
    bounded fan-out ≤ |keys| per hash) is the audit a production job
    drops, same contract as cms_counts' exact side.
    """
    from ._cache import eager_persist

    d = eager_persist(
        df.select(
            F.col(key_col).alias("key"), _hash60(id_col).alias("uh")
        ).distinct()
    )
    # the sketch frame feeds BOTH sides of the pair join — persist it
    # (|keys| rows of O(k) state, KB-scale) so the two window passes run
    # once, not once per join side
    s = eager_persist(kmv_sketches(d, k, salt_buckets))
    exact = (
        d.alias("x")
        .join(d.alias("y"), "uh")
        .filter(F.col("x.key") < F.col("y.key"))
        .groupBy(
            F.col("x.key").alias("key_a"), F.col("y.key").alias("key_b")
        )
        .agg(F.count(F.lit(1)).alias("_exact_inter"))
    )
    a = s.select(
        F.col("key").alias("key_a"),
        F.col("n_exact").alias("n_a"),
        F.col("theta").alias("theta_a"),
        F.col("sketch").alias("sk_a"),
    )
    b = s.select(
        F.col("key").alias("key_b"),
        F.col("n_exact").alias("n_b"),
        F.col("theta").alias("theta_b"),
        F.col("sketch").alias("sk_b"),
    )
    m_d = F.lit(float(KMV_M))
    pairs = (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .withColumn("theta_ab", F.least("theta_a", "theta_b"))
        .withColumn("sa", F.expr("filter(sk_a, h -> h < theta_ab)"))
        .withColumn("sb", F.expr("filter(sk_b, h -> h < theta_ab)"))
    )
    return (
        pairs.select(
            "key_a",
            "key_b",
            "n_a",
            "n_b",
            F.round(
                F.size("sk_a").cast("double") * m_d / F.col("theta_a").cast("double"), 3
            ).alias("est_a"),
            F.round(
                F.size("sk_b").cast("double") * m_d / F.col("theta_b").cast("double"), 3
            ).alias("est_b"),
            F.round(
                F.size(F.array_intersect("sa", "sb")).cast("double")
                * m_d
                / F.col("theta_ab").cast("double"),
                3,
            ).alias("est_inter"),
            F.round(
                F.size(F.array_union("sa", "sb")).cast("double")
                * m_d
                / F.col("theta_ab").cast("double"),
                3,
            ).alias("est_union"),
        )
        .join(exact, ["key_a", "key_b"], "left")
        .select(
            "key_a",
            "key_b",
            "n_a",
            "n_b",
            "est_a",
            "est_b",
            "est_inter",
            "est_union",
            F.coalesce(F.col("_exact_inter"), F.lit(0)).cast("long").alias("exact_inter"),
        )
    )
