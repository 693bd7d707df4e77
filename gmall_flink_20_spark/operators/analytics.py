"""Event-analytics operators a product-analytics engine is expected to
ship on top of the reference's event model: as-of (temporal) join,
funnel conversion, retention cohorts, and pivoted behavior counts.

All four are expressed as declarative DataFrame plans shaped for the
100 TB case:

* ``asof_join`` — the union+window formulation: ONE shuffle on the join
  key, no range/theta join, no per-row probe. This is the standard
  scalable as-of (a sort-merge within each key partition), versus a
  range join whose candidate set is data-dependent.
* ``funnel`` / ``retention_cohorts`` — window functions partitioned by
  user: Catalyst plans consecutive windows over the same partitioning
  with a single exchange, so per-user state never round-trips.
* ``pivot_counts`` — pivot with EXPLICIT values, so no extra collect
  pass to discover the pivot domain, and the whole thing is one
  map-side-combined aggregation.

Reference scope: the reference's apps stop at windowed counts/top-N
(e.g. channelApp.java:52-72 counts by channel×behavior); these extend
the same event model to the joins/cohorts a warehouse team would add
next, keeping the DuckDB-oracle parity discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "session_stats",
    "price_integrity_audit",
    "supplier_hhi",
    "bot_cadence_score",
    "order_backlog",
    "seasonal_anomaly",
    "item_pairs",
    "association_rules",
    "markov_next_topk",
    "cohort_ltv",
    "seasonality_lift",
    "seasonality_cells",
    "referential_audit",
    "asof_join",
    "funnel",
    "retention_cohorts",
    "pivot_counts",
    "rate_anomaly",
    "changepoint_cusum",
    "transition_matrix",
    "market_basket",
    "revenue_concentration",
    "revenue_concentration_dist",
    "range_partitioned_rank",
    "ltv_deciles_dist",
    "inter_event_gaps",
    "fulfillment_latency",
    "seasonality_profile",
    "dwell_time",
    "temporal_join",
    "incremental_agg_refresh",
    "cart_abandonment",
    "stickiness",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    carry: dict[str, str],
    right_tiebreak: str | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row of the same
    ``key`` with ``right.time <= left.time`` (ties at equal timestamps
    match — "as of now" includes now).

    ``carry`` maps right-side column → output alias. ``right_tiebreak``
    picks a winner among right rows sharing (key, time): the row with
    the LARGEST tiebreak value wins (deterministic). ``tolerance_s``
    nulls the carried values when the matched right row is older than
    ``left.time - tolerance_s`` (the "don't attribute to a click from
    last month" guard).

    Plan shape: tag each side, union, one window per carried column
    partitioned by key ordered by (time, side, tiebreak) with
    ``last(..., ignorenulls)`` over rows-unbounded-preceding, then keep
    the left rows. One exchange on ``key``; the sort is the merge step
    of a sort-merge as-of. No range join, no broadcast requirement on
    either side — both sides stream through the same partitioning, so
    this survives two large inputs.
    """
    lcols = left.columns
    lextra = [c for c in lcols if c not in (key, time_col)]
    tb = right_tiebreak if right_tiebreak is not None else F.lit(0)
    time_type = right.schema[time_col].dataType
    r = right.select(
        F.col(key),
        F.col(time_col),
        # side=0 sorts right rows BEFORE left rows at equal time, so a
        # left row at t sees right rows at exactly t (<= semantics)
        F.lit(0).alias("_side"),
        (F.col(tb) if isinstance(tb, str) else tb).alias("_tb"),
        F.col(time_col).cast(time_type).alias("_r_time"),
        *[F.col(src).alias(f"_c_{alias}") for src, alias in carry.items()],
    )
    l = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(time_type).alias("_r_time"),
        *[F.lit(None).cast(r.schema[f"_c_{alias}"].dataType).alias(f"_c_{alias}") for alias in carry.values()],
        *[F.col(c).alias(f"_l_{c}") for c in lextra],
    )
    r = r.select(
        *[F.col(c) for c in r.columns],
        *[F.lit(None).cast(l.schema[f"_l_{c}"].dataType).alias(f"_l_{c}") for c in lextra],
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l)
    out_cols = [F.last(f"_c_{alias}", ignorenulls=True).over(w).alias(alias) for alias in carry.values()]
    matched_t = F.last("_r_time", ignorenulls=True).over(w).alias("_m_time")
    res = carried.select(key, time_col, "_side", *[c for c in carried.columns if c.startswith("_l_")], *out_cols, matched_t)
    res = res.filter(F.col("_side") == 1).drop("_side")
    if tolerance_s is not None:
        lag = (
            F.expr(f"INTERVAL {int(tolerance_s)} SECONDS")
            if str(time_type) == "TimestampType()"
            else F.lit(int(tolerance_s))
        )
        keep = F.col("_m_time") >= F.col(time_col) - lag
        res = res.select(
            key,
            time_col,
            *[F.col(c) for c in res.columns if c.startswith("_l_")],
            *[F.when(keep, F.col(a)).alias(a) for a in carry.values()],
            F.when(keep, F.col("_m_time")).alias("_m_time"),
        )
    renames = {f"_l_{c}": c for c in lcols if c not in (key, time_col)}
    for old, new in renames.items():
        res = res.withColumnRenamed(old, new)
    return res.withColumnRenamed("_m_time", "matched_time")


def funnel(
    events: DataFrame,
    steps: list[str],
    horizon_s: int,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: users whose earliest qualifying chain
    step[0] → step[1] → ... completes with every later step at or after
    the previous step's time and within ``horizon_s`` of step[0].

    Semantics (the standard "earliest chain" funnel): s0 = min time of
    step[0]; s_i = min time of step[i] with s_{i-1} <= t <= s0 + horizon.
    Greedy-earliest is optimal here: taking the earliest valid time for
    each step never excludes a completion a later choice would allow.

    Returns one row per step: (step, step_name, users).

    Plan: one exchange on ``user_col``; each chained min is a window
    over the same partitioning (no orderBy → no per-window sort), then
    a single global aggregation of COUNT(s_i IS NOT NULL).
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, time_col, type_col)
    horizon = (
        F.expr(f"INTERVAL {int(horizon_s)} SECONDS")
        if str(df.schema[time_col].dataType) == "TimestampType()"
        else F.lit(int(horizon_s))
    )
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if i > 0:
            cond = cond & (F.col(time_col) >= F.col(f"_s{i - 1}"))
            cond = cond & (F.col(time_col) <= F.col("_s0") + horizon)
        df = df.withColumn(f"_s{i}", F.min(F.when(cond, F.col(time_col))).over(w))
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_s{i}").alias(f"_s{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[F.count(f"_s{i}").alias(f"_n{i}") for i in range(len(steps))]
    )
    stack = ", ".join(f"{i + 1}, '{steps[i]}', _n{i}" for i in range(len(steps)))
    return counts.select(
        F.expr(f"stack({len(steps)}, {stack}) AS (step, step_name, users)")
    ).select(F.col("step").cast("long"), "step_name", F.col("users").cast("long").alias("users"))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Classic retention triangle: cohort users by their first active
    day, count distinct users active at each day-offset from cohort day.

    Returns (cohort_day string, day_offset long, users long).

    Plan: window-min over ``user_col`` (one exchange) computes each
    user's cohort day without a self-join, then one distinct-aggregate
    on (cohort, offset, user) → (cohort, offset). Two shuffles total —
    the same count a hand-written two-phase MR job would need.
    """
    day = F.to_date(F.col(time_col))
    w = Window.partitionBy(user_col)
    df = (
        events.select(F.col(user_col), day.alias("_day"))
        .withColumn("_cohort", F.min("_day").over(w))
        .withColumn("_offset", F.datediff(F.col("_day"), F.col("_cohort")))
    )
    if max_offset is not None:
        df = df.filter(F.col("_offset") <= max_offset)
    return (
        df.groupBy("_cohort", "_offset")
        .agg(F.countDistinct(user_col).alias("users"))
        .select(
            F.col("_cohort").cast("string").alias("cohort_day"),
            F.col("_offset").cast("long").alias("day_offset"),
            F.col("users").cast("long").alias("users"),
        )
    )


def pivot_counts(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """Cross-tab: one row per ``group_col``, one column per pivot value,
    cells = row counts (0 when absent).

    ``values`` is explicit, so Spark skips the distinct-values discovery
    job and the plan is a single map-side-combined aggregation — the
    shape ``GROUP BY group`` + N conditional sums lowers to.
    """
    out = df.groupBy(group_col).pivot(pivot_col, values).count()
    return out.select(
        group_col, *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(v) for v in values]
    )


def rate_anomaly(
    events: DataFrame,
    bucket_s: int = 3600,
    trailing: int = 24,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Event-rate anomaly detection: z-score of each time bucket's count
    against the trailing ``trailing`` observed buckets of the same key.

    Emits only buckets with a full trailing history and non-constant
    history (exact integer gate ``trailing·Σx² − (Σx)² > 0``, no float
    epsilon). The z-score is computed from exact integer sums in a fixed
    expression order and rounded to 6 decimals, so the DuckDB oracle
    reproduces it bit-for-bit; the anomaly flag compares the ROUNDED
    score so the flag can't straddle an engine ulp.

    Plan shape for 100 TB: one map-side-combined count per (key, bucket)
    — shuffle volume is bucket×key cardinality, independent of event
    rate — then one window per key ordered by bucket. The window's
    re-exchange on the bare key only moves the AGGREGATED bucket rows
    (thousands per key), so keeping the fine (key, bucket) partitioning
    for the raw-event aggregate is the right trade: full parallelism
    where the data is big, a tiny shuffle where it's small.
    """
    bucket_end = (
        F.col(ts_col).cast("long")
        - (F.col(ts_col).cast("long") % F.lit(bucket_s))
        + F.lit(bucket_s)
    ).alias("bucket_end_s")
    counts = events.groupBy(F.col(key_col), bucket_end).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_end_s")
        .rowsBetween(-trailing, -1)
    )
    t = float(trailing)
    hist = counts.select(
        F.col(key_col),
        F.col("bucket_end_s"),
        F.col("cnt"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
        F.sum("cnt").over(w).cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.lit(t)
    # population variance from exact integer sums: (n·Σx² − (Σx)²) / n²
    var_num = F.lit(trailing) * F.col("ss") - F.col("s") * F.col("s")
    var = var_num.cast("double") / F.lit(t * t)
    z = F.round((F.col("cnt").cast("double") - mean) / F.sqrt(var), 6)
    return (
        hist.filter((F.col("n_hist") == trailing) & (var_num > 0))
        .select(
            F.col(key_col),
            F.col("bucket_end_s"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(mean, 6).alias("mean_trailing"),
            z.alias("zscore"),
            (F.abs(z) > F.lit(3.0)).alias("is_anomaly"),
        )
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition estimates over per-key event
    sequences: for every ordered state pair, how often ``to_state``
    immediately follows ``from_state`` within a key's (ts, tiebreak)
    ordered stream, and the row-normalized transition probability.

    Probabilities are double divisions of exact counts, so the oracle is
    bit-identical.

    Ordering contract: the sequence is ordered by an EXPLICIT epoch-µs
    long (unix_micros) plus the tiebreak, not by the raw timestamp.
    Spark truncates parquet timestamps to µs while other engines (the
    DuckDB oracle) may keep ns — ordering both engines on the same
    µs-floored long makes lead() pairing deterministic even if a
    generator ever emits sub-µs precision.

    Plan shape for 100 TB: one window (lead) partitioned by the key —
    a single exchange; the pair aggregate then collapses to
    |states|² rows before the tiny row-total broadcast join. No
    self-join of the event stream.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)), F.col(tiebreak_col)
    )
    pairs = (
        events.select(
            F.col(key_col),
            F.col(state_col).alias("from_state"),
            F.col(ts_col),
            F.col(tiebreak_col),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("cnt").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("row_total").cast("long").alias("row_total"),
            (F.col("cnt").cast("double") / F.col("row_total").cast("double")).alias(
                "prob"
            ),
        )
    )


def rfm_segments(
    events: DataFrame,
    action: str = "purchase",
    quantiles: int = 4,
    user_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """RFM segmentation — the classic marketing-analytics operator:
    per user, Recency (days since last ``action`` relative to the
    corpus's latest action), Frequency (action count) and Monetary
    (action value total), each scored into ``quantiles`` equal-rank
    buckets (1 = best), concatenated into a segment label.

    Determinism contract: monetary is summed in integer CENTS (value is
    2-decimal), so no float summation order can flip a rank; every
    ntile orders with a ``user_col`` tiebreak, so bucket boundaries are
    engine-independent.

    Plan: one groupBy(user) over the filtered action stream (map-side
    combined), the reference timestamp is a broadcast single-row
    aggregate, then three ntile windows over the PER-USER frame — the
    |users|-row aggregate, not the event stream. This is the exact
    form; at 100 TB swap the global ntiles for approx_percentile
    cutoffs broadcast back (the ``lm.ccnet_buckets_approx`` shape) and
    the plan loses its only global sorts.
    """
    filt = events.filter(F.col(type_col) == F.lit(action)).select(
        F.col(user_col),
        F.col(time_col).cast("long").alias("_ts"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
    )
    ref = filt.agg(F.max("_ts").alias("_ref_ts"))
    per_user = (
        filt.groupBy(user_col)
        .agg(
            F.max("_ts").alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("_cents").cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            F.col(user_col),
            F.floor((F.col("_ref_ts") - F.col("_last")) / F.lit(86400.0))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    q = int(quantiles)
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col(user_col).asc())
    f_w = Window.orderBy(F.col("frequency").desc(), F.col(user_col).asc())
    m_w = Window.orderBy(F.col("monetary_cents").desc(), F.col(user_col).asc())
    scored = per_user.select(
        F.col(user_col),
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(q).over(r_w).cast("long").alias("r_score"),
        F.ntile(q).over(f_w).cast("long").alias("f_score"),
        F.ntile(q).over(m_w).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def item_pairs(
    events: DataFrame,
    cap: int = 50,
    min_support: int = 2,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Co-interaction item pairs (item_a < item_b, n_users >= min_support)
    with the per-user cap bounding pair fan-out at cap² — the shared edge
    builder for item-CF (item_cooccurrence) and graph analytics
    (triangle_stats, pagerank)."""
    ui = events.groupBy(F.col(user_col), F.col(item_col)).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_cap = Window.partitionBy(user_col).orderBy(
        F.col("_cnt").desc(), F.col(item_col).asc()
    )
    capped = (
        ui.withColumn("_r", F.row_number().over(w_cap))
        .filter(F.col("_r") <= cap)
        .select(F.col(user_col).alias("_u"), F.col(item_col).alias("_i"))
    )
    # Row-local pair generation (r13 optimization, guide §2.4): the
    # previous self-join on _u shuffled `capped` twice and paid a join
    # before the pair aggregate; collecting each user's (cap-bounded)
    # item set once and exploding the ordered combinations row-locally
    # produces the identical pair multiset with ONE keyed shuffle —
    # per-row work stays bounded by cap² by the same cap that bounded
    # the join fan-out. Measured 3.15 s → 1.51 s on the sf0.1 click
    # graph, byte-identical output.
    arr = capped.groupBy("_u").agg(F.sort_array(F.collect_set("_i")).alias("_xs"))
    return (
        arr.select(
            F.explode(
                F.expr(
                    "flatten(transform(_xs, (x, i) -> "
                    "transform(slice(_xs, i + 2, size(_xs)), "
                    "y -> struct(x AS item_a, y AS item_b))))"
                )
            ).alias("_p")
        )
        .select("_p.item_a", "_p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .filter(F.col("n_users") >= min_support)
    )


def item_cooccurrence(
    events: DataFrame,
    k: int = 10,
    cap: int = 50,
    min_support: int = 2,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Item-item co-occurrence — the "users who interacted with A also
    interacted with B" kernel behind item-based collaborative filtering
    and related-item widgets. Counts, per ordered pair, how many users
    interacted with both items, then keeps each item's top ``k``
    neighbors by that count.

    Scale guard: the pair stage is quadratic in DISTINCT ITEMS PER USER,
    so each user's item set is first capped to their ``cap`` most-
    frequent items (ties on item id) — per-user pair fan-out is bounded
    by cap² regardless of activity, the same candidate-bounding move the
    LSH dedup family makes. The per-user rank is a keyed window (item
    variety per user is catalog-bounded, not activity-bounded); the pair
    count is one map-side-combined aggregate; the final top-k is a keyed
    window over item_a.

    Deterministic: every rank ties on item id; counts are integers.
    """
    pairs = item_pairs(events, cap, min_support, user_col, item_col)
    sym = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_users",
        )
    )
    w_k = Window.partitionBy("item_a").orderBy(
        F.col("n_users").desc(), F.col("item_b").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select("item_a", "item_b", "n_users", F.col("rank").cast("long").alias("rank"))
    )


def latest_state(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """CDC-style upsert compaction: collapse an append-only change
    stream to one row per key — the LATEST by (event time, tiebreak).
    This is the materialization every changelog-backed dim table needs
    before it can broadcast-join a fact stream.

    One keyed window (row_number desc over the key's changes) — a
    single exchange on the key, no self-join against a max-ts subquery.
    Ties break on ``tiebreak_col`` so replays and engines agree.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).cast("long").desc(), F.col(tiebreak_col).desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def robust_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    z: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier report per key — the outlier rule that
    survives the outliers themselves (mean/stddev get dragged by the
    very points being tested; the median absolute deviation does not).
    Flags values with |v − median| > z·MAD and reports per key:
    (n, median, MAD, outlier count).

    Exactness contract: values are integer cents, and both medians are
    the EXACT rank-⌈n/2⌉ element under a deterministic (value, tiebreak)
    order — the corpus_stats median pattern, no percentile estimator —
    so the oracle reproduces every number bit-for-bit.

    Plan: two keyed windows (the second reuses the first's partitioning)
    plus two broadcast joins of |keys|-row medians; one final aggregate.
    At 100 TB swap the exact rank for approx_percentile per key (same
    plan minus the windows) when the gate isn't needed.
    """
    from pyspark.sql import Window as W

    base = events.select(
        F.col(key_col),
        F.col(tiebreak_col),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
    )
    w1 = W.partitionBy(key_col).orderBy(F.asc("_cents"), F.asc(tiebreak_col))
    ranked = base.withColumn("_rn", F.row_number().over(w1)).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy(key_col))
    )
    med = ranked.filter(F.col("_rn") == F.ceil(F.col("_n") / 2)).select(
        F.col(key_col), F.col("_cents").alias("_med")
    )
    dev = base.join(F.broadcast(med), key_col).withColumn(
        "_dev", F.abs(F.col("_cents") - F.col("_med"))
    )
    w2 = W.partitionBy(key_col).orderBy(F.asc("_dev"), F.asc(tiebreak_col))
    dranked = dev.withColumn("_rn", F.row_number().over(w2)).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy(key_col))
    )
    mad = dranked.filter(F.col("_rn") == F.ceil(F.col("_n") / 2)).select(
        F.col(key_col), F.col("_dev").alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("_med").cast("long").alias("median_cents"),
            F.min("_mad").cast("long").alias("mad_cents"),
            F.sum(
                (
                    F.col("_dev").cast("double") > F.lit(float(z)) * F.col("_mad").cast("double")
                ).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


def engagement_rollup(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    wau_days: int = 7,
    mau_days: int = 30,
) -> DataFrame:
    """DAU/WAU/MAU per calendar day — the standing engagement report:
    for every day with activity, the distinct users active that day, in
    the trailing ``wau_days``, and in the trailing ``mau_days``.

    Shape: each (user, day) pair fans out to the ``mau_days`` report
    days it contributes to (one explode — sliding distinct-over-window
    has no narrower exact form), then ONE aggregate computes all three
    horizons as conditional distincts. The fan-out factor is bounded by
    ``mau_days``, and the pre-explode distinct collapses each user's
    day to one row first — per-user event volume never multiplies. At
    100 TB swap the exact distinct for per-day HLL sketches merged over
    the window (same report, mergeable state, no fan-out).

    Report days are restricted to the observed activity range (no
    trailing ghost days after the last event).
    """
    ud = (
        events.select(F.col(user_col), F.to_date(F.col(time_col)).alias("_day"))
        .distinct()
    )
    bounds = ud.agg(F.max("_day").alias("_max_day"))
    fanned = (
        ud.crossJoin(F.broadcast(bounds))
        .select(
            F.col(user_col),
            F.explode(
                F.sequence(
                    F.col("_day"),
                    F.least(
                        F.date_add(F.col("_day"), int(mau_days) - 1),
                        F.col("_max_day"),
                    ),
                )
            ).alias("day"),
            F.col("_day").alias("_active_day"),
        )
        .withColumn("_off", F.datediff(F.col("day"), F.col("_active_day")))
    )
    return (
        fanned.groupBy("day")
        .agg(
            F.countDistinct(F.when(F.col("_off") == 0, F.col(user_col))).alias("dau"),
            F.countDistinct(
                F.when(F.col("_off") < int(wau_days), F.col(user_col))
            ).alias("wau"),
            F.countDistinct(F.col(user_col)).alias("mau"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
        )
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the report that decides
    whether a key needs salting BEFORE the job that would discover it by
    dying: per top-``top_k`` key, its row count, share of all rows, and
    the skew factor (count / mean-per-key). A factor ≫ 1 on the head
    key means one reducer owns that multiple of the average load.

    One map-side-combined count per key, one broadcast of the two-value
    total/distinct aggregate, one TakeOrdered for the head — no global
    sort of the key space.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n_keys"),
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("key").cast("string").alias("key"),
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_total").cast("double"), 6).alias(
                "share"
            ),
            F.round(
                F.col("cnt").cast("double")
                / (F.col("_total").cast("double") / F.col("_n_keys").cast("double")),
                6,
            ).alias("skew_factor"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def group_trend(
    events: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-group least-squares trend of value over time — drift/trend
    detection as one aggregate: slope (per day) and intercept from the
    moment sums, x measured in days since the corpus start so the
    moments stay small and the normal-equation cancellation is benign.

    Float contract: the slope derives from VARIANCE-scale moments
    (Sxy/n − x̄·ȳ over Sxx/n − x̄²) with an identical expression tree in
    both engines, rounded to 6 — the same summed-double argument as the
    covariance gate. Values are integer cents; x is an exact integer
    second count scaled by a constant.
    """
    base = events.select(
        F.col(key_col),
        F.col(time_col).cast("long").alias("_ts"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
    )
    t0 = base.agg(F.min("_ts").alias("_t0"))
    xy = base.crossJoin(F.broadcast(t0)).select(
        F.col(key_col),
        ((F.col("_ts") - F.col("_t0")).cast("double") / F.lit(86400.0)).alias("_x"),
        F.col("_cents").cast("double").alias("_y"),
    )
    agg = xy.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    mx = F.col("_sx") / F.col("_n")
    my = F.col("_sy") / F.col("_n")
    cov = F.col("_sxy") / F.col("_n") - mx * my
    var = F.col("_sxx") / F.col("_n") - mx * mx
    # zero x-variance (single event, or all events at one timestamp) has
    # no defined trend: guard explicitly so both engines agree on NULL
    # instead of Spark NULL vs DuckDB inf/NaN on the raw division
    slope = F.when(var > 0, cov / var)
    return agg.select(
        F.col(key_col),
        F.col("_n").cast("long").alias("n"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope_cents_per_day"),
        (F.round(my - slope * mx, 6) + F.lit(0.0)).alias("intercept_cents"),
    )


def market_basket(
    lines: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_pair_count: int = 3,
) -> DataFrame:
    """Association-rule mining over order baskets — support, confidence
    (both directions) and lift for every item pair co-purchased in at
    least ``min_pair_count`` orders. The batch complement of
    ``item_cooccurrence`` (events): that ranks per-anchor neighbors,
    this emits the calibrated rule statistics a recommender or
    assortment team consumes.

    Scale shape: pair generation is a self-equi-join of the DISTINCT
    (order, item) basket frame on the order key — fan-out is bounded by
    C(basket,2), and TPC-H-style baskets are tens of items, so the pair
    stream is a small constant multiple of the input (never |items|²).
    Item marginals reduce to |items| rows and broadcast back into the
    rule frame; the total-orders count rides the same broadcast as a
    1-row cross join. One shuffle for the basket distinct (reused by
    the self-join's both sides via cache), one for the pair count.

    Float contract: support/confidence/lift are round-6 over exact
    counts with identical expression trees in both engines (+0.0
    normalizes signed zero, though counts make negatives impossible).
    """
    from ._cache import eager_persist

    baskets = eager_persist(
        lines.select(
            F.col(order_col).alias("_o"), F.col(item_col).alias("_i")
        ).distinct()
    )
    totals = baskets.agg(F.count_distinct(F.col("_o")).alias("_n"))
    item_counts = baskets.groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))
    a = baskets.select(F.col("_o"), F.col("_i").alias("part_a"))
    b = baskets.select(F.col("_o"), F.col("_i").alias("part_b"))
    pairs = (
        a.join(b, "_o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_pair_count))
    )
    ca = item_counts.select(F.col("_i").alias("part_a"), F.col("_c").alias("_ca"))
    cb = item_counts.select(F.col("_i").alias("part_b"), F.col("_c").alias("_cb"))
    nd = F.col("_n").cast("double")
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("part_a").cast("long").alias("part_a"),
            F.col("part_b").cast("long").alias("part_b"),
            F.col("pair_count").cast("long").alias("pair_count"),
            (F.round(F.col("pair_count") / nd, 6) + F.lit(0.0)).alias("support"),
            (F.round(F.col("pair_count") / F.col("_ca"), 6) + F.lit(0.0)).alias(
                "conf_a_b"
            ),
            (F.round(F.col("pair_count") / F.col("_cb"), 6) + F.lit(0.0)).alias(
                "conf_b_a"
            ),
            (
                F.round(
                    F.col("pair_count") * nd / (F.col("_ca") * F.col("_cb")), 6
                )
                + F.lit(0.0)
            ).alias("lift"),
        )
    )


def revenue_concentration(
    orders: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Revenue-concentration report: decile-level Pareto curve plus the
    Gini coefficient — "do 20% of customers carry 80% of revenue?" as
    one frame. Emits one row per spend decile (1 = highest spenders):
    customer count, decile revenue, cumulative share, and the corpus
    Gini (constant column, exact rank formula over integer cents).

    Scale shape: everything beyond the per-key aggregate operates on the
    |keys| frame, which is orders-of-magnitude smaller than the fact
    table. The global sort that ranks keys is the same |keys|-sized
    total order customers_ltv already pays; decile stats then reduce to
    10 rows. Gini uses G = 2·Σ(r·x)/(n·Σx) − (n+1)/n over ascending
    ranks — one aggregate over the ranked frame, no second sort.

    Determinism: integer-cent sums, ties ranked by key; round-6 + 0.0.
    """
    per = orders.groupBy(key_col).agg(
        F.sum(F.round(F.col(amount_col) * 100, 0).cast("long"))
        .cast("long")
        .alias("_cents")
    )
    w_desc = Window.orderBy(F.col("_cents").desc(), F.col(key_col).asc())
    w_asc = Window.orderBy(F.col("_cents").asc(), F.col(key_col).desc())
    ranked = per.select(
        "_cents",
        F.ntile(10).over(w_desc).alias("decile"),
        F.row_number().over(w_asc).cast("long").alias("_r_asc"),
    )
    gini_f = ranked.agg(
        (
            F.lit(2.0) * F.sum(F.col("_r_asc") * F.col("_cents"))
            / (F.count(F.lit(1)) * F.sum("_cents"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1))
        ).alias("_g"),
        F.sum("_cents").alias("_total"),
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_cents").cast("long").alias("decile_cents"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(gini_f))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_keys",
            "decile_cents",
            (
                F.round(
                    F.sum("decile_cents").over(w_cum) / F.col("_total").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("cum_share"),
            (F.round(F.col("_g"), 6) + F.lit(0.0)).alias("gini"),
        )
    )


def inter_event_gaps(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Cadence profile: per event type, the distribution of gaps between
    a user's consecutive events of that type — min / exact p50 / exact
    p90 / max seconds plus gap count. The operational answer to "how
    often does a user click / how stale is latest-state allowed to be",
    and the data-driven source of session-gap and watermark-delay
    thresholds the windowed operators consume.

    Plan shape: one exchange on (user, type) for the lag window, then a
    map-side-combined per-type aggregate of the |gaps| frame. Exact
    percentiles (not approx) because the output is a calibration
    artifact: Spark's percentile() and DuckDB's quantile_cont() share
    the h = (n−1)·p linear-interpolation definition, and gaps are exact
    integer seconds, so the interpolated values match bit-for-bit.
    """
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    ts_s = F.col(time_col).cast("long")
    gaps = (
        events.select(type_col, user_col, time_col, id_col)
        .withColumn("_prev", F.lag(ts_s).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.col(type_col), (ts_s - F.col("_prev")).alias("_gap"))
    )
    return gaps.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("_gap").cast("long").alias("min_gap_s"),
        (F.round(F.percentile(F.col("_gap"), F.lit(0.5)), 6) + F.lit(0.0)).alias(
            "p50_gap_s"
        ),
        (F.round(F.percentile(F.col("_gap"), F.lit(0.9)), 6) + F.lit(0.0)).alias(
            "p90_gap_s"
        ),
        F.max("_gap").cast("long").alias("max_gap_s"),
    )


def fulfillment_latency(
    orders: DataFrame,
    lineitem: DataFrame,
    priority_col: str = "o_orderpriority",
) -> DataFrame:
    """Order-fulfillment SLA report: per order priority, the
    distribution of days from order placement to the LAST line shipment
    — n_orders, min / exact p50 / exact p90 / max days, and mean days.
    The operational "are urgent orders actually shipped faster" answer
    the TPC-H q4/q12 shapes circle but never emit.

    Plan shape: the orders⋈lineitem equi-join shuffles both sides on
    orderkey once (the fact-table join every TPC-H plan already pays);
    the per-order max(shipdate) folds INTO the same exchange (groupBy on
    the join key), then the per-priority rollup is a map-side-combined
    aggregate over the |orders| frame. No window functions.

    Determinism: latency is an exact integer day diff; mean is one
    long-sum / count division; percentiles interpolate exact integers
    with the shared h = (n−1)·p definition (see inter_event_gaps).
    """
    per_order = (
        orders.select(
            "o_orderkey", F.col(priority_col).alias("priority"),
            F.to_date("o_orderdate").alias("_od"),
        )
        .join(
            lineitem.select("l_orderkey", F.to_date("l_shipdate").alias("_sd")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "priority", "_od")
        .agg(F.max("_sd").alias("_last"))
        .select("priority", F.datediff(F.col("_last"), F.col("_od")).cast("long").alias("_days"))
    )
    return per_order.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("_days").cast("long").alias("min_days"),
        (F.round(F.percentile(F.col("_days"), F.lit(0.5)), 6) + F.lit(0.0)).alias("p50_days"),
        (F.round(F.percentile(F.col("_days"), F.lit(0.9)), 6) + F.lit(0.0)).alias("p90_days"),
        F.max("_days").cast("long").alias("max_days"),
        (
            F.round(F.sum("_days").cast("double") / F.count(F.lit(1)).cast("double"), 6)
            + F.lit(0.0)
        ).alias("mean_days"),
    )


def seasonality_profile(
    events: DataFrame,
    time_col: str = "ts",
) -> DataFrame:
    """Day-of-week × hour-of-day load profile with independence lift:
    for every (dow, hour) cell, the observed event count and its lift
    against the expectation under dow⊥hour independence —
    ``lift = obs / dow_total / hour_total * grand_total``. Cells with
    lift ≫ 1 are the traffic concentrations capacity planning and
    anomaly baselines key on; a flat lift≈1 surface says the margins
    explain everything.

    dow/hour derive from epoch-second INTEGER arithmetic
    (``pmod(floor(ts/86400) + 4, 7)``, 0 = Sunday — 1970-01-01 was a
    Thursday), not engine calendar functions, so both engines bucket
    identically with no locale/week-origin divergence. floor-division
    plus pmod (NOT truncating cast + ``%`` remainder) keeps pre-1970
    negative-epoch timestamps in the 0-6 / 0-23 ranges.

    Scale shape: one map-side-combined groupBy over at most 168 cells;
    the dow/hour margins and the grand total derive FROM the 168-row
    cell frame (window sums over a tiny frame), never rescanning the
    events. The lift division chain is fixed-order on exact longs.
    """
    cells = (
        events.select(*seasonality_cells(time_col))
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return seasonality_lift(cells)


def seasonality_cells(time_col: str = "ts") -> list:
    """The dow/hour bucketing projection (floor-div + pmod epoch
    arithmetic — see seasonality_profile), shared by the batch and
    streaming forms so both bucket identically."""
    ts_s = F.col(time_col).cast("long")
    return [
        F.pmod(F.floor(ts_s / F.lit(86400)) + F.lit(4), F.lit(7)).alias("dow"),
        F.pmod(F.floor(ts_s / F.lit(3600)), F.lit(24)).alias("hour"),
    ]


def seasonality_lift(cells: DataFrame) -> DataFrame:
    """Independence-lift post-processing over the ≤168-row (dow, hour,
    n_events) cell frame — margins and grand total via tiny window sums,
    the division chain left-associated (shared by batch + streaming)."""
    w_dow = Window.partitionBy("dow")
    w_hour = Window.partitionBy("hour")
    w_all = Window.partitionBy()
    return cells.select(
        F.col("dow").cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"),
        "n_events",
        (
            F.round(
                F.col("n_events").cast("double")
                / F.sum("n_events").over(w_dow).cast("double")
                / F.sum("n_events").over(w_hour).cast("double")
                * F.sum("n_events").over(w_all).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("lift"),
    )


def range_partitioned_rank(
    per: DataFrame,
    value_col: str,
    key_col: str,
    nbuckets: int = 32,
    out: str = "_r_asc",
) -> DataFrame:
    """EXACT global ascending row_number over ``(value asc, key desc)``
    with NO single-partition sort — the two-phase range-partitioned
    ranking that replaces an unpartitioned ``Window.orderBy`` at scale
    (VERDICT r4 item 2: the global-sort decile/Gini scale-killer).

    Phase 1: ``approx_percentile`` cutoffs (one mergeable GK-sketch
    aggregate) split the value domain into ``nbuckets`` roughly-equal
    ranges; every row is bucketed ROW-LOCALLY against the broadcast
    cutoff array (ties share a bucket, so tie order stays bucket-local).
    Phase 2: bucket counts (≤ nbuckets rows — the only unpartitioned
    window, over a frame that never grows with data) become broadcast
    rank offsets, and each bucket ranks locally with a PARTITIONED
    window. Global rank = offset + local rank — bit-identical to the
    unpartitioned form because range partitioning preserves the total
    order. Sketch error only skews bucket SIZES, never correctness.

    At 100 TB: the biggest sort is |keys|/nbuckets per task instead of
    |keys| in one task; nbuckets scales with the cluster.
    """
    probs = [i / nbuckets for i in range(1, nbuckets)]
    cuts = per.agg(F.percentile_approx(value_col, probs, 10000).alias("_cuts"))
    b = (
        per.crossJoin(F.broadcast(cuts))
        .withColumn(
            "_bucket",
            F.size(F.filter("_cuts", lambda c: F.col(value_col) > c)).cast("long"),
        )
        .drop("_cuts")
    )
    bc = b.groupBy("_bucket").agg(F.count(F.lit(1)).cast("long").alias("_bc"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    off = bc.select(
        "_bucket",
        F.coalesce(F.sum("_bc").over(w_off), F.lit(0)).cast("long").alias("_off"),
    )
    w_loc = Window.partitionBy("_bucket").orderBy(
        F.col(value_col).asc(), F.col(key_col).desc()
    )
    return (
        b.join(F.broadcast(off), "_bucket")
        .withColumn(out, (F.col("_off") + F.row_number().over(w_loc)).cast("long"))
        .drop("_bucket", "_off")
    )


def _ntile10_from_desc_rank(r_desc, n):
    """ntile(10)-identical decile from an exact 1-based descending rank:
    group boundaries are cum-size(d) = d·q + min(d, n mod 10) (first
    ``n mod 10`` groups hold q+1 rows). Pure long comparisons — no
    division whose double rounding could flip a decile at 1e9+ keys."""
    q = F.floor(n / F.lit(10)).cast("long")
    r = (n - q * F.lit(10)).cast("long")
    d = F.lit(1).cast("long")
    for i in range(1, 10):
        d = d + (r_desc > F.lit(i) * q + F.least(F.lit(i).cast("long"), r)).cast("long")
    return d


def revenue_concentration_dist(
    orders: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    nbuckets: int = 32,
) -> DataFrame:
    """``revenue_concentration`` with the scale-safe ranking: identical
    output (same oracle gates both), but the |keys| frame is ranked via
    ``range_partitioned_rank`` instead of an unpartitioned window, and
    the decile derives from the exact rank arithmetically
    (``_ntile10_from_desc_rank``) instead of a second global-sort ntile.
    The only unpartitioned windows left run on the ≤nbuckets offset
    frame and the 10-row decile frame — both constant-size at any scale.
    """
    per = orders.groupBy(key_col).agg(
        F.sum(F.round(F.col(amount_col) * 100, 0).cast("long"))
        .cast("long")
        .alias("_cents")
    )
    ranked = range_partitioned_rank(per, "_cents", key_col, nbuckets)
    stats = ranked.agg(
        (
            F.lit(2.0) * F.sum(F.col("_r_asc") * F.col("_cents"))
            / (F.count(F.lit(1)) * F.sum("_cents"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1))
        ).alias("_g"),
        F.sum("_cents").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(stats))
        .withColumn(
            "decile",
            _ntile10_from_desc_rank(
                F.col("_n") + F.lit(1) - F.col("_r_asc"), F.col("_n")
            ),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("_cents").cast("long").alias("decile_cents"),
            F.max("_g").alias("_g"),
            F.max("_total").alias("_total"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return dec.select(
        F.col("decile").cast("long").alias("decile"),
        "n_keys",
        "decile_cents",
        (
            F.round(
                F.sum("decile_cents").over(w_cum) / F.col("_total").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("cum_share"),
        (F.round(F.col("_g"), 6) + F.lit(0.0)).alias("gini"),
    )


def ltv_deciles_dist(
    orders: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    nbuckets: int = 32,
) -> DataFrame:
    """``customers_ltv`` with the scale-safe ranking: per-customer order
    count + integer-cent spend + spend decile, where the decile comes
    from ``range_partitioned_rank`` + exact ntile arithmetic instead of
    an unpartitioned ntile window. Output identical to the exact form
    (same oracle); the per-key frame is never sorted in one task."""
    per = orders.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col(amount_col) * 100, 0).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )
    ranked = range_partitioned_rank(per, "total_cents", key_col, nbuckets)
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            key_col,
            "n_orders",
            "total_cents",
            _ntile10_from_desc_rank(
                F.col("_n") + F.lit(1) - F.col("_r_asc"), F.col("_n")
            )
            .cast("long")
            .alias("ltv_decile"),
        )
    )


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit — one row per FK relation
    ``(name, child, child_key, parent, parent_key)``: child row count,
    orphan count (child keys with no parent row — NULL keys included,
    matching the LEFT-JOIN-IS-NULL convention in both engines), and the
    orphan share. The standing data-quality gate a warehouse runs after
    every load; a nonzero share is a broken upstream join feed.

    Scale shape: each relation is a LEFT ANTI join on the key (AQE
    broadcasts dim-sized parents; fact⋈fact shuffles on the key it would
    shuffle on anyway) feeding COUNT aggregates — two scalar frames per
    relation, unioned into a |relations|-row report. No windows, no
    driver-side iteration over data (the loop is over the RELATION LIST,
    a schema-sized constant)."""
    outs = []
    for name, child, ckey, parent, pkey in relations:
        total = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orph = child.join(
            parent.select(F.col(pkey).alias("_pk")),
            F.col(ckey) == F.col("_pk"),
            "left_anti",
        ).agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        outs.append(
            total.crossJoin(orph).select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_orphans",
                (
                    F.round(
                        F.col("n_orphans").cast("double")
                        / F.col("n_child").cast("double"),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("orphan_share"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def cohort_ltv(
    orders: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    date_col: str = "o_orderdate",
) -> DataFrame:
    """Acquisition-cohort LTV curves: customers cohorted by FIRST order
    month; one row per (cohort_month, age_months) with active customers,
    integer-cent revenue, cumulative cohort revenue, and cumulative LTV
    per acquired customer — the retention-economics table every
    subscription/commerce review reads ("does month-6 LTV cover CAC?").

    Month arithmetic is calendar-exact integers (year·12 + month — no
    epoch division, no engine calendar quirks); money is integer cents;
    the cumulative window runs over the (cohorts × ages) frame, which is
    calendar-bounded (≤ a few thousand rows at ANY corpus scale), never
    over customers. Two shuffles total: the per-customer cohort min and
    the per-cell aggregate — both map-side combined.
    """
    m = (F.year(F.col(date_col)) * 12 + F.month(F.col(date_col))).cast("long")
    base = orders.select(
        F.col(key_col).alias("_k"),
        m.alias("_m"),
        F.round(F.col(amount_col) * 100, 0).cast("long").alias("_cents"),
    )
    cohort = base.groupBy("_k").agg(F.min("_m").alias("_cm"))
    sizes = cohort.groupBy("_cm").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        base.join(cohort, "_k")
        .groupBy(F.col("_cm"), (F.col("_m") - F.col("_cm")).alias("age_months"))
        .agg(
            F.count_distinct(F.col("_k")).cast("long").alias("active_customers"),
            F.sum("_cents").cast("long").alias("revenue_cents"),
        )
    )
    w_cum = (
        Window.partitionBy("_cm")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(F.broadcast(sizes), "_cm")
        .select(
            F.col("_cm").cast("long").alias("cohort_month"),
            F.col("age_months").cast("long").alias("age_months"),
            "cohort_size",
            "active_customers",
            "revenue_cents",
            F.sum("revenue_cents").over(w_cum).cast("long").alias("cum_revenue_cents"),
            (
                F.round(
                    F.sum("revenue_cents").over(w_cum).cast("double")
                    / F.lit(100.0)
                    / F.col("cohort_size").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("cum_ltv_per_customer"),
        )
    )


def seasonal_anomaly(
    events: DataFrame,
    time_col: str = "ts",
    z_threshold: float = 1.75,
) -> DataFrame:
    """Seasonality-adjusted anomaly cells: bucket events into
    (week, dow, hour) counts, baseline each (dow, hour) cell against its
    OWN history across weeks (zero-filled — a week where the cell was
    silent counts as 0, which is exactly the anomaly a naive groupBy
    would hide), and emit the cells whose |z| ≥ ``z_threshold``. The
    "is this Tuesday 9am actually abnormal, or is Tuesday 9am always
    like this" detector that a raw trailing z-score (rate_anomaly)
    cannot express.

    Determinism: counts are exact integers, so mean = s/n and
    var = (ss − s·s/n)/n are fixed-order double expressions over exact
    longs — no rounding gate needed before the final round-6. var = 0
    cells never emit (zero variance ⇒ every week identical ⇒ z
    undefined/0).

    Scale shape: one map-side-combined count to |weeks|·168 cells; the
    zero-fill grid is (distinct weeks × observed dow-hour cells), both
    broadcast-size; baseline stats are a second tiny aggregate. Nothing
    downstream of the first count touches event rows.
    """
    ts_s = F.col(time_col).cast("long")
    cells = (
        events.select(
            F.floor(ts_s / F.lit(604800)).cast("long").alias("week"),
            *seasonality_cells(time_col),
        )
        .groupBy("week", "dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    weeks = cells.select("week").distinct()
    slots = cells.select("dow", "hour").distinct()
    grid = weeks.crossJoin(slots)
    filled = grid.join(cells, ["week", "dow", "hour"], "left").select(
        "week", "dow", "hour", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events")
    )
    stats = filled.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("n_events").cast("long").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("_ss"),
    )
    j = filled.join(F.broadcast(stats), ["dow", "hour"])
    mean = F.col("_s").cast("double") / F.col("_n").cast("double")
    var = (
        F.col("_ss").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double") / F.col("_n").cast("double")
    ) / F.col("_n").cast("double")
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    return (
        j.filter(var > 0)
        .select(
            "week", "dow", "hour", "n_events",
            (F.round(mean, 6) + F.lit(0.0)).alias("cell_mean"),
            (F.round(z, 6) + F.lit(0.0)).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= z_threshold)
    )


def order_backlog(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Open-order backlog time series: for every calendar month, how
    many orders were placed on-or-before that month but not fully
    shipped until after it — the operations dashboard behind
    fulfillment_latency's distribution view ("is the backlog growing?").

    Interval counting without an interval join: each order contributes
    a +1 delta at its placement month and a −1 at the month AFTER its
    last shipment; the backlog at month m is the running sum of deltas
    through m. One orderkey join (the exchange every TPC-H plan pays),
    one map-side-combined delta aggregate to a calendar-bounded month
    frame, one cumulative window over THAT frame — event rows are never
    windowed. Exact integer arithmetic throughout.
    """
    per = (
        orders.select(
            "o_orderkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long").alias("_m0"),
        )
        .join(
            lineitem.select(
                "l_orderkey",
                (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("long").alias("_ms"),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "_m0")
        .agg(F.max("_ms").alias("_m1"))
    )
    deltas = (
        per.select(F.col("_m0").alias("month"), F.lit(1).cast("long").alias("_d"))
        .unionByName(
            per.select((F.col("_m1") + 1).alias("month"), F.lit(-1).cast("long").alias("_d"))
        )
        .groupBy("month")
        .agg(F.sum("_d").cast("long").alias("_delta"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        F.col("month").cast("long").alias("month"),
        "_delta",
        F.sum("_delta").over(w).cast("long").alias("open_orders"),
    ).select("month", F.col("_delta").alias("delta"), "open_orders")


def bot_cadence_score(
    events: DataFrame,
    min_events: int = 5,
    user_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Bot-cadence detector: per user with ≥ ``min_events`` events, the
    inter-event-gap coefficient of variation (std/mean). Human activity
    is bursty (cv ≳ 1); scripted clients fire on near-fixed timers
    (cv ≈ 0) — the first-pass bot screen a traffic-quality pipeline
    runs before any model. Emits (user, n_gaps, mean_gap_s, cv).

    Determinism: gaps are exact integer seconds; mean = s/n and
    var = (ss − s·s/n)/n are fixed-order expressions over exact longs
    (the seasonal_anomaly contract); cv is round-6 with a zero-mean
    guard (all-identical timestamps emit cv NULL, not NaN).

    Scale shape: one lag window partitioned by user (the sessionization
    exchange), one map-side-combined per-user aggregate. Nothing global.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    ts_s = F.col(time_col).cast("long")
    gaps = (
        events.select(F.col(user_col), F.col(time_col), ts_s.alias("_t"), F.col(id_col))
        .withColumn("_prev", F.lag("_t").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(F.col(user_col), (F.col("_t") - F.col("_prev")).alias("_g"))
    )
    agg = gaps.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("_g").cast("long").alias("_s"),
        F.sum(F.col("_g") * F.col("_g")).cast("long").alias("_ss"),
    ).filter(F.col("n_gaps") >= min_events - 1)
    mean = F.col("_s").cast("double") / F.col("n_gaps").cast("double")
    var = (
        F.col("_ss").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double") / F.col("n_gaps").cast("double")
    ) / F.col("n_gaps").cast("double")
    return agg.select(
        F.col(user_col),
        "n_gaps",
        (F.round(mean, 6) + F.lit(0.0)).alias("mean_gap_s"),
        F.when(mean > 0, F.round(F.sqrt(var) / mean, 6) + F.lit(0.0)).alias("cv"),
    )


def supplier_hhi(
    lineitem: DataFrame,
) -> DataFrame:
    """Supply-concentration report: per part, the Herfindahl–Hirschman
    index of supplier revenue shares (Σ share²; 1 = single-sourced,
    → 1/n_suppliers = evenly split) plus supplier count and total
    revenue cents — the procurement-risk screen ("which parts have no
    second source?").

    Determinism: HHI computes in its INTEGER form — Σ share² =
    (Σ cents_i²) / T², so the only float ops are two divisions of exact
    long sums ((Σc²)/T/T, fixed order); a float Σ share² would be
    summation-order-dependent across engines. Two shuffles on the same
    part key (map-side combined), no windows, no joins beyond the
    part-key rollup pair.
    """
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("_cents")
    )
    return (
        ps.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("_cents").cast("long").alias("revenue_cents"),
            F.sum(F.col("_cents") * F.col("_cents")).cast("long").alias("_sq"),
        )
        .select(
            F.col("l_partkey"),
            "n_suppliers",
            "revenue_cents",
            (
                F.round(
                    F.col("_sq").cast("double")
                    / F.col("revenue_cents").cast("double")
                    / F.col("revenue_cents").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("hhi"),
        )
    )


def price_integrity_audit(
    lineitem: DataFrame,
    part: DataFrame,
    max_rel_dev: float = 0.5,
) -> DataFrame:
    """Fact-vs-dim price integrity: per part brand, how many lineitem
    rows have an implied unit price deviating more than ``max_rel_dev``
    from the part's catalog retail price — the post-load sanity gate
    that catches unit mix-ups, broken currency conversions, and bad
    joins upstream (the value-level complement to referential_audit's
    key-level checks).

    The deviation test is EXACT LONG arithmetic — with the default 0.5:
    ``|ext_cents − ret_cents·qty| · 2 > ret_cents·qty`` (no float
    division per row, so no engine can disagree on a borderline row).
    One fact⋈dim join (part broadcasts) into a map-side-combined
    per-brand aggregate.
    """
    li = lineitem.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("_ext"),
        F.col("l_quantity").cast("long").alias("_qty"),
    )
    pa = part.select(
        "p_partkey",
        F.col("p_brand"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("_ret"),
    )
    num = int(round(max_rel_dev * 2))  # 0.5 -> the |dev|*2 > base form
    j = li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
    viol = (
        F.abs(F.col("_ext") - F.col("_ret") * F.col("_qty")) * 2
        > F.col("_ret") * F.col("_qty") * num
    ).cast("long")
    return j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(viol).cast("long").alias("n_violations"),
        (
            F.round(
                F.sum(viol).cast("double") / F.count(F.lit(1)).cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("violation_share"),
    )


def session_stats(
    sessions: DataFrame,
) -> DataFrame:
    """One-row session-quality summary over a (user_id, session_start_s,
    session_end_s, n_events) frame: session/user counts, events per
    session, and the exact p50/p90/max ACTIVE duration (last−first
    event, i.e. excluding the closing inactivity gap) — the engagement
    dashboard header fed by the sessionization every analytics stack
    runs.

    Exact longs for counts and durations; percentiles use the shared
    h = (n−1)·p definition (see inter_event_gaps); means are single
    fixed-order divisions. One map-side-combined aggregate over the
    |sessions| frame.
    """
    dur = (F.col("session_end_s") - F.lit(1800) - F.col("session_start_s")).cast(
        "long"
    )
    base = sessions.select(
        F.col("user_id"), dur.alias("_dur"), F.col("n_events").cast("long").alias("_ne")
    )
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.sum("_ne").cast("long").alias("n_events"),
        (
            F.round(
                F.sum("_ne").cast("double") / F.count(F.lit(1)).cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("events_per_session"),
        (F.round(F.percentile(F.col("_dur"), F.lit(0.5)), 6) + F.lit(0.0)).alias(
            "p50_duration_s"
        ),
        (F.round(F.percentile(F.col("_dur"), F.lit(0.9)), 6) + F.lit(0.0)).alias(
            "p90_duration_s"
        ),
        F.max("_dur").cast("long").alias("max_duration_s"),
    )


def association_rules(
    events: DataFrame,
    min_pair_support: int = 2,
    cap: int = 50,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Directed association rules A→B over per-user item baskets —
    support / confidence / lift, the market-basket classic (Agrawal &
    Srikant's Apriori output at depth 2). For every ordered item pair
    co-held by ≥ ``min_pair_support`` users:

        confidence(A→B) = |users(A,B)| / |users(A)|
        lift(A→B) = confidence / (|users(B)| / n_users)

    Both are single fixed-order divisions of exact longs (lift as
    (pair·n)/(a·b) — one division), so the oracle is bit-identical.

    Scale shape: rides ``item_pairs`` (per-user basket capped at
    ``cap`` → pair fan-out ≤ cap² per user, map-side-combined counts);
    item supports are one extra catalog-sized aggregate joined twice —
    left unhinted so AQE broadcasts it when it fits and falls back to a
    shuffle hash join on a large catalog (a forced hint here would OOM
    the driver at catalog scale); n_users is a broadcast scalar. Emitting both
    directions from each undirected pair is a row-local explode of the
    |pairs|-sized frame, not a second pass over events.
    """
    pairs = item_pairs(
        events, cap=cap, min_support=min_pair_support,
        user_col=user_col, item_col=item_col,
    )
    supports = events.groupBy(F.col(item_col)).agg(
        F.count_distinct(F.col(user_col)).cast("long").alias("supp")
    )
    n_users = events.agg(
        F.count_distinct(F.col(user_col)).cast("long").alias("n_users")
    )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("ante"),
                    F.col("item_b").alias("cons"),
                    F.col("n_users").alias("pair_users"),
                ),
                F.struct(
                    F.col("item_b").alias("ante"),
                    F.col("item_a").alias("cons"),
                    F.col("n_users").alias("pair_users"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    sa = supports.select(F.col(item_col).alias("ante"), F.col("supp").alias("supp_a"))
    sb = supports.select(F.col(item_col).alias("cons"), F.col("supp").alias("supp_b"))
    return (
        directed.join(sa, "ante")
        .join(sb, "cons")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "cons",
            "pair_users",
            "supp_a",
            "supp_b",
            (F.col("pair_users").cast("double") / F.col("supp_a").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("pair_users") * F.col("n_users")).cast("double")
                / (F.col("supp_a") * F.col("supp_b")).cast("double")
            ).alias("lift"),
        )
    )


def markov_next_topk(
    events: DataFrame,
    k: int = 3,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` Laplace-smoothed next-state predictions per state — the
    serving-side read of ``transition_matrix``: for each from_state the
    ``k`` likeliest successors with add-one-smoothed probability

        p = (cnt + 1) / (row_total + |states|)

    (|states| = distinct observed states, so unseen successors hold
    non-zero mass). Ranking is integer-only (cnt desc, to_state asc);
    the probability is one fixed-order division — oracle bit-identical.

    Scale shape: everything downstream of the one lead() window in
    transition_matrix operates on |states|²-sized frames — broadcast
    territory regardless of corpus size.
    """
    tm = transition_matrix(events, key_col, state_col, ts_col, tiebreak_col)
    n_states = events.agg(
        F.count_distinct(F.col(state_col)).cast("long").alias("n_states")
    )
    w = Window.partitionBy("from_state").orderBy(
        F.col("cnt").desc(), F.col("to_state").asc()
    )
    return (
        tm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .crossJoin(F.broadcast(n_states))
        .select(
            "from_state",
            "to_state",
            "cnt",
            F.col("rn").cast("long").alias("rn"),
            (
                (F.col("cnt").cast("double") + F.lit(1.0))
                / (F.col("row_total").cast("double") + F.col("n_states").cast("double"))
            ).alias("smoothed_prob"),
        )
    )


def changepoint_cusum(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Single mean-shift changepoint per key over the daily count series
    via the CUSUM statistic: with daily counts x_1..x_n (days WITH data,
    ordered), prefix sums S_i, and total S_n, the break lands at
    argmax_i |n·S_i − i·S_n| (the integer-exact form of the classic
    max |S_i − (i/n)·S_n| deviation-from-uniform-drift statistic; ties
    break on the earlier day).  The day-granular complement to
    ``rate_anomaly``'s per-bucket z-score: that flags spikes, this dates
    the level shift — the first question asked when a metric drifts
    (deploys, crawler-policy changes, source swaps in an ingest feed).

    Determinism: EXACT — every quantity through the argmax is a BIGINT;
    the only double is the final normalized statistic, one fixed-order
    division rounded to 6.

    Scale shape: the corpus collapses to the (key, day, count) frame
    with map-side combine — ≤ |keys|·|days| rows, time-bounded however
    large the event stream.  The prefix-sum and argmax windows sort only
    that frame, partitioned by key (no global sort, no skew: each
    partition is ≤ |days| rows).
    """
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    w_cum = Window.partitionBy("key").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy("key")
    cum = daily.select(
        "key",
        "day",
        "x",
        F.sum("x").over(w_cum).cast("long").alias("s_i"),
        F.row_number()
        .over(Window.partitionBy("key").orderBy("day"))
        .cast("long")
        .alias("i"),
    ).select(
        "*",
        F.max("i").over(w_all).alias("n_days"),
        F.max("s_i").over(w_all).alias("s_n"),
    )
    dev = cum.withColumn(
        "cusum",
        F.abs(F.col("n_days") * F.col("s_i") - F.col("i") * F.col("s_n")).cast("long"),
    )
    w_pick = Window.partitionBy("key").orderBy(F.col("cusum").desc(), F.col("day").asc())
    return (
        dev.withColumn("_rk", F.row_number().over(w_pick))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("key").alias("event_type"),
            F.col("n_days"),
            F.col("s_n").alias("total_events"),
            F.date_format(F.col("day"), "yyyy-MM-dd").alias("cp_day"),
            F.col("cusum").alias("cusum_stat"),
            (
                F.round(
                    F.col("cusum").cast("double")
                    / (F.col("n_days").cast("double") * F.col("s_n").cast("double")),
                    6,
                )
                + F.lit(0.0)
            ).alias("cusum_norm"),
        )
    )


def trigram_paths(
    events: DataFrame,
    topk: int = 20,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-``topk`` most-travelled 3-step behavioral paths — the
    sequence-mining rung above ``transition_matrix`` (2-step) and the
    read model behind ``markov_next_topk``: which (a → b → c) journeys
    actually dominate. The classic funnel-discovery query (\"what do
    users do AROUND the purchase?\") that a 2-step matrix cannot answer
    because it forgets where the user came from.

    Per user, events order by (epoch-µs, event_id) — the same explicit
    µs-floored ordering key as ``transition_matrix``, because Spark
    truncates parquet ns-timestamps to µs while the DuckDB oracle keeps
    ns; ordering both engines on the same long makes lead() pairing
    engine-independent. Every row contributes the path (state, lead¹,
    lead²) when both successors exist for the same user. Counting and
    ranking are INTEGER-ONLY (cnt desc, then step1/step2/step3 asc), so
    the output is bit-deterministic cross-engine.

    Scale shape: exactly ONE shuffle — the per-user sort window that
    produces both leads in a single Window operator; path counting is a
    map-side-combined aggregate over ≤ |events| rows, and the final
    top-k is a rank over the |distinct paths| frame (bounded by
    |states|³, constant in corpus size).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)), F.asc(tiebreak_col)
    )
    paths = (
        events.select(
            F.col(key_col),
            F.col(state_col).alias("step1"),
            F.lead(state_col, 1).over(w).alias("step2"),
            F.lead(state_col, 2).over(w).alias("step3"),
        )
        .filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rk = Window.orderBy(
        F.desc("cnt"), F.asc("step1"), F.asc("step2"), F.asc("step3")
    )
    return (
        paths.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("rank", "step1", "step2", "step3", "cnt")
    )


def ewma_trend(
    events: DataFrame,
    window_days: int = 28,
    last_days: int = 10,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key daily-volume EWMA and deviation — the smoothed trendline
    ops dashboards draw over raw daily counts, and the denominator the
    seasonal/bot screens normalize against. Decay is DYADIC: weight
    2^(−age_days) (α = 0.5, half-life one day), truncated at
    ``window_days``; the weights are exact binary doubles (a bit shift,
    not ``pow``), so the only float work is one ≤ ``window_days``-term
    weighted mean per output row — cross-engine drift provably below
    the round-6 contract, where a libm ``pow(0.7, k)`` would carry
    implementation-defined ulps into the ranking.

        ewma(d) = Σ_{j=0..W-1} x(d−j)·2^(−j) / Σ_{j: day d−j exists} 2^(−j)

    Output: the last ``last_days`` days per key — (key, day, cnt, ewma,
    deviation = cnt − ewma), newest first by (key, day).

    Scale shape: the corpus collapses to the per-(key, day) count frame
    FIRST (map-side combine; |keys|·|days| rows — constant in corpus
    size); the truncated decay is a bounded range self-join (≤
    ``window_days`` partners per row) on that tiny frame, then one rank
    window picks the reporting tail. The raw event table is scanned
    once and never shuffled beyond the count collapse.
    """
    daily = events.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = daily.select(F.col("key"), F.col("day"), F.col("cnt"))
    b = daily.select(
        F.col("key").alias("key2"),
        F.col("day").alias("day2"),
        F.col("cnt").alias("cnt2"),
    )
    pairs = a.join(
        b,
        (F.col("key") == F.col("key2"))
        & (F.col("day2") <= F.col("day"))
        & (F.col("day2") > F.date_sub(F.col("day"), window_days)),
    )
    # 2^(-age) as LITERAL exact dyadic doubles (a broadcast |W|-row
    # frame, not a runtime pow/shift): both engines consume identical
    # bit patterns, so no libm is in the loop at all
    wts = events.sparkSession.createDataFrame(
        [(j, float(2.0**-j)) for j in range(int(window_days))], "age int, wgt double"
    )
    pairs = pairs.withColumn(
        "age", F.datediff(F.col("day"), F.col("day2")).cast("int")
    ).join(F.broadcast(wts), "age")
    sm = pairs.groupBy("key", "day", "cnt").agg(
        F.sum(F.col("cnt2").cast("double") * F.col("wgt")).alias("num"),
        F.sum("wgt").alias("den"),
    )
    scored = sm.select(
        "key",
        "day",
        "cnt",
        (F.round(F.col("num") / F.col("den"), 6) + F.lit(0.0)).alias("ewma"),
        (
            F.round(F.col("cnt").cast("double") - F.col("num") / F.col("den"), 6)
            + F.lit(0.0)
        ).alias("deviation"),
    )
    rk = Window.partitionBy("key").orderBy(F.desc("day"))
    return (
        scored.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") <= last_days)
        .drop("_rk")
        .select(
            F.col("key").alias(key_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            "ewma",
            "deviation",
        )
    )


def path_entropy(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-state next-step Shannon entropy over the first-order
    transition estimates — \"how predictable is what users do after
    state a?\": H(next|a) = −Σ_b p(b|a)·ln p(b|a), plus the normalized
    H/ln(fanout) in [0, 1] (0 = deterministic successor, 1 = uniform
    over observed successors; defined 0 when fanout = 1).

    The read model next to ``markov_next_topk`` (which answers WHAT
    follows; this answers HOW CONCENTRATED): high-entropy states are
    where recommendation/caching is useless and where funnel
    instrumentation should split.

    Determinism: p is an exact-integer division; the entropy sum has ≤
    |states| terms per row (single digits here, bounded by the state
    alphabet always), so cross-engine drift is far below the round-6
    contract.

    Scale shape: rides ``transition_matrix`` (one lead() window = one
    exchange; pairs collapse to |states|² before anything else), then a
    |states|²-row aggregate. Output |states| rows.
    """
    tm = transition_matrix(events, key_col, state_col, ts_col, tiebreak_col)
    ent = tm.groupBy("from_state").agg(
        F.max("row_total").cast("long").alias("row_total"),
        F.count(F.lit(1)).cast("long").alias("fanout"),
        (F.round(-F.sum(F.col("prob") * F.log(F.col("prob"))), 6) + F.lit(0.0)).alias(
            "entropy"
        ),
    )
    return ent.select(
        "from_state",
        "row_total",
        "fanout",
        "entropy",
        F.when(
            F.col("fanout") > 1,
            F.round(F.col("entropy") / F.log(F.col("fanout").cast("double")), 6)
            + F.lit(0.0),
        )
        .otherwise(F.lit(0.0))
        .alias("entropy_norm"),
    )


def survival_km(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan–Meier time-to-conversion with right censoring — the
    survival curve behind \"how long until a user purchases\", done the
    way retention science requires: users who never converted are NOT
    dropped (that biases the curve optimistic) but counted at-risk
    until the observation end.

    Per user: entry = min event time, conversion = first
    ``convert_type`` event; duration_days = floor((t_conv − entry)/1d)
    for converters, floor((T_max − entry)/1d) censored otherwise
    (T_max = global max event time). Deaths-before-censors at equal
    times, the standard convention. Per distinct event day d:

        n_risk(d)  = Σ_{d' ≥ d} (events(d') + censored(d'))
        S(d)       = Π_{d' ≤ d} (1 − events(d')/n_risk(d'))
                   = exp(Σ ln(...))   -- one ≤|days|-term float sum,
                                         rounded 6 after the exp

    Output: one row per day with ≥ 1 conversion event — (day,
    n_risk, n_events, n_censored, survival).

    Scale shape: the event stream is scanned ONCE — a user-keyed
    aggregate collapses it to |users| rows (map-side combined
    min/conditional-min/max), persisted as the reuse barrier (the ann.py
    pattern) so the global T_max derives from the cached user frame
    instead of a second stream scan; everything after lives on the
    |distinct days| frame (window cumsums on a single tiny partition —
    |days| rows, not data-sized). No self-join of the stream.
    """
    from ._cache import eager_persist

    # eager, not lazy (ADVICE r7): per_user feeds BOTH the tmax branch
    # and the durs branch of the crossJoin — a lazy persist lets the two
    # sides race to populate the cache and each recompute the full
    # stream scan, breaking the one-scan claim above
    per_user = eager_persist(
        events.groupBy(F.col(user_col).alias("u")).agg(
            F.min(F.unix_micros(F.col(ts_col))).alias("entry_us"),
            F.min(
                F.when(F.col(state_col) == convert_type, F.unix_micros(F.col(ts_col)))
            ).alias("conv_us"),
            F.max(F.unix_micros(F.col(ts_col))).alias("umax_us"),
        )
    )
    tmax = per_user.agg(F.max("umax_us").alias("tmax_us"))
    us_day = 86400 * 1000 * 1000
    durs = per_user.crossJoin(F.broadcast(tmax)).select(
        F.when(
            F.col("conv_us").isNotNull(),
            F.floor((F.col("conv_us") - F.col("entry_us")) / F.lit(us_day)),
        )
        .otherwise(F.floor((F.col("tmax_us") - F.col("entry_us")) / F.lit(us_day)))
        .cast("long")
        .alias("dur"),
        F.col("conv_us").isNotNull().cast("long").alias("is_event"),
    )
    day = durs.groupBy(F.col("dur").alias("day")).agg(
        F.sum("is_event").cast("long").alias("n_events"),
        F.sum(F.lit(1) - F.col("is_event")).cast("long").alias("n_censored"),
    )
    # n_total via an unbounded window on the |days| frame (not a second
    # aggregate branch, which would recompute the whole lineage)
    w_after = Window.orderBy(F.asc("day")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(F.asc("day")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    at_risk = day.withColumn(
        "n_risk",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_all)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_after),
                F.lit(0),
            )
        ).cast("long"),
    )
    w_cum = Window.orderBy(F.asc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # factor (n_risk − n_events)/n_risk via integer subtraction; a day
    # where EVERYONE at risk converts makes the factor 0 — ln would be
    # −inf (NULL in Spark, −inf in DuckDB), so guard it explicitly and
    # pin survival to 0.0 from that day on
    curve = at_risk.withColumn(
        "log_s",
        F.sum(
            F.when(
                F.col("n_events") < F.col("n_risk"),
                F.log(
                    (F.col("n_risk") - F.col("n_events")).cast("double")
                    / F.col("n_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0))
        ).over(w_cum),
    ).withColumn(
        "hit_zero",
        F.max((F.col("n_events") == F.col("n_risk")).cast("int")).over(w_cum),
    )
    return (
        curve.filter(F.col("n_events") > 0)
        .select(
            "day",
            "n_risk",
            "n_events",
            "n_censored",
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("log_s")), 6) + F.lit(0.0))
            .alias("survival"),
        )
    )


def rapid_repeat_orders(
    orders: DataFrame,
    max_gap_days: int = 7,
) -> DataFrame:
    """Rapid repeat-order screen — the billing-integrity audit feed:
    every pair of DISTINCT orders by the same customer placed within
    ``max_gap_days``, with amount-similarity flags. Exact-amount repeats
    in a short window are retry/double-charge suspects; near-amount
    repeats (within 1%) catch re-submissions with adjusted tax/shipping.
    (A pure exact-amount join returns zero rows on near-continuous
    totals — the flags keep the screen informative while the exact
    subset stays one filter away.)

        same_amount = price_a == price_b          (bit-equality of the
                                                   stored doubles)
        near_amount = |Δprice| ≤ 0.01·max(price)  (same expression both
                                                   engines)

    Output: one row per pair, (o_custkey, orderkey_a < orderkey_b,
    day_a, day_b, gap_days, price_a, price_b, same_amount, near_amount),
    integer/date ordering throughout.

    Scale shape: an equi-join on custkey with the date-window residual —
    the batch interval-join shape (pay_receipt J1): fan-out per customer
    is bounded by order cadence within the window, never corpus-
    quadratic; hash-partitioning on custkey spreads customers evenly.
    """
    a = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("price_a"),
        F.col("o_orderkey").alias("orderkey_a"),
        F.to_date("o_orderdate").alias("day_a"),
    )
    b = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("price_b"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.to_date("o_orderdate").alias("day_b"),
    )
    pairs = a.join(b, "cust").filter(
        (F.col("orderkey_a") < F.col("orderkey_b"))
        & (F.abs(F.datediff(F.col("day_b"), F.col("day_a"))) <= max_gap_days)
    )
    near = F.abs(F.col("price_a") - F.col("price_b")) <= F.lit(0.01) * F.greatest(
        "price_a", "price_b"
    )
    return pairs.select(
        F.col("cust").alias("o_custkey"),
        "orderkey_a",
        "orderkey_b",
        F.date_format("day_a", "yyyy-MM-dd").alias("day_a"),
        F.date_format("day_b", "yyyy-MM-dd").alias("day_b"),
        F.abs(F.datediff(F.col("day_b"), F.col("day_a"))).cast("long").alias("gap_days"),
        "price_a",
        "price_b",
        (F.col("price_a") == F.col("price_b")).cast("long").alias("same_amount"),
        near.cast("long").alias("near_amount"),
    )


def multitouch_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_s: int = 86400,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the
    whole-journey complement to ``asof_join``'s last-touch: every touch
    in the lookback window before a conversion gets credit, weighted

        n = 1 → 1.0          n = 2 → 0.5 / 0.5
        n ≥ 3 → first 0.4, last 0.4, each middle 0.2/(n−2)

    (the standard 40/20/40 scheme). Touch order and the before-the-
    conversion test both use the (epoch-µs, event_id) total order —
    engine-independent on sub-µs timestamps, the transition_matrix
    convention. Weights are fixed rationals; the per-channel credit sum
    is rounded 6 after aggregation.

    Output per touch channel: (touch_type, n_touches, n_conversions
    reached, credit).

    Scale shape: conversions ⋈ touches is a user-keyed equi-join with
    the lookback residual — the batch interval-join shape (J1), fan-out
    bounded by per-user activity inside the window, never corpus-
    quadratic; position/count come from ONE window per (user,
    conversion); the final aggregate collapses to |channels| rows.
    """
    lookback_us = int(lookback_s) * 1_000_000
    conv = events.filter(F.col(state_col) == convert_type).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("conv_us"),
        F.col(id_col).alias("conv_id"),
    )
    touch = events.filter(F.col(state_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        F.col(id_col).alias("t_id"),
        F.col(state_col).alias("touch_type"),
    )
    j = conv.join(touch, "u").filter(
        (F.col("t_us") > F.col("conv_us") - F.lit(lookback_us))
        & (
            (F.col("t_us") < F.col("conv_us"))
            | ((F.col("t_us") == F.col("conv_us")) & (F.col("t_id") < F.col("conv_id")))
        )
    )
    w = Window.partitionBy("u", "conv_id").orderBy(F.asc("t_us"), F.asc("t_id"))
    wn = Window.partitionBy("u", "conv_id")
    pos = j.withColumn("pos", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("pos") == 1, F.lit(0.4))
        .when(F.col("pos") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2).cast("double"))
    )
    return (
        pos.withColumn("wgt", weight)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.count_distinct(F.col("u"), F.col("conv_id"))
            .cast("long")
            .alias("n_conversions"),
            (F.round(F.sum("wgt"), 6) + F.lit(0.0)).alias("credit"),
        )
    )


def markov_stationary(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    iters: int = 60,
) -> DataFrame:
    """Stationary distribution of the first-order Markov chain over
    per-key event sequences — the long-run state mix the transition
    matrix converges to, i.e. "where does user behavior spend its time
    asymptotically" (the chain-level complement to transition_matrix's
    one-step view and pagerank's graph view).

    Method: power iteration on the LAZY chain M = ½I + ½P from the
    uniform start, a fixed ``iters`` steps. The lazy step preserves the
    stationary distribution while guaranteeing aperiodicity, so the
    iteration converges even for periodic chains (e.g. two states
    flipping deterministically) where plain power iteration oscillates
    forever. States are restricted to those with at least one OUTGOING
    transition (rows renormalized over that set), which keeps P
    row-stochastic without dangling-mass bookkeeping; a state whose
    every target fell outside the kept set becomes absorbing (full
    self-loop). Both rules are part of the contract and tested.

    Scale shape: the distributed work is exactly transition_matrix's —
    one lead() window per key partition, then a collapse to |states|²
    pair counts. The iteration itself runs driver-side on that KB-scale
    matrix (the standard MLlib small-artifact pattern: |states| is the
    event vocabulary, bounded by schema not by data). Emits per state
    the exact outgoing-transition count and the stationary probability
    (rounded to 6 — both engines' fixed-``iters`` values agree to
    ~1e-14, far inside the rounding).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)), F.col(tiebreak_col)
    )
    pairs = (
        events.select(
            F.col(key_col),
            F.col(state_col).alias("from_state"),
            F.col(ts_col),
            F.col(tiebreak_col),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = pairs.collect()  # |states|² KB-scale artifact
    spark = events.sparkSession
    if not rows:
        return spark.createDataFrame(
            [], "state string, n_out long, stationary_prob double"
        )
    states = sorted({r.from_state for r in rows})
    sset = set(states)
    # row-renormalized P over the outgoing-state set
    cnt: dict[tuple[str, str], int] = {}
    n_out: dict[str, int] = {s: 0 for s in states}
    for r in rows:
        if r.to_state in sset:
            cnt[(r.from_state, r.to_state)] = cnt.get((r.from_state, r.to_state), 0) + r.cnt
            n_out[r.from_state] += r.cnt
    # lazy-chain weights, only the nonzero entries (mirrors the oracle's
    # m rows so both engines sum the same terms)
    m: dict[tuple[str, str], float] = {}
    for (i, j), c in cnt.items():
        if i != j:
            m[(i, j)] = 0.5 * (float(c) / float(n_out[i]))
    for s in states:
        c = cnt.get((s, s), 0)
        # a state whose every raw target fell outside the kept set keeps
        # no outgoing rows: treat it as absorbing (full self-loop) so the
        # row stays stochastic and no mass leaks
        frac = (float(c) / float(n_out[s])) if n_out[s] else 1.0
        m[(s, s)] = 0.5 + 0.5 * frac
    p = {s: 1.0 / float(len(states)) for s in states}
    for _ in range(iters):
        nxt = {s: 0.0 for s in states}
        for i in states:
            pi = p[i]
            for j in states:
                wij = m.get((i, j))
                if wij is not None:
                    nxt[j] += pi * wij
        p = nxt
    return spark.createDataFrame(
        [(s, int(n_out[s]), round(p[s], 6) + 0.0) for s in states],
        "state string, n_out long, stationary_prob double",
    )


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    nbuckets: int = 32,
) -> DataFrame:
    """2-D dominance skyline (Pareto frontier, both dimensions
    minimized): the distinct (x, y) points no other point beats on both
    axes — the classic "cheapest AND smallest" frontier query. Emits
    per skyline point the member count and the minimum id.

    Dominance is decided with NO pairwise self-join: after collapsing
    to distinct (x, y) points, sort by (x asc, y asc) — a point is
    dominated iff the running minimum of y over strictly-earlier points
    is ≤ its own y (an earlier point has x ≤ mine; equal-(x, y) pairs
    cannot recur post-collapse, so some coordinate is strictly better).

    The "sort" is two-phase like range_partitioned_rank (the global-
    order scale fix, VERDICT r4 item 2): approx-percentile cutoffs on x
    bucket the points row-locally; each bucket computes its local
    running prefix-min with a PARTITIONED window; the cross-bucket
    prefix-mins travel as a broadcast ≤ nbuckets-row frame. An
    earlier-BUCKET point has x strictly below every point of later
    buckets (buckets split on x), so its min-y ≤ my y is exactly
    dominance. No task ever sorts more than one bucket.
    """
    from ._cache import eager_persist

    # the collapsed point frame feeds the cutoff sketch, the bucketed
    # window, AND the bucket-min pass — persist it so the source is
    # scanned once (distinct (x, y) is bounded by the value domain, far
    # below the row count)
    pts = eager_persist(
        df.groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y")).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(id_col).alias("min_id"),
        )
    )
    probs = [i / nbuckets for i in range(1, nbuckets)]
    cuts = pts.agg(F.percentile_approx("x", probs, 10000).alias("_cuts"))
    b = (
        pts.crossJoin(F.broadcast(cuts))
        .withColumn(
            "_bucket",
            F.size(F.filter("_cuts", lambda c: F.col("x") > c)).cast("long"),
        )
        .drop("_cuts")
    )
    w_loc = Window.partitionBy("_bucket").orderBy("x", "y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    loc = b.withColumn("_mloc", F.min("y").over(w_loc))
    bmin = b.groupBy("_bucket").agg(F.min("y").alias("_bmin"))
    w_pre = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    pre = bmin.select(
        "_bucket", F.min("_bmin").over(w_pre).alias("_mpre")
    )
    dominated = (
        F.col("_mloc").isNotNull() & (F.col("_mloc") <= F.col("y"))
    ) | (F.col("_mpre").isNotNull() & (F.col("_mpre") <= F.col("y")))
    return (
        loc.join(F.broadcast(pre), "_bucket")
        .filter(~dominated)
        .select("x", "y", "n_rows", "min_id")
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream: per
    key, the validity intervals of its state — consecutive same-state
    events COLLAPSE into one interval (the gaps-and-islands pattern),
    each interval closed by the next state change and the last one left
    open (is_current). The warehouse-side complement to latest_state:
    that one keeps the end of history, this one keeps all of it,
    queryable AS OF any time.

    Islands via the standard two-window form over ONE key partition:
    a change flag from lag(state), its running sum as the island id,
    then the interval collapse and a lead() to close each interval.
    Timestamps are emitted as epoch-µs longs ordered with the explicit
    (unix_micros, tiebreak) contract shared with transition_matrix.

    Scale shape: both windows and the aggregate share the same key
    partitioning — a single exchange end to end; output is bounded by
    the number of state CHANGES, not events.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy("_us", "_tb")
    flagged = events.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        us.alias("_us"),
        F.col(tiebreak_col).alias("_tb"),
    ).withColumn(
        "_chg",
        F.when(
            F.lag("state").over(w).isNull()
            | (F.lag("state").over(w) != F.col("state")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = Window.partitionBy(key_col).orderBy("_us", "_tb").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.withColumn("_island", F.sum("_chg").over(w_run))
    iv = islands.groupBy(key_col, "_island", "state").agg(
        F.min("_us").alias("valid_from_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    # _island tiebreak: islands are numbered in (ts, tiebreak) event
    # order, so two islands sharing a valid_from (same-µs state churn)
    # close deterministically — the earlier-numbered one becomes the
    # zero-width interval no fact can match, and the later one is the
    # version ts-only containment picks (the streaming twin's rule;
    # see tests/test_temporal_join_tiebreak.py). Tie-free data is
    # unaffected.
    w_next = Window.partitionBy(key_col).orderBy("valid_from_us", "_island")
    return iv.select(
        F.col(key_col),
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w_next).alias("valid_to_us"),
        "n_events",
    ).withColumn("is_current", F.col("valid_to_us").isNull())


def dwell_time(
    events: DataFrame,
    cap_s: int = 1800,
    type_col: str = "event_type",
    user_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-on-event profile: each event's dwell is the gap to the SAME
    user's next event of ANY type (total (ts, event_id) order), capped
    at ``cap_s`` — the standard web-analytics page-dwell estimator
    (the cap stands in for "walked away"; a user's last event has no
    successor and is excluded rather than guessed). The cross-type
    complement to inter_event_gaps, which measures same-type cadence.

    Per event type: dwell count, how many hit the cap, exact total
    dwell in microseconds (BIGINT — no float accumulation), and mean
    seconds (one double division, rounded 6).

    Plan shape: ONE exchange on user for the lead window (the
    attributing event's type rides along — no second join), then a
    map-side-combined per-type aggregate. At 100 TB the user partition
    is the natural key — bounded per-user history, no skew beyond what
    bot screening already flags.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    us = F.unix_micros(F.col(time_col))
    cap_us = int(cap_s) * 1_000_000
    d = (
        events.select(type_col, user_col, time_col, id_col)
        .withColumn("_next_us", F.lead(us).over(w))
        .filter(F.col("_next_us").isNotNull())
        .select(
            F.col(type_col),
            F.least(F.col("_next_us") - us, F.lit(cap_us)).alias("_dwell_us"),
        )
    )
    return d.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_dwells"),
        F.sum((F.col("_dwell_us") == cap_us).cast("long"))
        .cast("long")
        .alias("n_capped"),
        F.sum("_dwell_us").cast("long").alias("total_dwell_us"),
        (
            F.round(
                F.sum("_dwell_us").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e6),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_dwell_s"),
    )


def cart_abandonment(
    events: DataFrame,
    horizon_s: int = 1800,
    item_expr: str = "get_json_object(props, '$.k')",
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Cart-abandonment screen: clicks on an item with NO purchase of
    the SAME item by the SAME user within ``horizon_s`` seconds after
    the click — the e-commerce funnel leak the reference's order-timeout
    CEP watches from the payment side, measured here from the browse
    side. Per item: click count, abandoned count, abandonment rate.

    Plan shape: equi-join on (user, item) with the time residual as a
    join condition — the J1 interval-join skeleton in its ANTI variant,
    so Spark hash-joins on the composite key and applies the range
    filter inside the join, never materializing matched pairs. At
    scale the horizon bounds state exactly like the streaming interval
    join's watermark does.
    """
    from ._cache import eager_persist

    item = F.expr(item_expr).cast("long")
    us = F.unix_micros(F.col(time_col))
    # clicks feed BOTH the (u, item)-keyed anti-join and the item-keyed
    # n_clicks aggregate — different exchanges, no ReusedExchange, so an
    # unpersisted frame scans the events source twice (the _cache.py
    # multi-consumer discipline)
    clicks = eager_persist(
        events.filter(F.col("event_type") == "click").select(
            F.col(user_col).alias("u"), item.alias("item_id"), us.alias("c_us")
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col(user_col).alias("u"), item.alias("item_id"), us.alias("p_us")
    )
    horizon_us = int(horizon_s) * 1_000_000
    abandoned = clicks.join(
        purchases,
        [
            clicks["u"] == purchases["u"],
            clicks["item_id"] == purchases["item_id"],
            purchases["p_us"] > clicks["c_us"],
            purchases["p_us"] <= clicks["c_us"] + F.lit(horizon_us),
        ],
        "left_anti",
    )
    n_clicks = clicks.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks")
    )
    n_aband = abandoned.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_abandoned")
    )
    return (
        n_clicks.join(n_aband, "item_id", "left")
        .select(
            "item_id",
            "n_clicks",
            F.coalesce(F.col("n_abandoned"), F.lit(0)).cast("long").alias(
                "n_abandoned"
            ),
        )
        .withColumn(
            "abandon_rate",
            F.round(
                F.col("n_abandoned").cast("double")
                / F.col("n_clicks").cast("double"),
                6,
            )
            + F.lit(0.0),
        )
    )


def stickiness(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """DAU / WAU stickiness per day: distinct daily actives over
    distinct trailing-``window_days`` actives — the canonical "do users
    come back" ratio. Output: one row per calendar day with events —
    (day, dau, wau, stickiness).

    Plan shape: the event stream collapses ONCE to distinct (user, day)
    pairs (map-side combined); each pair then fans out to the
    ``window_days`` target days it supports via an exploded literal
    sequence — a bounded 7× row blowup on the ALREADY-collapsed pair
    frame, not the stream — and one count_distinct per target day.
    This is the scale-safe alternative to the oracle's range join
    (days × user-days), which is quadratic-ish in calendar span; the
    explode keys the shuffle by target day with constant fan-out.
    Trailing days beyond the data's end are clipped by the inner join
    with the DAU frame (a WAU with no same-day actives is not a day).
    """
    day = F.to_date(F.col(time_col))
    ud = (
        events.select(F.col(user_col).alias("u"), day.alias("d"))
        .distinct()
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    fan = ud.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), int(window_days) - 1))
        ).alias("td"),
    )
    wau = fan.groupBy("td").agg(F.count_distinct("u").cast("long").alias("wau"))
    return (
        dau.join(wau, dau["d"] == wau["td"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (
                F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6)
                + F.lit(0.0)
            ).alias("stickiness"),
        )
    )


def temporal_join(
    facts: DataFrame,
    dim_intervals: DataFrame,
    key: str,
    fact_us_col: str,
    carry: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """Event-time temporal table join — Flink's versioned-dim enrichment
    (the reference's dim-join pattern in BaseDbApp/OrderWide, done
    event-time-correct instead of processing-time lookup): each fact
    row joins the dim VERSION valid at its event time, i.e. the
    interval row with ``valid_from_us <= t < valid_to_us`` (open
    current version = NULL valid_to). ``dim_intervals`` is an SCD2
    frame (scd2_intervals output or any (key, valid_from_us,
    valid_to_us, ...) history); ``carry`` maps dim column → output
    alias.

    Plan shape: hash equi-join on ``key`` with the containment
    predicate as a join residual — Spark keeps it a HashJoin (never a
    cartesian) because the equi key is extractable; per-key fan-out is
    bounded by that key's VERSION count (state changes, not events).
    The intervals partition by the same key the facts shuffle on, so
    at scale this is one co-partitioned exchange each side — the
    sort-merge-free alternative to asof_join when validity is already
    materialized as intervals.
    """
    d = dim_intervals.select(
        F.col(key).alias("_k"),
        F.col("valid_from_us").alias("_from"),
        F.col("valid_to_us").alias("_to"),
        *[F.col(src).alias(dst) for src, dst in carry.items()],
    )
    cond = (
        (facts[key] == d["_k"])
        & (d["_from"] <= facts[fact_us_col])
        & (d["_to"].isNull() | (facts[fact_us_col] < d["_to"]))
    )
    return facts.join(d, cond, how).drop("_k", "_from", "_to")


def incremental_agg_refresh(
    events: DataFrame,
    num_shards: int = 10,
    delta_shard: int = 0,
    type_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Incremental view maintenance (IVM) for an additive aggregate: the
    stored view is the (event_type, day) count/revenue roll-up over the
    BASE corpus; a DELTA batch (a deterministic salted-hash shard of the
    ids, standing in for "today's CDC batch") refreshes it by MERGING
    partial aggregates — the view is never recomputed from the base.

    merged(g) = base_view(g) ⊎ delta_view(g), where ⊎ sums the additive
    measures per group (count and cents are both associative-commutative
    monoids, so merge-of-partials ≡ recompute-from-scratch — which is
    exactly what the DuckDB oracle does from the full table, making the
    driver's hash gate a PROOF of the merge law on real data).

    Scale shape: the refresh only scans the delta; the base side enters
    as its aggregate (group-cardinality-sized — in production the stored
    view itself). The merge is a union of two pre-aggregated frames and
    one re-aggregation on the group key: no join, no base rescan.
    """
    from .sampling import sample_hash

    shard = F.pmod(sample_hash(id_col, "ivm"), F.lit(num_shards))
    day = F.date_format(F.to_date(F.col(time_col)), "yyyy-MM-dd")
    cents = F.round(F.col(value_col) * 100, 0).cast("long")

    def view(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(type_col), day.alias("day"), cents.alias("_c"))
            .groupBy(type_col, "day")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("_c").cast("long").alias("total_cents"),
            )
        )

    base_view = view(events.filter(shard != delta_shard))
    delta_view = view(events.filter(shard == delta_shard))
    return (
        base_view.unionByName(delta_view)
        .groupBy(type_col, "day")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_cents").cast("long").alias("total_cents"),
        )
    )
