"""Windowed aggregation operators (SURVEY.md §2.5, WA1–WA8).

Reference parity:
- WA1 sliding 1h/5m incremental count   — HotItemApp.java:60-110
- WA2 sliding 10m/5s count + lateness   — HotUrlApp.java:68-112
- WA3 tumbling 1h sum (PV)              — PageViewApp.java:57-60
- WA4 salted two-phase windowed count   — PageViewApp_2.java:63-157
- WA7 sliding count by (channel,behav.) — channelApp.java:52-72 (test-tree
  ChannelApp.java fixes the main-tree counting bug; we implement the intent)
- WA8 sliding count by province         — AdClickApp.java:63-109

Spark-first design: ``F.window(ts, size, slide)`` declares the window;
Catalyst plans a partial (map-side) + final hash aggregate, so the
reference's hand-written incremental ``AggregateFunction`` (WA1) and its
salted two-phase rewrite for the single-hot-key PV count (WA4) are both
subsumed by the default plan — at 1000 executors the partial aggregate
already collapses each window's per-partition counts before the shuffle.

All operators emit ``window_end_s`` as epoch seconds (BIGINT) rather than a
timestamp so results hash identically across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "windowed_count",
    "windowed_count_rollup",
    "tumbling_count",
    "session_count",
    "window_end_s",
    "running_counts",
    "cube_count",
]


def window_end_s(ts_col: str, size: str, slide: str | None = None) -> Column:
    """Epoch-second end of the (sliding) window containing ``ts_col``."""
    w = F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
    return w.end.cast("long")


def windowed_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str | None,
    *keys: Column | str,
    count_alias: str = "cnt",
) -> DataFrame:
    """Count rows per (window, *keys) over tumbling or sliding windows.

    Emits ``window_end_s`` + keys + count. One shuffle (the groupBy); the
    window expansion for sliding windows happens map-side before the
    partial aggregate, so shuffled volume is already (window, key) partials.
    """
    w = F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return (
        df.groupBy(w.alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .withColumn("window_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )


def windowed_count_rollup(
    df: DataFrame,
    ts_col: str,
    size_s: int,
    slide_s: int,
    *keys: str,
    count_alias: str = "cnt",
) -> DataFrame:
    """Sliding-window count via tumbling-bucket pre-aggregation + rollup.

    ``windowed_count`` expands every EVENT into size/slide window copies
    before aggregating; at high event rates that multiplies the shuffle
    by size/slide. This variant first counts per (slide-sized tumbling
    bucket, keys) — shuffle volume = distinct buckets×keys, independent
    of event rate — then explodes the AGGREGATED bucket rows into their
    containing windows and sums partials. Identical results; choose by
    events-per-bucket (≫1 → rollup wins; ≈1 → direct is one less
    shuffle). This is the principled form of the reference's hand-rolled
    two-phase salted count (PageViewApp_2.java:63-157).

    Keys must be column NAMES (strings): the rollup re-groups the
    expanded buckets by name, and deriving a stable name from an
    arbitrary Column expression would need private APIs. Alias the
    expression on the input frame first.
    """
    if size_s % slide_s != 0:
        raise ValueError(
            f"windowed_count_rollup requires size_s % slide_s == 0 "
            f"(got size_s={size_s}, slide_s={slide_s}): the tumbling-bucket "
            f"expansion only matches Spark's window() for divisible configs"
        )
    if not all(isinstance(k, str) for k in keys):
        raise TypeError(
            "windowed_count_rollup keys must be strings; alias Column "
            "expressions on the input frame before calling"
        )
    n = size_s // slide_s
    key_cols = [F.col(k) for k in keys]
    buckets = (
        df.groupBy(
            F.window(ts_col, f"{slide_s} seconds").alias("b"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias("_partial"))
        .withColumn("bucket_end_s", F.col("b.end").cast("long"))
        .drop("b")
    )
    expanded = buckets.withColumn(
        "window_end_s",
        F.explode(
            F.sequence(
                F.col("bucket_end_s") - slide_s + size_s - (n - 1) * slide_s,
                F.col("bucket_end_s") - slide_s + size_s,
                F.lit(slide_s),
            )
        ),
    )
    return (
        expanded.groupBy("window_end_s", *[F.col(k) for k in keys])
        .agg(F.sum("_partial").alias(count_alias))
    )


def session_count(
    df: DataFrame,
    ts_col: str,
    gap_s: int,
    *keys: Column | str,
    count_alias: str = "n_events",
) -> DataFrame:
    """Per-key session windows (gap-based), ``session_window`` built-in.

    Beyond-reference (the reference has no session windows, SURVEY §2.12)
    but native to Spark and oracle-checkable via gaps-and-islands SQL.
    Event times are floored to whole seconds BEFORE sessionization so the
    merge decision (gap boundary) is integral and engine-independent.
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    floored = F.timestamp_seconds(F.col(ts_col).cast("long"))
    return (
        df.groupBy(
            F.session_window(floored, f"{gap_s} seconds").alias("w"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias(count_alias))
        .withColumn("session_start_s", F.col("w.start").cast("long"))
        .withColumn("session_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )


def running_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    flag_col: str,
    flag_value: str,
) -> DataFrame:
    """Per-key running totals (analytic window, not a time window): for
    every event, the cumulative event count and cumulative count of
    ``flag_col == flag_value`` up to and including it.

    Order is made total with the id tiebreak so both engines agree row
    for row. One shuffle (partition by key); within a partition the
    running frame is a single sort + linear scan — the same plan shape a
    1000-executor cluster runs, with each user's history local to one
    task.
    """
    from pyspark.sql import Window as W

    ts_s = F.col(ts_col).cast("long")
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_s.asc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.select(
        F.col(id_col),
        F.col(key_col),
        ts_s.alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("running_events"),
        F.sum(F.when(F.col(flag_col) == flag_value, 1).otherwise(0)).over(w).alias("running_flagged"),
    )


def tumbling_count(
    df: DataFrame, ts_col: str, size: str, *keys: Column | str, count_alias: str = "cnt"
) -> DataFrame:
    return windowed_count(df, ts_col, size, None, *keys, count_alias=count_alias)


def cube_count(df, *dims: str, total_label: str = "ALL", count_alias: str = "cnt"):
    """Multi-dimensional aggregate: counts for every subset of ``dims``
    (grand total, each margin, the full cross) in ONE pass — Spark's
    ``cube`` expands grouping sets map-side (Expand), so the plan is one
    scan + one shuffle no matter how many dimensions. NULL grouping slots
    are labeled ``total_label`` (the inputs here are non-null), keeping
    the output engine-comparable.

    Beyond-reference (SURVEY §2.12 notes the reference has no grouping
    sets); standard fare for an analytics engine, so offered first-class.
    """
    from pyspark.sql import functions as F

    agg = df.cube(*dims).count().withColumnRenamed("count", count_alias)
    out = agg.select(
        *[F.coalesce(F.col(d), F.lit(total_label)).alias(d) for d in dims],
        F.col(count_alias),
    )
    return out
