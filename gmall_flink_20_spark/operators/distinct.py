"""Distinct-count operators (SURVEY.md §2.5 WA5/WA6 — UV).

Reference parity:
- WA5 exact UV: full-window HashSet of userIds per tumbling hour
  (UniqueVisitorApp.java:53-79).
- WA6 approximate UV: hand-rolled Bloom filter over a Redis bitmap with a
  per-element FIRE_AND_PURGE trigger (UniqueVisitorApp2.java:71-168).

Spark-first design: WA5 is ``countDistinct`` (expands to a two-phase
distinct aggregate — shuffle on (window, userId) partials, then merge);
WA6's intent (memory-bounded approximate distinct at scale) is exactly
HyperLogLog++, built in as ``approx_count_distinct`` — constant memory per
window regardless of cardinality, mergeable across executors, no external
bitmap service needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unique_count", "approx_unique_count"]


def unique_count(
    df: DataFrame, ts_col: str, size: str, id_col: str, alias: str = "uv"
) -> DataFrame:
    """Exact distinct ``id_col`` per tumbling window."""
    return (
        df.groupBy(F.window(ts_col, size).alias("w"))
        .agg(F.countDistinct(id_col).alias(alias))
        .withColumn("window_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )


def approx_unique_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    id_col: str,
    rsd: float = 0.05,
    alias: str = "uv_approx",
) -> DataFrame:
    """HLL++ distinct per tumbling window (replaces the reference's
    Redis-bitmap Bloom filter, UniqueVisitorApp2.java:93-168)."""
    return (
        df.groupBy(F.window(ts_col, size).alias("w"))
        .agg(F.approx_count_distinct(id_col, rsd).alias(alias))
        .withColumn("window_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )
