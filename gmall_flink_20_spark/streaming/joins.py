"""Watermarked stream-stream joins (SURVEY §2.7 J1/J2, streaming forms).

Reference parity:
- J1 ``intervalJoin.between(-3s, +5s)`` on txId
  (PayReceiptWithJoinApp.java:50-70) → Spark stream-stream INNER join
  with watermarks on both sides and a time-range condition. Spark evicts
  join state once the watermark passes the range bound — the same state
  cleanup Flink's interval join does internally.
- J2 connect + KeyedCoProcessFunction full-outer reconciliation
  (PayReceiptWithConnectApp.java:62-157) → stream-stream FULL OUTER join:
  Spark emits the unmatched (null-padded) rows once the watermark passes,
  which is exactly the reference's timer-fired "Payed No Receipt" /
  "No Payed But Receipt" side outputs; the discriminating CASE column
  reproduces the three-way output split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join", "stream_reconcile_full_outer"]


def _range_cond(key: str, left_ts: str, right_ts: str, lower_s: int, upper_s: int):
    return F.expr(
        f"l.{key} = r.{key} AND "
        f"r.{right_ts} >= l.{left_ts} + INTERVAL {lower_s} SECONDS AND "
        f"r.{right_ts} <= l.{left_ts} + INTERVAL {upper_s} SECONDS"
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    delay: str = "2 seconds",
) -> DataFrame:
    """Streaming inner interval join; both sides watermarked so per-key
    join state is bounded by the interval width + delay."""
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withWatermark(right_ts, delay).alias("r")
    return l.join(r, _range_cond(key, left_ts, right_ts, lower_s, upper_s), "inner")


def stream_reconcile_full_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    delay: str = "2 seconds",
    matched: str = "matched",
    left_only: str = "left_only",
    right_only: str = "right_only",
) -> DataFrame:
    """Streaming full-outer reconciliation: matched pairs emit promptly;
    orphans emit with nulls once the watermark passes their join window
    (the reference's timeout alerts)."""
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withWatermark(right_ts, delay).alias("r")
    joined = l.join(r, _range_cond(key, left_ts, right_ts, lower_s, upper_s), "full_outer")
    category = (
        F.when(F.col(f"l.{left_ts}").isNotNull() & F.col(f"r.{right_ts}").isNotNull(), F.lit(matched))
        .when(F.col(f"l.{left_ts}").isNotNull(), F.lit(left_only))
        .otherwise(F.lit(right_only))
    )
    return joined.withColumn("category", category)
