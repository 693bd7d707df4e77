"""Multi-stream joins (SURVEY.md §2.7, J1/J2).

Reference parity:
- J1 interval join: ``orders.intervalJoin(receipts).between(-3s, +5s)`` on
  txId (PayReceiptWithJoinApp.java:50-70) — emit pairs whose event times
  fall within a bounded interval of each other.
- J2 connect + KeyedCoProcessFunction full-outer reconciliation with
  timeout alerts (PayReceiptWithConnectApp.java:62-157; the test-tree copy
  fixes the main-tree's null-deref in onTimer, which we don't replicate).

Spark-first design: both are joins with a time-range predicate. Batch: an
equi-join on the key plus an interval residual — Catalyst plans a hash
join on the equi key with the range as a post-join filter, so there is
exactly one shuffle per side (or zero for a broadcast side) and AQE splits
skewed keys. J2 is the same join made ``full_outer``; the reference's
three outputs (matched / payed-no-receipt / no-payed-but-receipt) become a
CASE over the null sides — side outputs as discriminated columns
(SURVEY §2.9).

Time columns are epoch-second longs (callers cast) so the comparison
semantics are integral and engine-independent. Streaming variants live in
``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "reconcile_full_outer"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts_s: str,
    right_ts_s: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner join where ``right_ts_s - left_ts_s ∈ [lower_s, upper_s]``."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts_s}") >= F.col(f"l.{left_ts_s}") + lower_s)
        & (F.col(f"r.{right_ts_s}") <= F.col(f"l.{left_ts_s}") + upper_s)
    )
    return l.join(r, cond, "inner")


def reconcile_full_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts_s: str,
    right_ts_s: str,
    lower_s: int,
    upper_s: int,
    matched: str = "matched",
    left_only: str = "left_only",
    right_only: str = "right_only",
    category_alias: str = "category",
) -> DataFrame:
    """Full-outer time-bounded reconciliation → one row per (pair|orphan)
    with a category column (the reference's main + two side outputs)."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts_s}") >= F.col(f"l.{left_ts_s}") + lower_s)
        & (F.col(f"r.{right_ts_s}") <= F.col(f"l.{left_ts_s}") + upper_s)
    )
    joined = l.join(r, cond, "full_outer")
    category = (
        F.when(
            F.col(f"l.{left_ts_s}").isNotNull() & F.col(f"r.{right_ts_s}").isNotNull(),
            F.lit(matched),
        )
        .when(F.col(f"l.{left_ts_s}").isNotNull(), F.lit(left_only))
        .otherwise(F.lit(right_only))
    )
    return joined.withColumn(category_alias, category)
