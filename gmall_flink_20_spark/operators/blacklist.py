"""Daily-threshold blacklist filter (SURVEY.md §2.10).

Reference parity: ``BlackListProcessFunc`` (AdClickApp.java:112-168) keyed
by (userId, adId) counts clicks in ValueState; clicks past ``maxClick`` are
suppressed from the main output and a one-shot warning goes to a side
output; a timer resets state at midnight (the reference's midnight
arithmetic is buggy in both variants — we implement the evident intent:
a per-calendar-day reset).

Spark-first design (batch): a cumulative ``row_number`` over
(key..., day ORDER BY ts) — one shuffle on the key, no per-row state.
- rows with rn ≤ threshold  → the kept (main-output) stream
- rows with rn == threshold+1 → the one-shot warnings (side output)
The streaming form (applyInPandasWithState keeping a per-key-day count)
lives in ``streaming/stateful.py``; this is its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["daily_threshold_split"]


def daily_threshold_split(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    threshold: int,
    order_tiebreak: str,
) -> tuple[DataFrame, DataFrame]:
    """Return (kept, warnings) under a per-day per-key event budget."""
    day = F.to_date(ts_col).alias("day")
    w = Window.partitionBy(*[F.col(k) for k in keys], F.to_date(ts_col)).orderBy(
        F.col(ts_col), F.col(order_tiebreak)
    )
    ranked = df.withColumn("day", day).withColumn("rn", F.row_number().over(w))
    kept = ranked.filter(F.col("rn") <= threshold).drop("rn")
    warnings = (
        ranked.filter(F.col("rn") == threshold + 1)
        .select(
            *[F.col(k) for k in keys],
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.lit(f"click over {threshold} times today").alias("warning_msg"),
        )
    )
    return kept, warnings
