"""Top-N per window (SURVEY.md §2.6, T1–T4).

Reference parity: the reference re-keys windowed aggregates by windowEnd,
buffers rows in keyed ListState/MapState, fires an event-time timer at
windowEnd+1, sorts descending by count and takes N
(HotItemApp.java:116-190, HotUrlApp.java:115-183,
HotUrlApp_MapState.java:116-186).

Spark-first design: a rank over ``Window.partitionBy(partition_keys)
.orderBy(desc(count), *tiebreak)`` — one shuffle on the window key, no
driver-side state, and the MapState-upsert dedup trick (T3) is unnecessary
because batch/update-mode aggregates are already the latest value per key.

Tie-breaking is explicit (ascending on the item keys) so results are
deterministic and oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_n_per_key"]


def top_n_per_key(
    df: DataFrame,
    partition_keys: list[str],
    order_col: str,
    n: int,
    tiebreak: list[str] | None = None,
    rank_alias: str = "rn",
) -> DataFrame:
    """Keep the top-``n`` rows per partition, ordered by ``order_col`` desc.

    ``row_number`` (not rank) to match the reference's "take first N after
    sort" semantics (HotItemApp.java:169 `Math.min(list.size(), topSize)`);
    ``tiebreak`` columns make the row_number deterministic.
    """
    order = [F.desc(order_col)] + [F.asc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*partition_keys).orderBy(*order)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= n
    )
