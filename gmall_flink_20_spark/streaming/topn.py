"""Streaming Top-N per window (SURVEY §2.6 T1-T3, streaming form).

The reference buffers windowed aggregates in keyed state and fires a
timer at windowEnd+1 to sort and emit (HotItemApp.java:116-190); the
MapState variant upserts so late re-fires correct earlier output
(HotUrlApp_MapState.java:116-186).

Spark-first shape: the windowed count runs in UPDATE output mode (each
micro-batch emits the windows whose counts changed); ``foreachBatch``
upserts those rows into a result store keyed by (window, item) — the
MapState-upsert semantics for free — and re-ranks only the touched
windows. In production the store is a KV/Delta MERGE target; here it's a
pluggable dict-like for tests.
"""

from __future__ import annotations

from collections.abc import MutableMapping
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

__all__ = ["topn_upsert_sink", "topn_from_store"]


def topn_upsert_sink(
    counts_stream: DataFrame,
    window_col: str,
    key_col: str,
    count_col: str,
    store: MutableMapping[tuple[Any, Any], Any],
) -> DataStreamWriter:
    """foreachBatch writer: upsert each updated (window, key) count into
    ``store``. Run the aggregation in update output mode."""

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        for row in batch.select(window_col, key_col, count_col).collect():
            store[(row[window_col], row[key_col])] = row[count_col]

    return counts_stream.writeStream.foreachBatch(upsert).outputMode("update")


def topn_from_store(
    store: MutableMapping[tuple[Any, Any], Any], n: int
) -> dict[Any, list[tuple[Any, Any]]]:
    """Current Top-N snapshot per window from the upsert store: sort by
    count desc then key asc (the deterministic tiebreak the batch rank
    uses)."""
    by_window: dict[Any, list[tuple[Any, Any]]] = {}
    for (window, key), cnt in store.items():
        by_window.setdefault(window, []).append((key, cnt))
    return {
        w: sorted(items, key=lambda kv: (-kv[1], kv[0]))[:n]
        for w, items in by_window.items()
    }
