"""Streaming Top-N per window (SURVEY §2.6 T1-T3, streaming form).

The reference buffers windowed aggregates in keyed state and fires a
timer at windowEnd+1 to sort and emit (HotItemApp.java:116-190); the
MapState variant upserts so late re-fires correct earlier output
(HotUrlApp_MapState.java:116-186).

Spark-first shape: the windowed count runs in UPDATE output mode (each
micro-batch emits the windows whose counts changed); ``foreachBatch``
upserts those rows into a result store keyed by (window, item) — the
MapState-upsert semantics for free — and the Top-N is ranked from the
store's current snapshot. The store is pluggable:

- ``ParquetUpsertStore`` (the default shape for production): each
  micro-batch appends its updated rows — executor-side, fully
  distributed, never through the driver — stamped with the epoch id;
  the snapshot is a last-write-wins read (``row_number`` over epoch
  desc), i.e. an append-log + merge-on-read upsert. On a real cluster
  the same ``upsert`` callback body is a Delta/Iceberg MERGE or a KV
  bulk write; the log+snapshot form here needs only vanilla parquet.
- ``DriverDictStore``: collects every batch into a driver dict. Test
  convenience ONLY — it is driver-local and unbounded, do not use it
  as a production sink.
"""

from __future__ import annotations

from collections.abc import MutableMapping
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

__all__ = [
    "TopNStore",
    "ParquetUpsertStore",
    "DriverDictStore",
    "topn_upsert_sink",
    "topn_from_store",
]


class TopNStore(Protocol):
    """Upsert target for update-mode windowed aggregates."""

    def upsert(self, batch: DataFrame, epoch_id: int) -> None: ...


class ParquetUpsertStore:
    """Append-log upsert store: each micro-batch's updated (window, key)
    rows append as parquet stamped with the epoch; ``snapshot`` merges on
    read with last-write-wins per (window, key). All writes happen on
    executors (``batch.write``), so the sink scales with the cluster —
    nothing round-trips the driver.

    ``key_col=None`` keys the store on ``window_col`` ALONE (ADVICE r9:
    a decision stream keyed (doc_id, kept) would keep BOTH rows if a
    retry ever recomputed a different decision; keying on doc_id alone
    makes the latest write win unconditionally)."""

    def __init__(
        self, path: str, window_col: str, key_col: str | None = None
    ) -> None:
        self.path = path
        self.window_col = window_col
        self.key_col = key_col
        self._any = False

    def upsert(self, batch: DataFrame, epoch_id: int) -> None:
        (
            batch.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(self.path)
        )
        self._any = True

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Current value per (window, key): the row from the latest epoch
        that touched it."""
        log = spark.read.parquet(self.path)
        keys = [self.window_col] + ([self.key_col] if self.key_col else [])
        w = Window.partitionBy(*keys).orderBy(F.desc("_epoch"))
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_epoch")
        )


class DriverDictStore:
    """Driver-local dict store — TEST HARNESS ONLY (unbounded driver
    memory, every batch collect()s). Production sinks must write
    executor-side: use ParquetUpsertStore or a MERGE/KV writer."""

    def __init__(
        self, window_col: str, key_col: str, count_col: str,
        store: MutableMapping[tuple[Any, Any], Any] | None = None,
    ) -> None:
        self.window_col = window_col
        self.key_col = key_col
        self.count_col = count_col
        self.store: MutableMapping[tuple[Any, Any], Any] = (
            store if store is not None else {}
        )

    def upsert(self, batch: DataFrame, epoch_id: int) -> None:
        cols = [self.window_col, self.key_col, self.count_col]
        for row in batch.select(*cols).collect():
            self.store[(row[self.window_col], row[self.key_col])] = row[self.count_col]


def topn_upsert_sink(counts_stream: DataFrame, store: TopNStore) -> DataStreamWriter:
    """foreachBatch writer: upsert each updated (window, key) count into
    ``store``. Run the aggregation in update output mode."""

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        store.upsert(batch, epoch_id)

    return counts_stream.writeStream.foreachBatch(upsert).outputMode("update")


def topn_from_store(
    store: MutableMapping[tuple[Any, Any], Any] | DriverDictStore, n: int
) -> dict[Any, list[tuple[Any, Any]]]:
    """Current Top-N snapshot per window from a dict upsert store: sort by
    count desc then key asc (the deterministic tiebreak the batch rank
    uses)."""
    mapping = store.store if isinstance(store, DriverDictStore) else store
    by_window: dict[Any, list[tuple[Any, Any]]] = {}
    for (window, key), cnt in mapping.items():
        by_window.setdefault(window, []).append((key, cnt))
    return {
        w: sorted(items, key=lambda kv: (-kv[1], kv[0]))[:n]
        for w, items in by_window.items()
    }
