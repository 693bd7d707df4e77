"""Sinks (SURVEY §2.12 noted the reference has none beyond print/Redis;
these are the production-shaped equivalents).

- batch: partitioned/bucketed parquet writers (the physical layout knobs
  that make 100 TB re-reads cheap: partition pruning + co-located joins)
- streaming: console/memory/parquet sinks and a foreachBatch fan-out that
  routes a discriminated union (side-output column, SURVEY §2.9) to
  multiple destinations in one pass
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

__all__ = [
    "write_partitioned",
    "write_bucketed",
    "console_sink",
    "parquet_sink",
    "side_output_fanout",
]


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet: downstream filters on ``partition_by`` become
    directory pruning instead of data scans."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table: joins/aggregations on the bucket key skip their
    shuffle entirely when both sides share the bucketing."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def console_sink(stream: DataFrame, mode: str = "append") -> DataStreamWriter:
    """The reference's ``print()`` (HotItemApp.java:68)."""
    return stream.writeStream.format("console").outputMode(mode)


def parquet_sink(
    stream: DataFrame, path: str, checkpoint: str, partition_by: list[str] | None = None
) -> DataStreamWriter:
    w = stream.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def side_output_fanout(
    stream: DataFrame,
    discriminator: str,
    routes: dict[str, Callable[[DataFrame, int], None]],
) -> DataStreamWriter:
    """Route a discriminated-union stream (side-output column, e.g.
    blacklist_stream's ``out_type``) to one handler per tag in a single
    pass per micro-batch — the Spark shape of Flink's OutputTag fan-out
    (AdClickApp.java:70-71)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            for tag, fn in routes.items():
                fn(batch.filter(batch[discriminator] == tag), epoch_id)
        finally:
            batch.unpersist()

    return stream.writeStream.foreachBatch(handle)
