"""Generator sources (SURVEY §2.1 S3).

Reference parity: ``MarketBehaviorSource implements ParallelSourceFunction``
(gmall-market/src/main/java/com/wnswdwy/source/MarketBehaviorSource.java:16-47)
emits a random (userId, behavior ∈ {CLICK,DOWNLOAD,INSTALL,UNINSTALL},
channel ∈ {app store, wechat, weibo, tieba}, now-ms) tuple every 100 ms.

Spark-first: the ``rate`` source provides (timestamp, value) at a
configured rows/sec; a pure-column transform derives the same categorical
distributions deterministically from ``value`` (xxhash64-based, so the
stream is reproducible — better than the reference's unseeded Random).
The transform is a separate function so tests can apply it to a static
frame with the same (timestamp, value) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["BEHAVIORS", "CHANNELS", "market_behavior_transform", "market_behavior_stream"]

BEHAVIORS = ["CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL"]
CHANNELS = ["app store", "wechat", "weibo", "tieba"]


def market_behavior_transform(rate_df: DataFrame, n_users: int = 1000) -> DataFrame:
    """(timestamp, value) → (user_id, behavior, channel, ts). Pure columns,
    codegen'd; deterministic in ``value``."""
    h1 = F.abs(F.xxhash64(F.col("value"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("value"), F.lit(2)))
    h3 = F.abs(F.xxhash64(F.col("value"), F.lit(3)))
    return rate_df.select(
        (h1 % n_users).alias("user_id"),
        F.element_at(F.array(*[F.lit(b) for b in BEHAVIORS]), (h2 % 4 + 1).cast("int")).alias("behavior"),
        F.element_at(F.array(*[F.lit(c) for c in CHANNELS]), (h3 % 4 + 1).cast("int")).alias("channel"),
        F.col("timestamp").alias("ts"),
    )


def market_behavior_stream(
    spark: SparkSession, rows_per_second: int = 10, n_users: int = 1000
) -> DataFrame:
    """Streaming market-behavior generator (the reference emits 10 rows/s:
    one per 100 ms sleep)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return market_behavior_transform(rate, n_users)
