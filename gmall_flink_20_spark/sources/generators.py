"""Generator sources (SURVEY §2.1 S3).

Reference parity: ``MarketBehaviorSource implements ParallelSourceFunction``
(gmall-market/src/main/java/com/wnswdwy/source/MarketBehaviorSource.java:16-47)
emits a random (userId, behavior ∈ {CLICK,DOWNLOAD,INSTALL,UNINSTALL},
channel ∈ {app store, wechat, weibo, tieba}, now-ms) tuple every 100 ms.

Spark-first: the ``rate`` source provides (timestamp, value) at a
configured rows/sec; a pure-column transform derives the same categorical
distributions deterministically from ``value`` — md5-based, so the stream
is reproducible (better than the reference's unseeded Random) AND any
SQL engine can replay the exact same stream for verification
(``conv(substr(md5(...),1,15),16,10)`` ≡ DuckDB
``CAST(concat('0x', substr(md5(...),1,15)) AS BIGINT)`` — the repo's
established cross-engine hash idiom). The transform is a separate
function so tests can apply it to a static frame with the same
(timestamp, value) shape, and ``market_behavior_frame`` builds the
deterministic batch replica used for the oracle-gated replay run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "BEHAVIORS",
    "CHANNELS",
    "market_behavior_transform",
    "market_behavior_stream",
    "market_behavior_frame",
]

BEHAVIORS = ["CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL"]
CHANNELS = ["app store", "wechat", "weibo", "tieba"]


def _h(tag: str) -> F.Column:
    """60-bit md5-derived hash of (value, tag) — cross-engine reproducible."""
    return F.expr(
        f"CAST(conv(substr(md5(CAST(value AS STRING) || ':{tag}'), 1, 15), 16, 10) AS BIGINT)"
    )


def market_behavior_transform(rate_df: DataFrame, n_users: int = 1000) -> DataFrame:
    """(timestamp, value) → (user_id, behavior, channel, ts). Pure columns,
    deterministic in ``value``; md5-derived so any engine replays it."""
    return rate_df.select(
        (_h("u") % n_users).alias("user_id"),
        F.element_at(F.array(*[F.lit(b) for b in BEHAVIORS]), (_h("b") % 4 + 1).cast("int")).alias("behavior"),
        F.element_at(F.array(*[F.lit(c) for c in CHANNELS]), (_h("c") % 4 + 1).cast("int")).alias("channel"),
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


def market_behavior_frame(
    spark: SparkSession,
    n: int = 60000,
    start_epoch_s: int = 1_700_000_000,
    rows_per_second: int = 10,
    n_users: int = 1000,
) -> DataFrame:
    """Deterministic batch replica of ``n`` generator emissions — the
    (timestamp, value) shape the rate source produces, fed through the
    same transform. Row i fires at start + i/rows_per_second (the
    reference's 100 ms cadence at the default 10 rows/s)."""
    period_ms = 1000 // rows_per_second
    rate = spark.range(n).select(
        F.timestamp_millis(
            F.lit(start_epoch_s * 1000) + F.col("id") * period_ms
        ).alias("timestamp"),
        F.col("id").alias("value"),
    )
    return market_behavior_transform(rate, n_users)
