"""SparkSession factory.

One place for every config knob so local tests, the driver's verify, and
``bench.py`` all run the same engine. Defaults are tuned for the local[NN]
single-JVM harness but chosen to be the *right* defaults on a real
multi-executor cluster too:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting)
- explicit ``spark.sql.shuffle.partitions`` (overridable via env)
- UTC session timezone so naive parquet timestamps hash identically to the
  DuckDB oracle
- ``nanosAsLong`` so the driver's nanosecond-precision ``events`` parquet is
  readable (Spark has no ns timestamp type; ``io.load_table`` converts)
- Arrow enabled for the Pandas-UDF slow path
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "gmall_flink_20_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the shared SparkSession."""
    if master is None:
        master = f"local[{_cpus()}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: coalesce small shuffle partitions, split skewed ones at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # The driver's events table stores TIMESTAMP(NANOS) which Spark has
        # no native type for; older Sparks read it as long via this legacy
        # conf, newer ones ignore the conf and read TIMESTAMP_NTZ —
        # io._normalize_events handles both representations.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow transfer for the Pandas-UDF/applyInPandas slow path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Small-dim broadcast threshold: generous — dims here are tiny, and
        # at 100 TB the dims (nation/region/part) still fit comfortably.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
