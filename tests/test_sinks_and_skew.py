"""Sinks (partitioned writes, side-output fan-out) and skew utilities."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from gmall_flink_20_spark import io_sinks
from gmall_flink_20_spark.operators import skew


def test_write_partitioned_prunes(spark):
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    out = tempfile.mkdtemp(prefix="wp_")
    io_sinks.write_partitioned(df, out, ["part"])
    dirs = {p.name for p in Path(out).iterdir() if p.is_dir()}
    assert dirs == {"part=0", "part=1", "part=2", "part=3"}
    back = spark.read.parquet(out).filter(F.col("part") == 2)
    assert back.count() == 25
    # partition filter reaches the scan as directory pruning
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_salted_join_matches_plain_join(spark):
    # one hot key (90% of rows) + long tail
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    plain = big.join(small, ["k"]).select("k", "payload", "v")
    salted = skew.salted_join(big, small, ["k"], n=8).select("k", "payload", "v")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_side_output_fanout(spark, sf_dir):
    from gmall_flink_20_spark.io import load_events
    from gmall_flink_20_spark.streaming import replay, stateful

    clicks = load_events(spark, sf_dir).filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 5)
    ).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day_str"),
        "ts",
    )
    stream = replay.replay_stream(spark, clicks, "ts", num_chunks=3)
    out = stateful.blacklist_stream(stream.drop("ts"), threshold=3)

    got: dict[str, int] = {"kept": 0, "warning": 0}

    def route(tag):
        def fn(batch, epoch_id):
            got[tag] += batch.count()

        return fn

    q = io_sinks.side_output_fanout(
        out, "out_type", {"kept": route("kept"), "warning": route("warning")}
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    assert got["kept"] > 0
    total = clicks.count()
    assert got["kept"] + got["warning"] <= total
    # warnings are one-shot per (user, day) crossing the threshold
    assert got["warning"] >= 0
