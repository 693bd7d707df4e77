"""Round-13 optimization: io.fan_out_scan — the scale-adaptive scan
fan-out applied before expensive Python codec kernels (optimization
guide §2.5 input skew). Pins both sides of the adaptivity contract:
a below-parallelism scan gains exactly one deterministic hash
exchange; an already-parallel frame is returned unchanged (no exchange
at real multi-split scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_20_spark.io import fan_out_scan
from gmall_flink_20_spark.operators import multimodal


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fan_out_noop_when_already_parallel(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    # spark.range defaults to defaultParallelism partitions
    assert df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    out = fan_out_scan(df, "doc_id")
    assert out is df  # unchanged frame, no exchange added


def test_fan_out_repartitions_single_partition_scan(spark):
    df = (
        spark.range(1000)
        .withColumnRenamed("id", "doc_id")
        .coalesce(1)
    )
    out = fan_out_scan(df, "doc_id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # deterministic hash partitioning on the key, never round-robin
    assert "hashpartitioning(doc_id" in _plan(out)
    # row set unchanged
    assert out.count() == 1000
    assert out.agg(F.sum("doc_id")).first()[0] == 999 * 1000 // 2


def test_jpeg_encoder_fans_out_single_partition_input(spark):
    ids = spark.range(64).withColumnRenamed("id", "doc_id").coalesce(1)
    plan = _plan(multimodal.encode_jpeg(ids))
    assert "Exchange" in plan and "hashpartitioning(doc_id" in plan
    # results identical to the serial path (row-local codec)
    rows = {
        r.media_id: r.payload
        for r in multimodal.encode_jpeg(ids).collect()
    }
    serial = {
        r.media_id: r.payload
        for r in multimodal.encode_jpeg(
            spark.range(64).withColumnRenamed("id", "doc_id").repartition(32)
        ).collect()
    }
    assert rows == serial
