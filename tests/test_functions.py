"""Pandas-UDF kernels: vectorized ANN rank-equality vs the fold baseline,
and grouped-agg UDAFs vs exact models."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_20_spark.functions import udaf, vector_kernels
from gmall_flink_20_spark.io import load_table
from gmall_flink_20_spark.operators import similarity


def test_vectorized_ann_matches_fold_baseline(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = similarity.ann_bruteforce_topk(emb, list(range(5)), 4).collect()
    fast = vector_kernels.ann_topk_vectorized(emb, list(range(5)), 4).collect()
    b = sorted((r.query_id, r.rank, r.neighbor_id) for r in base)
    f = sorted((r.query_id, r.rank, r.neighbor_id) for r in fast)
    assert b == f  # identical rankings (ties broken by neighbor_id)


def test_vectorized_ann_no_python_row_loop_in_plan(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    df = vector_kernels.ann_topk_vectorized(emb, [0], 3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    # Arrow-batched map, not row-at-a-time BatchEvalPython
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_weighted_mean_udaf(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0)], "g string, v double, w double"
    )
    out = {r.g: r.wm for r in df.groupBy("g").agg(udaf.weighted_mean("v", "w").alias("wm")).collect()}
    assert out["a"] == pytest.approx((1 * 1 + 3 * 3) / 4)
    assert out["b"] == pytest.approx(10.0)


def test_quantile_udaf(spark):
    df = spark.createDataFrame([("a", float(x)) for x in range(1, 6)], "g string, v double")
    out = df.groupBy("g").agg(udaf.p_quantile("v").alias("med")).collect()[0]
    assert out.med == 3.0
