"""Streaming stream-stream joins ≡ batch joins (J1/J2 streaming forms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_flink_20_spark.io import load_events
from gmall_flink_20_spark.operators import joins as bjoins
from gmall_flink_20_spark.streaming import joins as sjoins
from gmall_flink_20_spark.streaming import replay
from test_streaming import far_future_row


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return load_events(spark, sf_dir).filter(F.col("user_id") < 5).cache()


def _sides(ev):
    pays = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_id"), F.col("user_id").alias("key"), F.col("ts").alias("pay_ts")
    )
    recs = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("receipt_id"),
        F.col("user_id").alias("key"),
        F.col("ts").alias("receipt_ts"),
    )
    return pays, recs


def test_stream_interval_join_matches_batch(spark, ev):
    pays, recs = _sides(ev)
    sp = replay.replay_stream(spark, pays, "pay_ts", num_chunks=4)
    sr = replay.replay_stream(spark, recs, "receipt_ts", num_chunks=4)
    out = sjoins.stream_interval_join(sp, sr, "key", "pay_ts", "receipt_ts", -3600, 3600)
    got = replay.run_to_completion(
        out.select(F.col("l.pay_id").alias("pay_id"), F.col("r.receipt_id").alias("receipt_id"))
    ).toPandas()

    exp = bjoins.interval_join(
        pays.select("pay_id", "key", F.col("pay_ts").cast("long").alias("ts_s")),
        recs.select("receipt_id", "key", F.col("receipt_ts").cast("long").alias("rts_s")),
        "key",
        "ts_s",
        "rts_s",
        -3600,
        3600,
    ).select(F.col("l.pay_id"), F.col("r.receipt_id")).toPandas()

    g = sorted(map(tuple, got.values.tolist()))
    e = sorted(map(tuple, exp.values.tolist()))
    # boundary rows can differ only when ts fractions straddle the exact
    # second boundary (batch compares floored seconds); require ≥99% match
    assert len(set(g) & set(e)) >= max(1, int(0.99 * len(e)))
    assert len(g) == len(set(g))  # no duplicate emissions


def test_stream_reconcile_full_outer_matches_batch(spark, ev):
    pays, recs = _sides(ev)
    s1 = far_future_row(spark, pays.select("pay_id", "key", F.col("pay_ts").alias("ts")), ts_col="ts", days=30)
    s1 = s1.select(F.col("pay_id"), F.col("key"), F.col("ts").alias("pay_ts"))
    s2 = far_future_row(spark, recs.select("receipt_id", "key", F.col("receipt_ts").alias("ts")), ts_col="ts", days=30)
    s2 = s2.select(F.col("receipt_id"), F.col("key"), F.col("ts").alias("receipt_ts"))
    sp = replay.replay_stream(spark, pays, "pay_ts", num_chunks=4, extra_chunks=[s1])
    sr = replay.replay_stream(spark, recs, "receipt_ts", num_chunks=4, extra_chunks=[s2])
    out = sjoins.stream_reconcile_full_outer(sp, sr, "key", "pay_ts", "receipt_ts", -3600, 3600)
    got = replay.run_to_completion(
        out.select("category", F.col("l.pay_id").alias("pay_id"), F.col("r.receipt_id").alias("receipt_id"))
    ).toPandas()
    # drop sentinel self-rows
    got = got[~(got["pay_id"].fillna(0) >= 10**12) & ~(got["receipt_id"].fillna(0) >= 10**12)]

    exp = (
        bjoins.reconcile_full_outer(
            pays.select("pay_id", "key", F.col("pay_ts").cast("long").alias("ts_s")),
            recs.select("receipt_id", "key", F.col("receipt_ts").cast("long").alias("rts_s")),
            "key",
            "ts_s",
            "rts_s",
            -3600,
            3600,
        )
        .groupBy("category")
        .count()
        .toPandas()
    )
    gc = got.groupby("category").size().to_dict()
    ec = {r.category: r["count"] for _, r in exp.iterrows()}
    for cat in ("matched", "left_only", "right_only"):
        assert abs(gc.get(cat, 0) - ec.get(cat, 0)) <= max(1, int(0.02 * ec.get(cat, 1))), (
            cat,
            gc,
            ec,
        )
