"""Streaming Top-N (update-mode agg + foreachBatch upsert) converges to
the batch Top-N answer — the flagship HotItems query, streaming form."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_20_spark.io import load_events
from gmall_flink_20_spark.operators import topn as btopn
from gmall_flink_20_spark.operators import windows as bwindows
from gmall_flink_20_spark.streaming import replay
from gmall_flink_20_spark.streaming import topn as stopn
from gmall_flink_20_spark.streaming import windows as swindows


def test_streaming_topn_converges_to_batch(spark, sf_dir):
    clicks = (
        load_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 5))
        .select(F.get_json_object("props", "$.k").cast("long").alias("item_id"), "ts")
    )
    stream = replay.replay_stream(spark, clicks, "ts", num_chunks=5)
    counts = swindows.streaming_windowed_count(
        stream, "ts", "2 seconds", "1 hour", None, "item_id"
    )
    store = stopn.DriverDictStore("window_end_s", "item_id", "cnt")
    q = stopn.topn_upsert_sink(counts, store).trigger(availableNow=True).start()
    q.awaitTermination()
    got = stopn.topn_from_store(store, 5)

    bcounts = bwindows.tumbling_count(clicks, "ts", "1 hour", "item_id")
    btop = btopn.top_n_per_key(bcounts, ["window_end_s"], "cnt", 5, tiebreak=["item_id"])
    exp: dict = {}
    for r in btop.orderBy("window_end_s", "rn").collect():
        exp.setdefault(r.window_end_s, []).append((r.item_id, r.cnt))

    assert got == exp  # every window's Top-5, exact


def test_parquet_upsert_store_last_write_wins(spark, tmp_path):
    store = stopn.ParquetUpsertStore(str(tmp_path / "log"), "w", "k")
    b1 = spark.createDataFrame([(1, "a", 5), (1, "b", 2)], "w int, k string, cnt int")
    b2 = spark.createDataFrame([(1, "a", 9), (2, "a", 1)], "w int, k string, cnt int")
    store.upsert(b1, 0)
    store.upsert(b2, 1)
    snap = {(r.w, r.k): r.cnt for r in store.snapshot(spark).collect()}
    assert snap == {(1, "a"): 9, (1, "b"): 2, (2, "a"): 1}
