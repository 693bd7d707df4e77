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
    store: dict = {}
    q = stopn.topn_upsert_sink(counts, "window_end_s", "item_id", "cnt", store).trigger(
        availableNow=True
    ).start()
    q.awaitTermination()
    got = stopn.topn_from_store(store, 5)

    bcounts = bwindows.tumbling_count(clicks, "ts", "1 hour", "item_id")
    btop = btopn.top_n_per_key(bcounts, ["window_end_s"], "cnt", 5, tiebreak=["item_id"])
    exp: dict = {}
    for r in btop.orderBy("window_end_s", "rn").collect():
        exp.setdefault(r.window_end_s, []).append((r.item_id, r.cnt))

    assert got == exp  # every window's Top-5, exact
