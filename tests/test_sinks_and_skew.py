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


def test_zvalue_interleaves_bits(spark):
    from gmall_flink_20_spark.operators.layout import zvalue

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y"), 16).alias("z")).collect()
    }

    def ref(x, y):
        return sum(
            (((x >> b) & 1) << (2 * b)) + (((y >> b) & 1) << (2 * b + 1))
            for b in range(16)
        )

    assert got == {(x, y): ref(x, y) for (x, y) in got}


def test_write_zordered_tightens_boxes(spark):
    """A z-ordered write must give per-file bounding boxes whose summed
    area is far below a single-column sort's on the second dimension."""
    import itertools

    from gmall_flink_20_spark import io_sinks

    rows = [(x, y) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    out = tempfile.mkdtemp(prefix="zw_")
    io_sinks.write_zordered(df, out, "x", "y", n_files=16, bits=6)
    files = [p for p in Path(out).glob("*.parquet")]
    assert len(files) >= 4  # range partitioner may merge a few empties
    # per-FILE bounding boxes, read back individually
    areas = []
    total = 0
    for p in files:
        part = spark.read.parquet(str(p))
        r = part.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count(F.lit(1))
        ).collect()[0]
        if r[4] == 0:
            continue
        total += r[4]
        areas.append((r[1] - r[0] + 1) * (r[3] - r[2] + 1))
    assert total == 64 * 64  # lossless
    # x-sorted layout with the same file count gives full-range y boxes:
    # every file's area is 64 * (64/nfiles) = 256 at best... z-order must
    # beat the x-sort total (nfiles * 64 * ceil(64/nfiles) = 4096+) clearly
    assert sum(areas) < 16 * 64 * 4 * 2  # within 2x of the ideal 4-cell split


def test_compact_small_files(spark):
    from gmall_flink_20_spark import io_sinks

    src = tempfile.mkdtemp(prefix="cs_src_")
    spark.range(10_000).repartition(40).write.mode("overwrite").parquet(src)
    n_in = len(list(Path(src).glob("*.parquet")))
    assert n_in == 40
    dst = tempfile.mkdtemp(prefix="cs_dst_")
    n_out = io_sinks.compact_small_files(spark, src, dst, target_file_bytes=1 << 20)
    files_out = list(Path(dst).glob("*.parquet"))
    assert len(files_out) == n_out < n_in
    assert spark.read.parquet(dst).count() == 10_000


def test_compact_small_files_clamps_to_source_splits(spark):
    """When the byte-sizing formula asks for MORE files than the source
    has splits, coalesce can't widen — the returned count must match the
    files actually written (ADVICE r3)."""
    from gmall_flink_20_spark import io_sinks

    src = tempfile.mkdtemp(prefix="cs_clamp_src_")
    spark.range(50_000).coalesce(2).write.mode("overwrite").parquet(src)
    dst = tempfile.mkdtemp(prefix="cs_clamp_dst_")
    # ~200 KB of parquet with a 1 KB target asks for ~200 output files
    n_out = io_sinks.compact_small_files(spark, src, dst, target_file_bytes=1024)
    files_out = list(Path(dst).glob("*.parquet"))
    assert n_out == len(files_out), (n_out, len(files_out))
    assert spark.read.parquet(dst).count() == 50_000


def test_bucketed_tables_join_without_exchange(spark):
    """The co-located-join contract write_bucketed exists for: two tables
    bucketed on the join key must sort-merge join with ZERO Exchange —
    at 100 TB this is the difference between a free join and shuffling
    both fact tables."""
    import re

    from gmall_flink_20_spark import io_sinks

    a = spark.range(10_000).withColumn("va", F.col("id") * 2)
    b = spark.range(10_000).withColumn("vb", F.col("id") * 3)
    spark.sql("DROP TABLE IF EXISTS bj_a")
    spark.sql("DROP TABLE IF EXISTS bj_b")
    io_sinks.write_bucketed(a, "bj_a", ["id"], 8, sort_by=["id"])
    io_sinks.write_bucketed(b, "bj_b", ["id"], 8, sort_by=["id"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bj_a").join(spark.table("bj_b"), "id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Spark's runtime Bloom-filter join pruning — the 100 TB feature
    that pre-filters the fact-table scan with a sketch of the selective
    dim side before the shuffle join. The applicationSideScanSizeThreshold
    (default 10 GB) exists precisely because the filter only pays off on
    big scans; zeroing it here makes the optimizer inject the filter on
    test-sized data so the plan shape is pinned."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = tempfile.mkdtemp(prefix="bf_big_")
        small = tempfile.mkdtemp(prefix="bf_small_")
        spark.range(200_000).withColumn("v", F.col("id") % 1000).write.mode(
            "overwrite"
        ).parquet(big)
        spark.range(100).withColumn("k", F.col("id") * 17).write.mode(
            "overwrite"
        ).parquet(small)
        b = spark.read.parquet(big)
        s = spark.read.parquet(small)
        j = b.join(s.filter("k % 3 = 0"), b["id"] == s["k"])
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan  # sketch built on the dim side
        assert "might_contain" in plan  # probe pushed into the fact scan side
        assert j.count() == s.filter("k % 3 = 0").filter("k < 200000").count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_agg_without_exchange(spark):
    """groupBy on the bucket key over a bucketed table needs no Exchange:
    the hash aggregate runs bucket-local — at 100 TB a daily rollup over
    a bucketed fact table skips the full-table shuffle entirely."""
    import re

    from gmall_flink_20_spark import io_sinks

    df = spark.range(20_000).withColumn("k", F.col("id") % 500).withColumn(
        "v", F.col("id") * 2
    )
    spark.sql("DROP TABLE IF EXISTS ba_t")
    io_sinks.write_bucketed(df, "ba_t", ["k"], 8)
    try:
        agg = spark.table("ba_t").groupBy("k").agg(F.sum("v").alias("sv"))
        plan = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert agg.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS ba_t")


def test_bucket_coalescing_joins_mismatched_bucket_counts(spark):
    """Tables bucketed 8 vs 4 on the same key: with
    coalesceBucketsInJoin enabled Spark coalesces the 8-bucket side to 4
    and joins with ZERO Exchange — re-bucketing an entire historical
    table to match a new producer's bucket count is exactly the migraine
    this avoids at 100 TB."""
    import re

    from gmall_flink_20_spark import io_sinks

    a = spark.range(10_000).withColumn("va", F.col("id") * 2)
    b = spark.range(10_000).withColumn("vb", F.col("id") * 3)
    spark.sql("DROP TABLE IF EXISTS bc_a")
    spark.sql("DROP TABLE IF EXISTS bc_b")
    io_sinks.write_bucketed(a, "bc_a", ["id"], 8, sort_by=["id"])
    io_sinks.write_bucketed(b, "bc_b", ["id"], 4, sort_by=["id"])
    confs = {
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = spark.table("bc_a").join(spark.table("bc_b"), "id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert joined.count() == 10_000
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS bc_a")
        spark.sql("DROP TABLE IF EXISTS bc_b")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join evidence (scripts/aqe_skew_ab.py is the measured
    A/B: 9-10 s -> 2-2.5 s at 4M rows, 60% on one key): the executed
    adaptive plan must carry the skew markers — SortMergeJoin(skew=true)
    reading a 'skewed' AQEShuffleRead — proving the hot partition was
    split instead of landing on one task. Thresholds are scaled down so
    the split triggers at test volume."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = (
            spark.range(400_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 6, F.lit(0)).otherwise(
                    F.pmod(F.hash("id"), F.lit(1000))
                ),
            )
            .withColumn("payload", F.md5(F.col("id").cast("string")))
        )
        dim = (
            spark.range(1000)
            .withColumnRenamed("id", "k")
            .withColumn("dup", F.explode(F.sequence(F.lit(1), F.lit(10))))
        )
        out = (
            fact.join(dim, "k")
            .groupBy(F.substring("payload", 1, 2).alias("pp"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        assert len(out.collect()) > 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # the AQEShuffleRead marker
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
