"""Round-9 operator tests: persisted IVF index (write/reload/query)."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gmall_flink_20_spark.io import load_table
from gmall_flink_20_spark.operators import ann


def _index(spark, sf_dir, tmp=None):
    emb = load_table(spark, sf_dir, "embeddings")
    path = (tmp or tempfile.mkdtemp(prefix="ivf_idx_t_")) + "/index"
    ann.ivf_index_write(emb, path, nlist=16, train_iters=3)
    return emb, path


def test_ivf_index_reload_equals_retrain(spark, sf_dir):
    """Determinism makes this exact: querying the reloaded on-disk
    index returns the identical row set as retraining in-session."""
    emb, path = _index(spark, sf_dir)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_persisted_topk(
            spark, path, emb, list(range(10)), 5, nprobe=4
        ).collect()
    }
    exp = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_topk(
            emb, list(range(10)), 5, nlist=16, nprobe=4, train_iters=3
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_ivf_index_layout_and_meta(spark, sf_dir):
    emb, path = _index(spark, sf_dir)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta.nlist, meta.train_iters, meta.dim) == (16, 3, 64)
    cents = ann.ivf_index_load_centroids(spark, path)
    assert len(cents) == 16 and all(len(v) == 64 for _, v in cents)
    # postings are hive-partitioned by list_id and cover the corpus
    post = spark.read.parquet(f"{path}/postings")
    assert post.count() == emb.count()
    dirs = {p.name for p in Path(f"{path}/postings").iterdir() if p.is_dir()}
    assert dirs and all(d.startswith("list_id=") for d in dirs)


def test_ivf_persisted_scan_prunes_partitions(spark, sf_dir):
    """The probe-time postings read must touch ONLY the probed cells'
    files — directory pruning, the reason the index is partitioned."""
    emb, path = _index(spark, sf_dir)
    cents = ann.ivf_index_load_centroids(spark, path)
    qbase = ann.with_unit(
        emb.filter(F.col("vec_id").isin(list(range(10)))).select(
            "vec_id", "embedding"
        ),
        "embedding",
        64,
    )
    probed = sorted(
        {
            int(r.list_id)
            for r in qbase.select(
                F.explode(ann._probe_udf(cents, 4)(F.col("_av"))).alias("list_id")
            ).collect()
        }
    )
    all_lists = {
        int(p.name.split("=")[1])
        for p in Path(f"{path}/postings").iterdir()
        if p.is_dir()
    }
    assert set(probed) < all_lists, "probe must not touch every cell"
    pruned = spark.read.parquet(f"{path}/postings").filter(
        F.col("list_id").isin(probed)
    )
    # static partition pruning: the scan node carries the isin() as a
    # PartitionFilter, so directory listing drops the unprobed cells
    # before any data file is opened (inputFiles() reports the
    # pre-filter FileIndex, so gate on the plan instead)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "list_id" in pf and "IN" in pf  # rendered as IN or INSET
    # and the executed scan only produces rows from probed directories
    touched = {
        int(r.f.split("list_id=")[1].split("/")[0])
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert touched == set(probed)


# ------------------------------------------------ streaming quantiles


def test_certify_quantile_answers_flags_out_of_band(spark):
    from gmall_flink_20_spark.operators.profiling import certify_quantile_answers

    base = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "grp string, v double"
    )
    good = spark.createDataFrame(
        [("g", 50.0, 90.0, 99.0)], "grp string, _a50 double, _a90 double, _a99 double"
    )
    bad = spark.createDataFrame(
        # p50 answer of 80 is ~30 ranks off on n=100 — far outside n/1000
        [("g", 80.0, 90.0, 99.0)], "grp string, _a50 double, _a90 double, _a99 double"
    )
    ok = certify_quantile_answers(base, good, "v", ["grp"]).collect()[0]
    assert (ok.q50_ok, ok.q90_ok, ok.q99_ok) == (True, True, True)
    assert ok.p50 == 50.5  # exact interpolated median of 1..100
    ko = certify_quantile_answers(base, bad, "v", ["grp"]).collect()[0]
    assert ko.q50_ok is False and ko.q90_ok is True


def test_quantiles_stream_recovers_from_checkpoint(spark, sf_dir):
    """Kill-and-resume for the streaming percentile aggregation: the
    merged GK sketch state must survive the restart — the final
    per-(day, type) answers certify against exact rank arithmetic over
    ALL the data, halves included."""
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from gmall_flink_20_spark.io import load_events
    from gmall_flink_20_spark.operators.profiling import certify_quantile_answers
    from gmall_flink_20_spark.streaming import topn as stopn
    from tests.test_streaming_recovery import _write_chunk

    ev = (
        load_events(spark, sf_dir)
        .select(
            "ts",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .orderBy("ts")
    )
    rows = ev.collect()
    half = len(rows) // 2
    schema = ev.schema

    base_dir = Path(tempfile.mkdtemp(prefix="recov_q_"))
    src = base_dir / "src"
    src.mkdir()
    ckpt = str(base_dir / "ckpt")
    store = stopn.ParquetUpsertStore(
        str(base_dir / "log"), "day", "event_type"
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        est = (
            stream.withWatermark("ts", "2 seconds")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.percentile_approx(
                    "cents",
                    F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
                    F.lit(1000),
                ).alias("qs")
            )
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
                "event_type",
                F.col("qs")[0].cast("double").alias("_a50"),
                F.col("qs")[1].cast("double").alias("_a90"),
                F.col("qs")[2].cast("double").alias("_a99"),
            )
        )
        q = (
            stopn.topn_upsert_sink(est, store)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_chunk(spark.createDataFrame(rows[:half], schema), src, 0, 1_000_000_000)
    run_once()
    _write_chunk(spark.createDataFrame(rows[half:], schema), src, 1, 1_000_000_001)
    run_once()

    answers = store.snapshot(spark)
    base = ev.select(
        F.date_format(F.to_date(F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_type",
        "cents",
    )
    got = certify_quantile_answers(
        base, answers, "cents", ["day", "event_type"]
    ).collect()
    n_groups = base.select("day", "event_type").distinct().count()
    assert len(got) == n_groups
    assert all(r.q50_ok and r.q90_ok and r.q99_ok for r in got)


# -------------------------------------------- two-stream temporal join


def test_two_stream_temporal_join_equals_one_stream(spark, sf_dir):
    """The union-with-discriminator wrapper must emit the identical
    decided row set as the unified one-stream machine on the same
    events (min-watermark rule keeps decisions exactly-once)."""
    from pyspark.sql import functions as F

    from gmall_flink_20_spark.io import load_events
    from gmall_flink_20_spark.streaming import replay, stateful

    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            "ts",
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    dims = ev.filter(F.col("event_type") != "purchase").drop("cents")
    f1, f2, _ = replay.sentinel_pair(spark, facts, overrides={"cents": 0})
    d1, d2, _ = replay.sentinel_pair(spark, dims)
    two = replay.run_to_completion(
        stateful.temporal_join_two_streams(
            replay.replay_stream(
                spark, facts, "ts", num_chunks=2, extra_chunks=[f1, f2]
            ).withWatermark("ts", "2 seconds"),
            replay.replay_stream(
                spark, dims, "ts", num_chunks=2, extra_chunks=[d1, d2]
            ).withWatermark("ts", "2 seconds"),
        )
    ).filter(F.col("user_id") >= 0)
    s1, s2, _ = replay.sentinel_pair(spark, ev)
    one = replay.run_to_completion(
        stateful.temporal_join_stream(
            replay.replay_stream(
                spark, ev, "ts", num_chunks=2, extra_chunks=[s1, s2]
            ).withWatermark("ts", "2 seconds")
        )
    ).filter(F.col("user_id") >= 0)
    key = lambda r: (r.user_id, r.ts_us, r.cents, r.state_at)  # noqa: E731
    assert {key(r) for r in two.collect()} == {key(r) for r in one.collect()}


# ------------------------------------------- environment-gate canaries


def test_media_runtime_gated_on_pil():
    """Mirror of test_tws_runtime_gated_on_protobuf (VERDICT r8 item 6):
    the JPEG decode tier (multimodal.py) is honestly NotImplementedError
    because PIL is absent. If this test ever FAILS, PIL has appeared in
    the environment — wire the real decode into _decode_batch /
    _resize_batch the same round instead of letting the stub rot."""
    import pytest

    with pytest.raises(ImportError):
        import PIL  # noqa: F401


def test_media_runtime_gated_on_ffmpeg():
    """Same canary for the MP4 frame-sampling tier: if ffmpeg appears
    on PATH (or pyav becomes importable), wire sample_frames' real
    seek+decode path."""
    import shutil as _sh

    import pytest

    assert _sh.which("ffmpeg") is None, (
        "ffmpeg appeared — wire multimodal.sample_frames' real path"
    )
    with pytest.raises(ImportError):
        import av  # noqa: F401


# ------------------------------------------------- incremental append


def test_ivf_index_append_order_invariant(spark, sf_dir):
    """write(base) + append(delta) must equal write(base) + append in
    two chunks — appends only add postings files under the frozen
    quantizer, so construction order cannot change query results."""
    import tempfile

    from gmall_flink_20_spark.operators import sampling

    emb = load_table(spark, sf_dir, "embeddings")
    split = F.pmod(sampling.sample_hash("vec_id", "ivfbase"), F.lit(10))
    base, delta = emb.filter(split != 0), emb.filter(split == 0)

    def build(chunks):
        path = tempfile.mkdtemp(prefix="ivf_app_t_") + "/index"
        ann.ivf_index_write(base, path, nlist=16, train_iters=3)
        for c in chunks:
            ann.ivf_index_append(c, path)
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann.ann_ivf_persisted_topk(
                spark, path, emb, list(range(10)), 5, nprobe=4
            ).collect()
        }

    one = build([delta])
    two = build(
        [delta.filter(F.col("vec_id") % 2 == 0), delta.filter(F.col("vec_id") % 2 == 1)]
    )
    assert one == two and len(one) == 50


def test_ivf_index_append_covers_delta(spark, sf_dir):
    """Appended vectors must be findable: total postings row count is
    base+delta, and delta ids appear in the postings."""
    import tempfile

    from gmall_flink_20_spark.operators import sampling

    emb = load_table(spark, sf_dir, "embeddings")
    split = F.pmod(sampling.sample_hash("vec_id", "ivfbase"), F.lit(10))
    base, delta = emb.filter(split != 0), emb.filter(split == 0)
    path = tempfile.mkdtemp(prefix="ivf_app_c_") + "/index"
    ann.ivf_index_write(base, path, nlist=16, train_iters=3)
    ann.ivf_index_append(delta, path)
    post = spark.read.parquet(f"{path}/postings")
    assert post.count() == emb.count()
    n_delta = delta.count()
    assert n_delta > 0
    got = post.join(
        delta.select(F.col("vec_id").alias("neighbor_id")), "neighbor_id"
    ).count()
    assert got == n_delta


def test_ivf_index_compact_is_result_invariant(spark, sf_dir):
    """3 appends leave multiple files per touched cell; compaction must
    drop to one file per cell and change NOTHING about query answers."""
    import tempfile
    from pathlib import Path as _P

    from gmall_flink_20_spark.operators import sampling

    emb = load_table(spark, sf_dir, "embeddings")
    split = F.pmod(sampling.sample_hash("vec_id", "ivfbase"), F.lit(10))
    base, delta = emb.filter(split != 0), emb.filter(split == 0)
    path = tempfile.mkdtemp(prefix="ivf_cmp_t_") + "/index"
    ann.ivf_index_write(base, path, nlist=16, train_iters=3)
    third = F.pmod(F.col("vec_id"), F.lit(3))
    for j in range(3):
        ann.ivf_index_append(delta.filter(third == j), path)

    def files_per_cell():
        cells = {}
        for f in _P(f"{path}/postings").rglob("*.parquet"):
            cells.setdefault(f.parent.name, 0)
            cells[f.parent.name] += 1
        return cells

    def answers():
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann.ann_ivf_persisted_topk(
                spark, path, emb, list(range(10)), 5, nprobe=4
            ).collect()
        }

    before_files = files_per_cell()
    assert max(before_files.values()) > 1, "appends must fragment cells"
    before = answers()
    n_rows = spark.read.parquet(f"{path}/postings").count()
    n = ann.ivf_index_compact(spark, path)
    after_files = files_per_cell()
    assert n == len(after_files) and set(after_files.values()) == {1}
    assert spark.read.parquet(f"{path}/postings").count() == n_rows
    assert answers() == before


# ------------------------------------------------ persisted LSH index


def test_lsh_index_query_equals_in_session(spark, sf_dir):
    """Querying the stored band/shingle index must return the identical
    kept-set as neardup_incremental over the unified corpus."""
    import tempfile

    from gmall_flink_20_spark.operators import dedup, sampling

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(sampling.sample_hash("doc_id", "incr"), F.lit(4))
    base, new = docs.filter(shard != 0), docs.filter(shard == 0)
    path = tempfile.mkdtemp(prefix="lsh_idx_t_") + "/index"
    dedup.lsh_index_write(base, path)
    got = {
        (r.doc_id, r.kept)
        for r in dedup.lsh_index_query_incremental(spark, path, new).collect()
    }
    exp = {(r.doc_id, r.kept) for r in dedup.neardup_incremental(docs).collect()}
    assert got == exp and len(got) > 0
    assert any(k == 0 for _, k in got), "shard must contain at least one dup"


def test_lsh_index_layout(spark, sf_dir):
    import tempfile
    from pathlib import Path as _P

    from gmall_flink_20_spark.operators import dedup, sampling

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(sampling.sample_hash("doc_id", "incr"), F.lit(4))
    base = docs.filter(shard != 0)
    path = tempfile.mkdtemp(prefix="lsh_idx_l_") + "/index"
    dedup.lsh_index_write(base, path)
    bands = {p.name for p in _P(f"{path}/bands").iterdir() if p.is_dir()}
    assert bands == {f"band_id={b}" for b in range(4)}
    sh = spark.read.parquet(f"{path}/shingles")
    # every base doc with >= n tokens has its stored shingle set
    n_expected = base.filter(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 3
    ).count()
    assert sh.count() == n_expected


# --------------------------------------------------- IVF cell stats


def test_cell_stats_scan_reads_no_data_columns(spark, sf_dir):
    """The cell-size aggregate groups on the PARTITION column, so the
    postings scan must read the empty struct — pure directory metadata,
    the plan every 100 TB index-health job wants."""
    emb, path = _index(spark, sf_dir)
    df = ann.ivf_index_cell_stats(spark, path)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "struct<>" in read
    assert "nv" not in read and "nn" not in read


def test_cell_stats_imbalance_formula(spark, sf_dir):
    """IF = nlist * sum(s^2) / N^2 on a hand-built index layout."""
    import tempfile

    import pyarrow as pa

    from gmall_flink_20_spark.operators.ann import (
        _write_small_parquet,
        ivf_index_cell_stats,
    )

    path = tempfile.mkdtemp(prefix="ivf_stats_t_") + "/index"
    _write_small_parquet(
        f"{path}/meta",
        {"nlist": [4], "train_iters": [0], "dim": [2]},
        pa.schema([(k, pa.int32()) for k in ("nlist", "train_iters", "dim")]),
    )
    rows = [(i, [1.0], 1.0, c) for i, c in enumerate([0, 0, 0, 1, 2, 2])]
    spark.createDataFrame(
        rows, "neighbor_id long, nv array<double>, nn double, list_id int"
    ).repartition("list_id").write.partitionBy("list_id").parquet(f"{path}/postings")
    r = ivf_index_cell_stats(spark, path).collect()[0]
    assert (r.n_cells_used, r.n_vectors, r.min_cell, r.max_cell) == (3, 6, 1, 3)
    # IF = 4 * (9 + 1 + 4) / 36 = 1.555556
    assert r.imbalance == 1.555556


def test_lsh_index_retry_sees_itself_safely(spark, sf_dir):
    """foreachBatch retry contract: if a batch's own bands were already
    appended (crash after append, before offset commit), re-querying the
    SAME batch must return the original decisions — self-matches and
    same-batch index matches are excluded, base matches still count."""
    import tempfile

    from gmall_flink_20_spark.operators import dedup, sampling

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(sampling.sample_hash("doc_id", "incr"), F.lit(4))
    base, new = docs.filter(shard != 0), docs.filter(shard == 0)
    path = tempfile.mkdtemp(prefix="lsh_retry_t_") + "/index"
    dedup.lsh_index_write(base, path)
    clean = {
        (r.doc_id, r.kept)
        for r in dedup.lsh_index_query_incremental(spark, path, new).collect()
    }
    # simulate the crashed-after-append retry: the batch is IN the index
    dedup.lsh_index_append(new, path)
    retry = {
        (r.doc_id, r.kept)
        for r in dedup.lsh_index_query_incremental(spark, path, new).collect()
    }
    assert retry == clean
    assert any(k == 0 for _, k in clean)  # non-vacuous: real drops exist


def test_lsh_index_compact_reduces_files_invariantly(spark, sf_dir):
    import tempfile
    from pathlib import Path as _P

    from gmall_flink_20_spark.operators import dedup, sampling

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(sampling.sample_hash("doc_id", "incr"), F.lit(4))
    path = tempfile.mkdtemp(prefix="lsh_cmp_t_") + "/index"
    dedup.lsh_index_write(docs.filter(shard.isin(2, 3)), path)
    s1 = docs.filter(shard == 1)
    half = F.pmod(F.col("doc_id"), F.lit(2))
    dedup.lsh_index_append(s1.filter(half == 0), path)
    dedup.lsh_index_append(s1.filter(half == 1), path)

    def nfiles(sub):
        return sum(1 for _ in _P(f"{path}/{sub}").rglob("*.parquet"))

    def answers():
        return {
            (r.doc_id, r.kept)
            for r in dedup.lsh_index_query_incremental(
                spark, path, docs.filter(shard == 0)
            ).collect()
        }

    before = (nfiles("bands"), nfiles("shingles"))
    exp = answers()
    rows_before = (
        spark.read.parquet(f"{path}/bands").count(),
        spark.read.parquet(f"{path}/shingles").count(),
    )
    total = dedup.lsh_index_compact(spark, path)
    assert nfiles("bands") == 4 and nfiles("bands") < before[0]
    assert nfiles("shingles") <= before[1]
    assert total == nfiles("bands") + nfiles("shingles")
    assert (
        spark.read.parquet(f"{path}/bands").count(),
        spark.read.parquet(f"{path}/shingles").count(),
    ) == rows_before
    assert answers() == exp
