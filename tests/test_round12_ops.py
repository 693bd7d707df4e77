"""Round-12 additions: incremental (fragmented-cells-only) index
compaction, concurrent atomic appends, stale-staging purge, pinned-token
compactor reads (ADVICE r11), PQ streaming ingest, and the vectorized
n-gram kernels."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from gmall_flink_20_spark import io_sinks
from gmall_flink_20_spark.io_sinks import InterruptedCompaction
from gmall_flink_20_spark.operators import ann, dedup


# ------------------------------------------------ toy partitioned frame


def _toy_frame(spark, root: str, cells: dict[int, list[int]]) -> None:
    """Base frame at <root>/postings partitioned by list_id with the
    given rows per cell (one file per cell)."""
    rows = [(v, c) for c, vals in cells.items() for v in vals]
    df = spark.createDataFrame(rows, "neighbor_id long, list_id int")
    (
        df.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{root}/postings")
    )


def _toy_segment(spark, root: str, token: str, cells: dict[int, list[int]],
                 commit: bool = True) -> None:
    rows = [(v, c) for c, vals in cells.items() for v in vals]
    df = spark.createDataFrame(rows, "neighbor_id long, list_id int")
    (
        df.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{io_sinks.stage_segment_dir(root, token)}/postings")
    )
    if commit:
        io_sinks.commit_segment(root, token)


def _visible(spark, root: str) -> set[tuple[int, int]]:
    return {
        (r.neighbor_id, r.list_id)
        for r in io_sinks.read_with_segments(spark, root, "postings").collect()
    }


def _cell_stat(root: str, cell: str) -> list[tuple[str, int, float]]:
    d = os.path.join(root, "postings", cell)
    return sorted(
        (fn, os.stat(os.path.join(d, fn)).st_ino, os.stat(os.path.join(d, fn)).st_mtime)
        for fn in os.listdir(d)
        if fn.endswith(".parquet")
    )


def test_incremental_compact_rewrites_only_fragmented_cells(spark, tmp_path):
    root = str(tmp_path / "idx")
    _toy_frame(spark, root, {0: [1, 2], 1: [3], 2: [4]})
    _toy_segment(spark, root, "s1", {1: [10], 2: [11]})
    _toy_segment(spark, root, "s2", {2: [12]})
    before = _visible(spark, root)
    untouched = _cell_stat(root, "list_id=0")

    counts = io_sinks.cell_fragment_counts(root, "postings")
    assert counts == {"list_id=0": 1, "list_id=1": 2, "list_id=2": 3}

    victims = io_sinks.compact_cells_incremental(
        spark, root, "postings", max_fragments=2
    )
    assert victims == ["list_id=2"]
    # untouched cells' files are BYTE-IDENTICAL: same inode, same mtime
    assert _cell_stat(root, "list_id=0") == untouched
    # visible rows invariant
    assert _visible(spark, root) == before
    # the rewritten cell collapsed to one file and its fragments count 1
    assert io_sinks.cell_fragment_counts(root, "postings")["list_id=2"] == 1
    # cell 1 still gets its rows from the live segment branch
    assert (10, 1) in _visible(spark, root)

    # a second pass folds cell 1 too; markers must PRESERVE s1/s2 for
    # cell 2 (their segment dirs are still on disk)
    victims = io_sinks.compact_cells_incremental(
        spark, root, "postings", max_fragments=1
    )
    assert victims == ["list_id=1"]
    assert _visible(spark, root) == before


def test_incremental_compact_heals_mid_cell_crash(spark, tmp_path):
    root = str(tmp_path / "idx")
    _toy_frame(spark, root, {0: [1], 1: [2]})
    _toy_segment(spark, root, "s1", {1: [10]})
    before = _visible(spark, root)
    with pytest.raises(InterruptedCompaction):
        io_sinks.compact_cells_incremental(
            spark,
            root,
            "postings",
            max_fragments=1,
            fail_after_first_rename_of="list_id=1",
        )
    # crash state: live cell absent, .pre intact, stage invisible
    assert not os.path.exists(f"{root}/postings/list_id=1")
    # reader-side restore-only heal
    assert io_sinks.heal_missing_cells(f"{root}/postings") == 1
    assert _visible(spark, root) == before
    # writer-side heal + retry completes
    victims = io_sinks.compact_cells_incremental(
        spark, root, "postings", max_fragments=1
    )
    assert victims == ["list_id=1"]
    assert _visible(spark, root) == before


def test_full_compact_after_partial_absorb_no_double_count(spark, tmp_path):
    """A segment partially absorbed per-cell then fully absorbed by the
    full compactor is counted exactly once at every stage."""
    root = str(tmp_path / "idx")
    _toy_frame(spark, root, {0: [1], 1: [2, 3]})
    _toy_segment(spark, root, "s1", {0: [10], 1: [11]})
    before = _visible(spark, root)
    io_sinks.compact_cells_incremental(spark, root, "postings", max_fragments=1)
    assert _visible(spark, root) == before
    # the segment is partially absorbed -> NOT purgeable at frame level
    assert os.path.isdir(f"{root}/seg_s1")
    df = io_sinks.read_with_segments(spark, root, "postings")
    assert df.count() == len(before)  # multiset check: no duplicates
    # pinned read over the captured tokens sees the same multiset
    tokens = [t for t, _ in io_sinks.committed_segments(root, "postings")]
    pinned = io_sinks.read_segments_pinned(spark, root, "postings", tokens)
    assert {(r.neighbor_id, r.list_id) for r in pinned.collect()} == before


def test_pinned_read_ignores_late_segment(spark, tmp_path):
    root = str(tmp_path / "idx")
    _toy_frame(spark, root, {0: [1]})
    _toy_segment(spark, root, "s1", {0: [10]})
    tokens = [t for t, _ in io_sinks.committed_segments(root, "postings")]
    # a segment committed AFTER the capture must not be read
    _toy_segment(spark, root, "s2", {0: [20]})
    rows = {
        r.neighbor_id
        for r in io_sinks.read_segments_pinned(
            spark, root, "postings", tokens
        ).collect()
    }
    assert rows == {1, 10}
    # but the plain reader sees it
    assert {r.neighbor_id for r in io_sinks.read_with_segments(
        spark, root, "postings").collect()} == {1, 10, 20}


def test_purge_stale_stage_dirs(spark, tmp_path):
    root = str(tmp_path / "idx")
    _toy_frame(spark, root, {0: [1]})
    _toy_segment(spark, root, "zombie", {0: [9]}, commit=False)
    assert os.path.isdir(io_sinks.stage_segment_dir(root, "zombie"))
    assert io_sinks.purge_stale_stage_dirs(root) == 1
    assert not os.path.isdir(io_sinks.stage_segment_dir(root, "zombie"))
    assert io_sinks.purge_stale_stage_dirs(root) == 0


def test_concurrent_appenders_threads(spark, sf_dir, tmp_path):
    """TRUE thread-level concurrency (VERDICT r11 item 4): two writers
    stage and commit their segments from concurrent threads; the final
    index must answer exactly like base + A + B appended serially.
    Stage-token uniqueness means no shared file is ever written — the
    race cannot corrupt, only order the two (atomic) commits."""
    from gmall_flink_20_spark import scratch
    from gmall_flink_20_spark.queries import _ivf_base90_index, _ivf_base90_split

    emb, _, delta = _ivf_base90_split(spark, sf_dir)
    path = scratch.fresh_copy(_ivf_base90_index(spark, sf_dir), "ivf_thr_")
    halves = [
        delta.filter(F.pmod(F.col("vec_id"), F.lit(2)) == j) for j in range(2)
    ]
    errs: list[Exception] = []

    def writer(j: int) -> None:
        try:
            ann.ivf_index_append_atomic(halves[j], path, token=f"t{j}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(j,)) for j in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_persisted_topk(
            spark, path, emb, list(range(10)), 5, nprobe=4
        ).collect()
    }
    serial = scratch.fresh_copy(_ivf_base90_index(spark, sf_dir), "ivf_ser_")
    ann.ivf_index_append(delta, serial)
    exp = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_persisted_topk(
            spark, serial, emb, list(range(10)), 5, nprobe=4
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_ivf_incremental_leaves_cold_cells_untouched(spark, sf_dir, tmp_path):
    """The entry-level form of the byte-identical guarantee: an atomic
    append of ONE vector fragments exactly one cell; the partial merge
    rewrites that cell only and every other cell keeps its original
    file inodes/mtimes."""
    from gmall_flink_20_spark import scratch
    from gmall_flink_20_spark.queries import _ivf_base90_index, _ivf_base90_split

    emb, _, delta = _ivf_base90_split(spark, sf_dir)
    path = scratch.fresh_copy(_ivf_base90_index(spark, sf_dir), "ivf_cold_")
    before = {
        cell: _cell_stat(path, cell)
        for cell in os.listdir(f"{path}/postings")
        if cell.startswith("list_id=")
    }
    one = delta.orderBy("vec_id").limit(1)
    ann.ivf_index_append_atomic(one, path, token="b0")
    victims = set(
        ann.ivf_index_compact_incremental(spark, path, max_fragments=1)
    )
    assert len(victims) == 1, victims
    cold = set(before) - victims
    assert len(cold) == len(before) - (1 if victims <= set(before) else 0)
    for cell in cold:
        assert _cell_stat(path, cell) == before[cell], f"{cell} was rewritten"
    # and the merged cell serves the appended vector from the base now
    vid = one.first()["vec_id"]
    # the segment's only cell is absorbed: reader must NOT double-count
    post = io_sinks.read_with_segments(spark, path, "postings")
    assert post.filter(F.col("neighbor_id") == vid).count() == 1


def test_lsh_incremental_leaves_shingles_untouched(spark, sf_dir, tmp_path):
    """The LSH partial merge folds segment BANDS only: the shingles
    frame's files must stay byte-identical (inode/mtime), while the
    query still sees the appended shingles through the segment-aware
    reader (proven by the oracle gate; here we pin the file facts)."""
    from gmall_flink_20_spark import scratch
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators import sampling
    from gmall_flink_20_spark.queries import _lsh_base_index

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(sampling.sample_hash("doc_id", "incr"), F.lit(4))
    path = scratch.fresh_copy(_lsh_base_index(spark, sf_dir, (2, 3)), "lsh_cold_")
    sh_dir = f"{path}/shingles"
    before = sorted(
        (fn, os.stat(os.path.join(sh_dir, fn)).st_ino)
        for fn in os.listdir(sh_dir)
        if fn.endswith(".parquet")
    )
    s1 = docs.filter(shard == 1)
    dedup.lsh_index_append_atomic(s1, path, token="a0")
    victims = dedup.lsh_index_compact_incremental(spark, path, max_fragments=1)
    assert victims == [f"band_id={b}" for b in range(4)]
    after = sorted(
        (fn, os.stat(os.path.join(sh_dir, fn)).st_ino)
        for fn in os.listdir(sh_dir)
        if fn.endswith(".parquet")
    )
    assert after == before
    # the segment still carries the shingles (partially absorbed)
    assert os.path.isdir(f"{path}/seg_a0/shingles")


def test_pq_streaming_kill_resume(spark, sf_dir, tmp_path):
    """Checkpointed restart mid-ingest for the COMPRESSED index
    (VERDICT r11 item 5): half the delta lands, the run ends, the rest
    arrives, a second run resumes from the checkpoint — the grown PQ
    index must answer exactly like the one-shot batch append, with
    dedup_postings collapsing any at-least-once re-encode."""
    import shutil
    import uuid

    from gmall_flink_20_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mx = emb.agg(F.max("vec_id")).first()[0]
    cut = (9 * (int(mx) + 1)) // 10
    base = emb.filter(F.col("vec_id") < cut)
    delta = (
        emb.filter(F.col("vec_id") >= cut)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )
    rows = delta.collect()
    half = len(rows) // 2
    schema = delta.schema

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "index")
    ann.ivf_pq_index_write(base, idx)

    def write_chunk(df, j, mtime):
        tmp = tmp_path / f"tmp_{uuid.uuid4().hex[:6]}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dst = src / f"{j:05d}.parquet"
            shutil.copy(f, dst)
            os.utime(dst, (mtime, mtime))
        shutil.rmtree(tmp)

    def handle(batch, epoch_id):
        b = batch.persist()
        try:
            if b.count() == 0:
                return
            ann.ivf_pq_index_append(b, idx)
        finally:
            b.unpersist()

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_chunk(spark.createDataFrame(rows[:half], schema), 0, 1_000_000_000)
    run_once()  # "crash" after the first half is ingested
    write_chunk(spark.createDataFrame(rows[half:], schema), 1, 1_000_000_001)
    run_once()  # resume from checkpoint: only the new chunk replays

    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_pq_persisted_topk(
            spark, idx, emb, list(range(10)), 5, nprobe=4,
            dedup_postings=True,
        ).collect()
    }
    oneshot = str(tmp_path / "oneshot")
    ann.ivf_pq_index_write(base, oneshot)
    ann.ivf_pq_index_append(emb.filter(F.col("vec_id") >= cut), oneshot)
    exp = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_ivf_pq_persisted_topk(
            spark, oneshot, emb, list(range(10)), 5, nprobe=4
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_gram_kernel_tokens_match_jvm(spark):
    """The Python kernel's tokenizer (re.split(r'\\s+', re.ASCII) over
    the space-stripped text) must produce the SAME gram sets as Spark's
    split(trim(text), '\\s+') — including the leading-empty-token edge
    when text begins with non-space whitespace, and short/empty docs.
    Pinned by comparing per-source distinct-gram counts between the
    bitmask path and a direct JVM construction."""
    from pyspark.sql import functions as F
    from gmall_flink_20_spark.operators import text as T

    rows = [
        ("a", "w1 w2 w3 w4 w5 w6 w1 w2 w3 w4 w5 w6"),
        ("a", "\tw0 w1 w2 w3 w4"),          # leading tab -> empty first token
        ("b", "w1 w2 w3 w4 w5"),
        ("b", "  short doc  "),              # < n tokens
        ("b", ""),                           # empty
        ("c", "x1  x2\tx3\nx4 x5 x6"),      # mixed whitespace runs
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.source_a, r.source_b, r.grams_a, r.shared)
        for r in T.cross_source_contamination(df, n=5).collect()
    }
    # JVM reference: string grams via the pre-round-12 construction
    toks = F.split(F.trim(F.col("text")), r"\s+")
    width = F.greatest(F.size(toks) - 4, F.lit(0))
    shifted = [F.slice(toks, i + 1, width) for i in range(5)]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    g = df.select(
        F.col("source").alias("_src"), F.explode(grams).alias("_gram")
    ).distinct()
    marg = {r._src: r.c for r in g.groupBy("_src").agg(F.count(F.lit(1)).alias("c")).collect()}
    sh = {
        (r.sa, r.sb): r.c
        for r in g.alias("a")
        .join(g.alias("b"), F.col("a._gram") == F.col("b._gram"))
        .filter(F.col("a._src") != F.col("b._src"))
        .groupBy(F.col("a._src").alias("sa"), F.col("b._src").alias("sb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    exp = {
        (a, b, marg[a], sh.get((a, b), 0))
        for a in marg
        for b in marg
        if a != b
    }
    assert got == exp


def test_contamination_pairwise_fallback_matches_bitmask(spark, sf_dir):
    """>62-source corpora take the self-join path — it must agree with
    the bitmask path row for row (same kernels, different reduction)."""
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = {
        tuple(r)
        for r in T.cross_source_contamination(docs).collect()
    }
    b = {
        tuple(r)
        for r in T.cross_source_contamination(docs, force_pairwise=True).collect()
    }
    assert a == b and len(a) > 0


def test_source_minima_kernel_matches_jvm_expression(spark, sf_dir):
    """The Arrow partial-minima kernel must reproduce the former JVM
    md5/conv/mod expression path bit for bit (same base hashes, same
    permutation arithmetic)."""
    from pyspark.sql import functions as F
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.operators import dedup as D
    from gmall_flink_20_spark.operators.dedup import (
        MINHASH_P,
        minhash_perm_consts,
        shingle_rows_from_text,
    )

    docs = load_table(spark, sf_dir, "documents").limit(300)
    got = {
        (r.source_a, r.source_b, r.sig_matches, r.est_jaccard)
        for r in D.source_minhash_sim(docs).collect()
    }
    # former JVM construction
    rows = shingle_rows_from_text(docs, 3, "text", id_col="source")
    base = rows.select(
        F.col("source"),
        F.expr(
            f"CAST(conv(substr(md5(shingle), 1, 15), 16, 10) AS BIGINT) % {MINHASH_P}"
        ).alias("b0"),
    )
    consts = minhash_perm_consts(64)
    hc = [
        ((F.lit(a) * F.col("b0") + F.lit(c)) % MINHASH_P).alias(f"h{s}")
        for s, (a, c) in enumerate(consts)
    ]
    sig = (
        base.select(F.col("source"), *hc)
        .groupBy("source")
        .agg(*[F.min(f"h{s}").alias(f"m{s}") for s in range(64)])
        .select(
            F.col("source"),
            F.array(*[F.col(f"m{s}") for s in range(64)]).alias("sig"),
        )
    )
    a_ = sig.select(F.col("source").alias("source_a"), F.col("sig").alias("sig_a"))
    b_ = sig.select(F.col("source").alias("source_b"), F.col("sig").alias("sig_b"))
    matches = F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
    exp = {
        (r.source_a, r.source_b, r.sig_matches, r.est_jaccard)
        for r in a_.join(b_, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            matches.cast("long").alias("sig_matches"),
            F.round(matches.cast("double") / 64.0, 6).alias("est_jaccard"),
        )
        .collect()
    }
    assert got == exp and len(got) > 0


def test_jpeg_color_tier_roundtrip_is_bit_exact():
    import numpy as np

    from gmall_flink_20_spark.operators import multimodal as mm

    for mid in (1, 3, 7, 101, 9999):
        Y = mm._jpeg_tier_pixels(mid).astype(np.int64)
        cb, cr = mm._jpeg_tier_chroma(mid)
        w, h, nc, cs, cq = mm._jpeg_decode(mm._jpeg_encode(mid))
        assert (w, h, nc) == (16, 16, 3)
        assert cs == int(Y.sum() + cb.sum() + cr.sum())
        assert cq == int((Y * Y).sum() + (cb * cb).sum() + (cr * cr).sum())
    # gray decoder rejects color payloads
    with pytest.raises(ValueError):
        mm._jpeg_decode_gray(mm._jpeg_encode(1))
    # generic color round-trip at quant=1 on arbitrary planes stays
    # within the double-rounding envelope
    rng = np.random.RandomState(3)
    y = rng.randint(0, 256, (16, 32)).astype(np.int64)
    cb = rng.randint(0, 256, (8, 16)).astype(np.int64)
    cr = rng.randint(0, 256, (8, 16)).astype(np.int64)
    w, h, nc, cs, _ = mm._jpeg_decode(mm._jpeg_encode_ycc420(y, cb, cr))
    assert (w, h, nc) == (32, 16, 3)
    exact = int(y.sum() + cb.sum() + cr.sum())
    assert abs(cs - exact) <= (y.size + cb.size + cr.size) * 3
    # wrong sampling factors are rejected loudly
    bad = mm._jpeg_encode_ycc420(y, cb, cr).replace(
        bytes([1, 0x22, 0]), bytes([1, 0x21, 0]), 1
    )
    with pytest.raises(ValueError):
        mm._jpeg_decode(bad)


def _session_stream(spark, first_rows, *late_batches, delay):
    """first_rows as one micro-batch, each late batch as its own
    micro-batch, then the final session result of
    streaming_session_count(gap=1800) in append mode."""
    from datetime import datetime, timezone

    from gmall_flink_20_spark.streaming import replay
    from gmall_flink_20_spark.streaming import windows as swindows

    schema = "user_id long, ts timestamp"
    df1 = spark.createDataFrame(first_rows, schema)
    extras = [spark.createDataFrame(rows, schema) for rows in late_batches]
    sentinel = spark.createDataFrame(
        [(99, datetime.fromtimestamp(10_000_000, tz=timezone.utc).replace(tzinfo=None))],
        schema,
    )
    stream = replay.replay_stream(
        spark, df1, "ts", num_chunks=1, extra_chunks=extras + [sentinel]
    )
    out = swindows.streaming_session_count(stream, "ts", delay, 1800, "user_id")
    return {
        (r.user_id, r.session_start_s, r.session_end_s, r.n_events)
        for r in replay.run_to_completion(out)
        .select("user_id", "session_start_s", "session_end_s", "n_events")
        .filter(F.col("user_id") != 99)
        .collect()
    }


def test_session_late_event_merges_within_watermark(spark, tmp_path):
    """VERDICT r11 item 6, merge side: an event inside the gap that
    arrives a micro-batch LATE (±5 min disorder) while the watermark has
    not passed the session close must merge — extending the session
    exactly as the batch gaps-and-islands rule does."""
    from datetime import datetime, timezone

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    # user 1: event at 1000; user 2 at 3000 advances the watermark to
    # 3000 - 1800 = 1200 < close(2800) -> session still open
    first = [(1, t(1000)), (2, t(3000))]
    late = [(1, t(1300))]  # 5+ min disorder, still inside the gap
    got = _session_stream(spark, first, late, delay="30 minutes")
    assert (1, 1000, 3100, 2) in got, got  # merged: close = 1300 + 1800


def test_session_late_event_beyond_watermark_drops(spark, tmp_path):
    """VERDICT r11 item 6, drop side: once the watermark passed the
    session close the session is emitted and a later in-gap event is
    DROPPED (allowedLateness(0) semantics) — never re-fired. The
    emitted single-event session must stand unchanged."""
    from datetime import datetime, timezone

    t = lambda s: datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)  # noqa: E731
    # user 2 at 9000 advances the watermark to 9000 - 1800 = 7200 >
    # close(2800); the mid batch runs an eviction pass under that
    # watermark, EMITTING user 1's session as [1000, 2800) n=1 (Spark
    # evicts with the end-of-previous-batch watermark, so the emission
    # needs a batch AFTER the one that advanced it)
    first = [(1, t(1000)), (2, t(9000))]
    mid = [(3, t(9100))]
    late = [(1, t(1300))]  # would have merged in batch; now beyond wm
    got = _session_stream(spark, first, mid, late, delay="30 minutes")
    assert (1, 1000, 2800, 1) in got, got
    # the late event is DROPPED outright: no merge, no second session
    assert [x for x in got if x[0] == 1] == [(1, 1000, 2800, 1)], got


def test_opq_streaming_kill_resume(spark, sf_dir, tmp_path):
    """Checkpointed restart mid-ingest for the OPQ index: the grown
    codes frame must answer exactly like the one-shot batch append,
    dedup_codes collapsing any at-least-once re-encode."""
    import shutil
    import uuid

    from gmall_flink_20_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mx = emb.agg(F.max("vec_id")).first()[0]
    cut = (9 * (int(mx) + 1)) // 10
    base = emb.filter(F.col("vec_id") < cut)
    delta = (
        emb.filter(F.col("vec_id") >= cut)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )
    rows = delta.collect()
    half = len(rows) // 2
    schema = delta.schema

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "index")
    ann.opq_index_write(base, idx)

    def write_chunk(df, j, mtime):
        tmp = tmp_path / f"tmp_{uuid.uuid4().hex[:6]}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        for f in tmp.glob("*.parquet"):
            dst = src / f"{j:05d}.parquet"
            shutil.copy(f, dst)
            os.utime(dst, (mtime, mtime))
        shutil.rmtree(tmp)

    def handle(batch, epoch_id):
        b = batch.persist()
        try:
            if b.count() == 0:
                return
            ann.opq_index_append(b, idx)
        finally:
            b.unpersist()

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_chunk(spark.createDataFrame(rows[:half], schema), 0, 1_000_000_000)
    run_once()
    write_chunk(spark.createDataFrame(rows[half:], schema), 1, 1_000_000_001)
    run_once()

    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_opq_persisted_topk(
            spark, idx, emb, list(range(10)), 5, dedup_codes=True
        ).collect()
    }
    oneshot = str(tmp_path / "oneshot")
    ann.opq_index_write(base, oneshot)
    ann.opq_index_append(emb.filter(F.col("vec_id") >= cut), oneshot)
    exp = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_opq_persisted_topk(
            spark, oneshot, emb, list(range(10)), 5
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_opq_atomic_append_invisible_until_commit(spark, sf_dir, tmp_path):
    from gmall_flink_20_spark import io_sinks
    from gmall_flink_20_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 9)
    delta = emb.filter(F.col("vec_id") % 10 == 9)
    idx = str(tmp_path / "opq")
    ann.opq_index_write(base, idx)

    def q():
        return {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ann.ann_opq_persisted_topk(
                spark, idx, emb, list(range(10)), 5
            ).collect()
        }

    pre = q()
    ann.opq_index_append_atomic(delta, idx, token="t1", commit=False)
    assert q() == pre  # staged: invisible
    io_sinks.commit_segment(idx, "t1")
    post = q()
    idx2 = str(tmp_path / "opq2")
    ann.opq_index_write(base, idx2)
    ann.opq_index_append(delta, idx2)
    exp = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann.ann_opq_persisted_topk(
            spark, idx2, emb, list(range(10)), 5
        ).collect()
    }
    assert post == exp


def test_progressive_jpeg_equals_sequential_bit_for_bit():
    """The progressive encoder carries the SAME quantized coefficients
    as the sequential one, and successive approximation (DC arithmetic-
    shift + refine, AC toward-zero + G.1.2.3 refine) reconstructs them
    exactly — so decoded pixels must be IDENTICAL, not just close."""
    import numpy as np

    from gmall_flink_20_spark.operators import multimodal as mm

    rng = np.random.RandomState(11)
    for shape in ((8, 8), (16, 24), (32, 16)):
        img = rng.randint(0, 256, shape).astype(np.int64)
        seq = mm._jpeg_decode(mm._jpeg_encode_gray(img))
        pro = mm._jpeg_decode(mm._jpeg_encode_progressive([img], [(1, 1)]))
        assert seq == pro
    # 4:2:0 color, tier and random planes
    for mid in (1, 7, 101):
        Y = mm._jpeg_tier_pixels(mid).astype(np.int64)
        cb, cr = mm._jpeg_tier_chroma(mid)
        seq = mm._jpeg_decode(mm._jpeg_encode_ycc420(Y, cb, cr))
        pro = mm._jpeg_decode(
            mm._jpeg_encode_progressive([Y, cb, cr], [(2, 2), (1, 1), (1, 1)])
        )
        assert seq == pro
    # a non-unit quant table exercises dequant through the multi-scan path
    q = np.full((8, 8), 4, dtype=np.int64)
    q[0, 0] = 1
    img = rng.randint(0, 256, (24, 32)).astype(np.int64)
    assert mm._jpeg_decode(mm._jpeg_encode_gray(img, quant=q)) == mm._jpeg_decode(
        mm._jpeg_encode_progressive([img], [(1, 1)], quant=q)
    )


def test_progressive_jpeg_eobrun_and_tier_exactness():
    import numpy as np

    from gmall_flink_20_spark.operators import multimodal as mm

    # flat image => multi-block EOB runs (EOBn with extension bits)
    flat = np.full((64, 64), 77, dtype=np.int64)
    pro = mm._jpeg_encode_progressive([flat], [(1, 1)])
    # the stream must actually contain an EOBn symbol run: decoded OK
    # and much smaller than per-block EOBs would make it
    assert mm._jpeg_decode(pro) == mm._jpeg_decode(mm._jpeg_encode_gray(flat))
    # tier payloads round-trip exactly through the registry kernel
    for mid in (0, 3, 16, 101):
        P = mm._jpeg_tier_pixels(mid).astype(np.int64)
        w, h, nc, cs, cq = mm._jpeg_decode(mm._jpeg_encode_prog(mid))
        assert (w, h) == (16, 16)
        if mid % 2 == 0:
            assert nc == 1 and cs == int(P.sum()) and cq == int((P * P).sum())
        else:
            cb, cr = mm._jpeg_tier_chroma(mid)
            assert nc == 3
            assert cs == int(P.sum() + cb.sum() + cr.sum())
            assert cq == int((P * P).sum() + (cb * cb).sum() + (cr * cr).sum())
    # still rejected loudly: arithmetic/hierarchical SOFs
    bad = mm._jpeg_encode_prog(0).replace(b"\xff\xc2", b"\xff\xca", 1)
    with pytest.raises(ValueError):
        mm._jpeg_decode(bad)


def test_mp4_demux_walks_real_sample_tables():
    """The box parser must reproduce every sample byte via the real
    stsc/stco/stsz arithmetic (two chunk runs, variable sizes) and
    reject non-MP4 / multi-description payloads loudly."""
    from gmall_flink_20_spark.operators import multimodal as mm

    for mid in (0, 1, 5, 13, 101, 9999):
        n, sizes = mm._mp4_sample_geometry(mid)
        codec, w, h, ts, dur, samples = mm._mp4_demux(mm._mp4_encode(mid))
        assert (codec, w, h, ts) == ("v0de", 32, 24, 600)
        assert dur == n * 512 and [len(s) for s in samples] == sizes
        assert samples == [
            bytes((mid + 11 * i + j) % 256 for j in range(sizes[i]))
            for i in range(n)
        ]
    with pytest.raises(ValueError):
        mm._mp4_demux(b"\x00\x00\x00\x08free")
    # corrupting a chunk offset must fail loudly, not return short reads
    # (stco layout: 'stco' + version/flags(4) + count(4) + offsets —
    # first offset at type+12)
    good = mm._mp4_encode(5)
    stco_at = good.find(b"stco")
    bad = bytearray(good)
    bad[stco_at + 12 : stco_at + 16] = (10_000_000).to_bytes(4, "big")
    with pytest.raises(ValueError):
        mm._mp4_demux(bytes(bad))


def test_ivf_full_compact_purges_stale_stage(spark, sf_dir, tmp_path):
    from gmall_flink_20_spark import scratch
    from gmall_flink_20_spark.io import load_table
    from gmall_flink_20_spark.queries import _ivf_base90_index, _ivf_base90_split

    _, _, delta = _ivf_base90_split(spark, sf_dir)
    path = scratch.fresh_copy(_ivf_base90_index(spark, sf_dir), "ivf_stale_")
    ann.ivf_index_append_atomic(delta, path, token="dead", commit=False)
    assert os.path.isdir(io_sinks.stage_segment_dir(path, "dead"))
    ann.ivf_index_compact(spark, path)
    assert not os.path.isdir(io_sinks.stage_segment_dir(path, "dead"))
