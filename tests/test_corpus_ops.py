"""Unit tests: decontamination, sequence packing, collocations,
vocabulary, event-rate anomaly — planted-fixture semantics checks
(the DuckDB parity gate covers the full-table values)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gmall_flink_20_spark.operators import curation, packing, text
from gmall_flink_20_spark.operators.analytics import rate_anomaly


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "quick brown fox jumps over"
            (1, "prefix words quick brown fox jumps over suffix"),
            (2, "completely unrelated text with no shared grams at all"),
            (3, "short doc"),  # under 5 tokens → can't be contaminated
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.decontaminate(corpus, bench, n=5).collect()}
    assert set(out) == {1, 2, 3}  # every corpus doc gets a row
    assert out[1].contaminated and out[1].n_contaminated_grams >= 1
    assert not out[2].contaminated and out[2].n_contaminated_grams == 0
    assert not out[3].contaminated


def test_pack_sequences_manual(spark):
    # one shard, seq_len 10: docs of 4, 8, 10, 3 tokens
    docs = spark.createDataFrame(
        [
            (1, "web", "a b c d"),
            (2, "web", "a b c d e f g h"),
            (3, "web", "a b c d e f g h i j"),
            (4, "web", "a b c"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r.doc_id: r
        for r in packing.pack_sequences(docs, seq_len=10, shard_col="source").collect()
    }
    # offsets: doc1 [0,4) doc2 [4,12) doc3 [12,22) doc4 [22,25)
    assert (out[1].tok_start, out[1].seq_first, out[1].seq_last) == (0, 0, 0)
    assert (out[2].tok_start, out[2].seq_first, out[2].seq_last) == (4, 0, 1)
    assert (out[3].tok_start, out[3].seq_first, out[3].seq_last) == (12, 1, 2)
    assert (out[4].tok_start, out[4].seq_first, out[4].seq_last) == (22, 2, 2)


def test_pack_sequences_shards_independent(spark):
    docs = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "x y z"), (3, "a", "x")],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r for r in packing.pack_sequences(docs, seq_len=4).collect()}
    assert out[2].tok_start == 0  # shard b starts at its own offset 0
    assert out[1].tok_start == 0 and out[3].tok_start == 2


def test_collocations_planted_pair(spark):
    rows = [(i, "alpha beta filler%d" % i) for i in range(6)]
    rows += [(100 + i, "gamma delta") for i in range(6)]
    # alpha/beta also occur OUTSIDE their pair → lower PMI than gamma/delta
    rows += [(200, "alpha solo"), (201, "solo beta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.collocations_topk(docs, k=10, min_count=5)
    got = {(r.w1, r.w2): r for r in out.collect()}
    assert ("alpha", "beta") in got and ("gamma", "delta") in got
    ab, gd = got[("alpha", "beta")], got[("gamma", "delta")]
    assert ab.c12 == 6 and gd.c12 == 6
    assert (ab.c1, ab.c2, gd.c1, gd.c2) == (7, 7, 6, 6)
    assert gd.pmi > ab.pmi
    # pmi value is the documented formula
    n_tok = sum(len(t.split()) for _, t in rows)
    n_pair = sum(len(t.split()) - 1 for _, t in rows)
    expect = round(math.log((6 / n_pair) / ((6 / n_tok) * (6 / n_tok))), 6)
    assert abs(gd.pmi - expect) < 1e-9


def test_vocabulary_threshold_and_ids(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa bb dd"), (3, "aa bb")],
        "doc_id long, text string",
    )
    out = text.vocabulary(docs, min_count=2).collect()
    assert [(r.term, r.cnt, r.vocab_id) for r in sorted(out, key=lambda r: r.vocab_id)] == [
        ("aa", 4, 1),
        ("bb", 3, 2),
    ]


def test_rate_anomaly_planted_spike(spark):
    # 30 hourly buckets with 10 events each, then one with 100
    rows = []
    eid = 0
    for b in range(30):
        n = 100 if b == 29 else 10
        # vary counts slightly so the trailing window isn't constant
        if b % 5 == 0 and b != 29:
            n = 12
        for _ in range(n):
            rows.append((eid, b * 3600 + 10, "click"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, sec long, event_type string").select(
        "event_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "event_type"
    )
    out = rate_anomaly(df, bucket_s=3600, trailing=24)
    got = {r.bucket_end_s: r for r in out.collect()}
    # first 24 buckets have incomplete history → absent
    assert min(got) == 25 * 3600
    spike = got[30 * 3600]
    assert spike.cnt == 100 and spike.is_anomaly and spike.zscore > 3
    # a normal bucket is not anomalous
    assert not got[26 * 3600].is_anomaly


def test_cms_counts_one_sided_and_tight_when_wide(spark):
    from gmall_flink_20_spark.operators.sketches import cms_counts

    rows = [(i % 10,) for i in range(200)]  # items 0..9, 20 each
    df = spark.createDataFrame(rows, "item_id long")
    # wide sketch: no collisions possible among 10 items spread over 512
    # buckets x 4 rows is overwhelmingly likely to give exact estimates
    wide = {r.item_id: r for r in cms_counts(df, "item_id", d=4, w=512).collect()}
    assert set(wide) == set(range(10))
    assert all(r.exact_cnt == 20 for r in wide.values())
    assert all(r.overcount >= 0 for r in wide.values())  # one-sided, always
    # tiny sketch: 10 items into 4 buckets/row MUST collide somewhere
    tiny = cms_counts(df, "item_id", d=2, w=4).collect()
    assert all(r.overcount >= 0 for r in tiny)
    assert any(r.overcount > 0 for r in tiny)
    assert all(r.est_cnt >= r.exact_cnt for r in tiny)


def test_overlap_pairs_planted_overlap(spark):
    from gmall_flink_20_spark.operators.text import overlap_pairs

    shared = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    )
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma delta epsilon"),
            (2, shared + " zeta eta theta iota kappa"),
            (3, "completely different words with no common spans here at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r.shared_fps for r in overlap_pairs(docs).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 2  # the shared prefix span
    assert not any(3 in p for p in out)


def test_corpus_stats_exact_median(spark):
    from gmall_flink_20_spark.operators.text import corpus_stats

    docs = spark.createDataFrame(
        [
            (1, "web", "en", "a"),
            (2, "web", "en", "a b b"),
            (3, "web", "en", "a b c d e"),
            (4, "web", "en", "a b c d e f g"),
        ],
        "doc_id long, source string, lang string, text string",
    )
    r = corpus_stats(docs).collect()[0]
    assert (r.n_docs, r.total_tokens) == (4, 16)
    assert r.median_tokens == 3  # rank ceil(4/2)=2 of [1,3,5,7]
    assert abs(r.mean_tokens - 4.0) < 1e-12


def test_chunk_documents_windows(spark):
    import hashlib

    from gmall_flink_20_spark.operators.packing import chunk_documents

    words = ["w%d" % i for i in range(11)]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = sorted(
        chunk_documents(docs, chunk_tokens=5, stride=4).collect(),
        key=lambda r: r.chunk_id,
    )
    # 11 tokens, stride 4 → starts 0, 4, 8 → lens 5, 5, 3
    assert [(r.chunk_id, r.chunk_len) for r in out] == [(0, 5), (1, 5), (2, 3)]
    assert out[0].chunk_md5 == hashlib.md5(" ".join(words[0:5]).encode()).hexdigest()
    assert out[2].chunk_md5 == hashlib.md5(" ".join(words[8:11]).encode()).hexdigest()
