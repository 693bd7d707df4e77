"""Operator-family unit tests on tiny hand-written frames replicating the
reference fixture semantics (SURVEY.md §5: LoginLog/OrderLog/ReceiptLog
shapes)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gmall_flink_20_spark.operators import blacklist, dedup, joins, patterns, similarity, text, topn


def ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


# ------------------------------------------------------------------ top-n


def test_top_n_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 3), (1, 12, 5), (2, 10, 1)],
        "window_end_s long, item_id long, cnt long",
    )
    out = topn.top_n_per_key(df, ["window_end_s"], "cnt", 2, tiebreak=["item_id"]).collect()
    w1 = [(r.item_id, r.rn) for r in out if r.window_end_s == 1]
    assert w1 == [(12, 1), (10, 2)]  # count desc, then item asc


# ------------------------------------------------------------ interval join


def test_interval_join_bounds_inclusive(spark):
    # reference: between(Time.seconds(-3), Time.seconds(5)) is inclusive
    # (PayReceiptWithJoinApp.java:50-57)
    pays = spark.createDataFrame([Row(key=1, pay_ts_s=100)])
    recs = spark.createDataFrame(
        [Row(key=1, receipt_ts_s=96), Row(key=1, receipt_ts_s=97), Row(key=1, receipt_ts_s=105), Row(key=1, receipt_ts_s=106)]
    )
    out = joins.interval_join(pays, recs, "key", "pay_ts_s", "receipt_ts_s", -3, 5)
    got = sorted(r["receipt_ts_s"] for r in out.collect())
    assert got == [97, 105]


def test_reconcile_categories(spark):
    pays = spark.createDataFrame([Row(key=1, pay_ts_s=100), Row(key=2, pay_ts_s=100)])
    recs = spark.createDataFrame([Row(key=1, receipt_ts_s=102), Row(key=3, receipt_ts_s=100)])
    out = joins.reconcile_full_outer(pays, recs, "key", "pay_ts_s", "receipt_ts_s", -5, 5)
    cats = sorted(r.category for r in out.collect())
    assert cats == ["left_only", "matched", "right_only"]


# ------------------------------------------------------------ CEP patterns


def test_consecutive_pairs_strict_adjacency(spark):
    # an intervening success breaks strict contiguity (CEP .next semantics,
    # LoginFailwithStateCEP.java:48-65)
    rows = [
        Row(user_id=1, event_id=1, ts=ts(10), event_type="error"),
        Row(user_id=1, event_id=2, ts=ts(11), event_type="success"),
        Row(user_id=1, event_id=3, ts=ts(12), event_type="error"),
        Row(user_id=2, event_id=4, ts=ts(20), event_type="error"),
        Row(user_id=2, event_id=5, ts=ts(21), event_type="error"),
        Row(user_id=3, event_id=6, ts=ts(30), event_type="error"),
        Row(user_id=3, event_id=7, ts=ts(3000), event_type="error"),  # gap > 2s
    ]
    out = patterns.consecutive_event_pairs(
        spark.createDataFrame(rows), "user_id", "ts", "event_type", "error", 2, "event_id"
    ).collect()
    assert [(r.user_id, r.first_fail_s, r.last_fail_s) for r in out] == [(2, 20, 21)]


def test_events_within_horizon(spark):
    rows = [
        Row(user_id=1, event_id=1, ts=ts(0), event_type="error"),
        Row(user_id=1, event_id=2, ts=ts(1), event_type="error"),
        Row(user_id=1, event_id=3, ts=ts(2), event_type="error"),
        Row(user_id=2, event_id=4, ts=ts(0), event_type="error"),
        Row(user_id=2, event_id=5, ts=ts(10), event_type="error"),  # outside horizon
    ]
    out = patterns.events_within_horizon(
        spark.createDataFrame(rows), "user_id", "ts", "event_type", "error", 3, 2
    ).collect()
    got = {(r.user_id, r.anchor_s): r.fail_cnt for r in out}
    # user 1: anchor 0 sees {0,1,2}=3, anchor 1 sees {1,2}=2; anchor 2 sees only itself
    assert got == {(1, 0): 3, (1, 1): 2}


def test_match_or_timeout_boundaries(spark):
    rows = [
        Row(user_id=1, event_id=1, ts=ts(0), event_type="view"),
        Row(user_id=1, event_id=2, ts=ts(900), event_type="purchase"),  # exactly horizon
        Row(user_id=2, event_id=3, ts=ts(0), event_type="view"),
        Row(user_id=2, event_id=4, ts=ts(901), event_type="purchase"),  # past horizon
        Row(user_id=3, event_id=5, ts=ts(0), event_type="view"),
        Row(user_id=3, event_id=6, ts=ts(0), event_type="purchase"),  # same ts ≠ after
    ]
    out = patterns.match_or_timeout(
        spark.createDataFrame(rows), "user_id", "ts", "event_type", "view", "purchase", 900, "event_id"
    ).collect()
    got = {r.create_id: r.status for r in out}
    assert got == {1: "payed", 3: "timeout", 5: "timeout"}


# ---------------------------------------------------------------- blacklist


def test_daily_threshold_resets_at_midnight(spark):
    day1 = 1704067200  # 2024-01-01 00:00:00 UTC
    rows = [Row(user_id=1, event_id=i, ts=ts(day1 + i)) for i in range(5)]
    rows += [Row(user_id=1, event_id=100 + i, ts=ts(day1 + 86400 + i)) for i in range(2)]
    kept, warn = blacklist.daily_threshold_split(
        spark.createDataFrame(rows), ["user_id"], "ts", 3, "event_id"
    )
    assert kept.count() == 3 + 2  # day-1 capped at 3, day-2 under budget
    w = warn.collect()
    assert [(r.user_id, r.day_str) for r in w] == [(1, "2024-01-01")]


# ------------------------------------------------------------------- dedup


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words in this sentence about spark engines ok"
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    sh = dedup.shingles(docs, n=3)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sig, bands=8, rows_per_band=2).collect()
    assert (0, 1) in {(r.doc_a, r.doc_b) for r in pairs}
    verified = dedup.jaccard_verify(
        spark.createDataFrame([(0, 1), (0, 2)], "doc_a long, doc_b long"), sh, threshold=0.5
    ).collect()
    assert [(r.doc_a, r.doc_b) for r in verified] == [(0, 1)]
    j = verified[0]
    assert j.inter_sz < j.union_sz and 0.5 <= j.jaccard < 1.0


def test_dedup_exact_groups(spark):
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb")], "doc_id long, text string"
    )
    out = {r.keep_id: r.group_size for r in dedup.dedup_exact(docs).collect()}
    assert out == {1: 2, 3: 1}


# ------------------------------------------------------------------- text


def test_text_features(spark):
    docs = spark.createDataFrame([(1, "the cat and  the dog")], "doc_id long, text string")
    q = text.quality_score(docs).collect()[0]
    assert q.n_tokens == 5 and q.n_stopwords == 3
    t = text.token_count(docs).collect()[0]
    assert t.n_tokens == 5
    lang = text.lang_id(docs).collect()[0]
    assert lang.lang_guess == "en"
    fp = text.fingerprint(docs).collect()[0]
    # whitespace-normalized: double space collapses
    import hashlib

    assert fp.fp == hashlib.md5(b"the cat and the dog").hexdigest()


# -------------------------------------------------------------- similarity


def test_ann_bruteforce_exact_neighbors(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ann_bruteforce_topk(emb, [0], 2).collect()
    assert [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [(1, 1), (3, 2)]


def test_windowed_count_rollup_equals_direct(spark):
    from gmall_flink_20_spark.io import load_events
    from gmall_flink_20_spark.operators import windows as W

    clicks = load_events(spark, "/root/testdata/sf0.001").filter(
        "event_type = 'click'"
    ).select("user_id", "ts")
    direct = W.windowed_count(clicks, "ts", "1 hour", "10 minutes", "user_id")
    rollup = W.windowed_count_rollup(clicks, "ts", 3600, 600, "user_id")
    d = sorted(map(tuple, direct.select("window_end_s", "user_id", "cnt").collect()))
    r = sorted(map(tuple, rollup.select("window_end_s", "user_id", "cnt").collect()))
    assert d == r
