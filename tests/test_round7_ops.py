"""Round-7 operator gates: quantization-recall ladder (SQ8 + sign-bit),
per-source KL divergence, Flesch readability, trigram path mining, and
the dyadic-decay EWMA trendline — closed-form checks on tiny frames."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from gmall_flink_20_spark.operators import analytics, similarity, text


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


# ------------------------------------------------------------- sq8 recall


def test_sq8_recall_lossless_on_grid(spark):
    # values already on the 256-level grid between per-dim min/max ->
    # dequantization reproduces them exactly -> recall 1.0
    import random

    rng = random.Random(7)
    rows = []
    for i in range(30):
        v = [rng.randrange(256) / 255.0 for _ in range(4)] + [0.5]
        rows.append((i, v))
    # pin the grid: ensure 0.0 and 1.0 appear in every varying dim
    rows[0] = (0, [0.0, 0.0, 0.0, 0.0, 0.5])
    rows[1] = (1, [1.0, 1.0, 1.0, 1.0, 0.5])
    got = similarity.sq8_recall(
        _emb(spark, rows), query_ids=[0, 1, 2], k=3, dim=5
    ).collect()[0]
    assert got.n_queries == 3 and got.n_corpus == 30
    assert got.total_hits == 9 and got.recall == 1.0


def test_sq8_constant_dimension_no_crash(spark):
    # a zero-span dimension (all values equal) must dequantize to mn,
    # not divide by zero
    rows = [(i, [float(i % 3), 7.0]) for i in range(12)]
    out = similarity.sq8_recall(_emb(spark, rows), [0, 1], k=2, dim=2).collect()
    assert out[0].n_corpus == 12


# ------------------------------------------------------- binary hamming


def test_binary_recall_sign_blocks(spark):
    # two well-separated orthants: sign bits identify the block, so the
    # hamming top-k stays inside the query's block = exact top-k block
    rows = []
    for i in range(6):
        rows.append((i, [1.0 + 0.01 * i, 1.0, -1.0, 1.0]))
    for i in range(6, 12):
        rows.append((i, [-1.0 - 0.01 * i, -1.0, 1.0, -1.0]))
    got = similarity.binary_hamming_recall(
        _emb(spark, rows), query_ids=[0, 6], k=3
    ).collect()[0]
    # within each block hamming distance is 0 for all members, so the
    # tiebreak picks the lowest ids in the SAME block as exact does
    assert got.n_queries == 2
    assert got.total_hits == 6 and got.recall == 1.0


# ------------------------------------------------------------ KL by source


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_kl_symmetric_for_identical_sources(spark):
    # identical source distributions score identically and near zero
    # (add-one smoothing keeps p != q when totals differ, so the
    # smoothed KL is small-positive rather than exactly 0)
    rows = [("a", "x y z x"), ("b", "x y z x")]
    out = {r.source: r for r in text.kl_divergence_by_source(_docs(spark, rows)).collect()}
    assert out["a"].kl_unigram == out["b"].kl_unigram
    assert 0 <= out["a"].kl_unigram < 0.01


def test_kl_nonnegative_and_orders_shift(spark):
    rows = [
        ("same", "x y z x y z"),
        ("shifted", "q q q q x y"),
        ("mid", "x y z q x y"),
    ]
    out = {r.source: r for r in text.kl_divergence_by_source(_docs(spark, rows)).collect()}
    assert all(r.kl_unigram >= 0 for r in out.values())
    assert out["shifted"].kl_unigram > out["mid"].kl_unigram > 0


def test_kl_closed_form_two_sources(spark):
    # sources {a: x x, b: y y}; vocab {x:2, y:2}, V=2, N_c=4
    rows = [("a", "x x"), ("b", "y y")]
    out = {r.source: r for r in text.kl_divergence_by_source(_docs(spark, rows)).collect()}
    q_x = (2 + 1) / (4 + 2)
    p_x, p_y = (2 + 1) / (2 + 2), (0 + 1) / (2 + 2)
    exp = round(p_x * math.log(p_x / q_x) + p_y * math.log(p_y / q_x), 6)
    assert out["a"].kl_unigram == pytest.approx(exp, abs=1e-9)
    assert out["a"].n_tokens_top == 2 and out["a"].n_terms_present == 1


# ------------------------------------------------------------- readability


def test_readability_closed_form(spark):
    # "go. go now." -> w=3, s=2, vowel groups: o, o, o -> y0=3, syl=max(3,3)=3
    rows = [("s1", "go. go now.")]
    got = text.readability_by_source(_docs(spark, rows)).collect()[0]
    exp = 206.835 - 1.015 * 3 / 2 - 84.6 * 3 / 3
    assert got.n_docs == 1
    assert got.mean_flesch == pytest.approx(round(exp, 6), abs=1e-9)
    assert got.n_easy == 1 and got.n_hard == 0


def test_readability_syllable_floor(spark):
    # consonant-only tokens still count >= 1 syllable each via the floor
    rows = [("s1", "zzz bcd fgh")]
    got = text.readability_by_source(_docs(spark, rows)).collect()[0]
    exp = 206.835 - 1.015 * 3 / 1 - 84.6 * 3 / 3
    assert got.mean_flesch == pytest.approx(round(exp, 6), abs=1e-9)


# ----------------------------------------------------------- trigram paths


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, float(t), e) for i, (u, t, e) in enumerate(rows)],
        "event_id long, user_id long, ts_d double, event_type string",
    ).select("event_id", "user_id", F.col("ts_d").cast("timestamp").alias("ts"), "event_type")


def test_trigram_paths_counts(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
    ]
    got = {(r.step1, r.step2, r.step3): r.cnt
           for r in analytics.trigram_paths(_events(spark, rows)).collect()}
    assert got[("a", "b", "c")] == 2
    assert got[("b", "c", "a")] == 1
    assert len(got) == 2  # no cross-user chains


def test_trigram_paths_rank_tiebreak(spark):
    rows = [
        (1, 1, "b"), (1, 2, "b"), (1, 3, "b"),
        (2, 1, "a"), (2, 2, "a"), (2, 3, "a"),
    ]
    got = analytics.trigram_paths(_events(spark, rows)).collect()
    assert [(r.rank, r.step1) for r in got] == [(1, "a"), (2, "b")]


# -------------------------------------------------------------- EWMA trend


def test_ewma_closed_form(spark):
    # one key, three consecutive days with counts 4, 2, 8:
    # day3 ewma = (8 + 0.5*2 + 0.25*4) / (1 + 0.5 + 0.25)
    base = 86400
    rows = []
    for d, n in [(1, 4), (2, 2), (3, 8)]:
        rows += [(1, d * base + j, "click") for j in range(n)]
    got = {r.day: r for r in analytics.ewma_trend(_events(spark, rows)).collect()}
    assert len(got) == 3
    last = sorted(got)[-1]
    exp = (8 + 0.5 * 2 + 0.25 * 4) / 1.75
    assert got[last].ewma == pytest.approx(round(exp, 6), abs=1e-9)
    assert got[last].deviation == pytest.approx(round(8 - exp, 6), abs=1e-9)


def test_ewma_window_truncation(spark):
    # a day 40 days back is outside the 28-day window: ewma = today only
    base = 86400
    rows = [(1, 1 * base + j, "click") for j in range(5)]
    rows += [(1, 41 * base + j, "click") for j in range(3)]
    got = {r.day: r for r in analytics.ewma_trend(_events(spark, rows)).collect()}
    last = sorted(got)[-1]
    assert got[last].ewma == 3.0 and got[last].deviation == 0.0
