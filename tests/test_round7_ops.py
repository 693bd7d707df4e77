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


# ---------------------------------------------------------- survival (KM)


def test_survival_closed_form(spark):
    # 4 users entering at t=0: two convert on day 0 and day 1, two never
    # convert (censored at T_max = day 2).
    base = 86400
    rows = [
        (1, 0, "view"), (1, 10, "purchase"),          # dur 0, event
        (2, 0, "view"), (2, base + 5, "purchase"),     # dur 1, event
        (3, 0, "view"), (3, 2 * base, "click"),        # censored dur 2
        (4, 0, "view"), (4, 2 * base, "click"),        # censored dur 2
    ]
    got = {r.day: r for r in analytics.survival_km(_events(spark, rows)).collect()}
    # day 0: n_risk 4, 1 event -> S = 3/4; day 1: n_risk 3, 1 event -> S = 1/2
    assert got[0].n_risk == 4 and got[0].n_events == 1
    assert got[0].survival == pytest.approx(0.75, abs=1e-9)
    assert got[1].n_risk == 3 and got[1].n_events == 1
    assert got[1].survival == pytest.approx(0.5, abs=1e-9)
    assert set(got) == {0, 1}  # censor-only day 2 emits no curve row


def test_survival_all_convert_hits_zero(spark):
    rows = [(1, 5, "purchase"), (2, 8, "purchase")]
    got = analytics.survival_km(_events(spark, rows)).collect()
    assert len(got) == 1 and got[0].survival == 0.0 and got[0].n_risk == 2


# ------------------------------------------------------------ path entropy


def test_path_entropy_deterministic_state(spark):
    # a -> b always; b -> (a|c) evenly: H(a)=0, H(b)=ln 2, norm 1
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"), (1, 5, "c"),
    ]
    got = {r.from_state: r for r in analytics.path_entropy(_events(spark, rows)).collect()}
    assert got["a"].entropy == 0.0 and got["a"].fanout == 1
    assert got["a"].entropy_norm == 0.0
    assert got["b"].fanout == 2
    assert got["b"].entropy == pytest.approx(round(math.log(2), 6), abs=1e-9)
    assert got["b"].entropy_norm == pytest.approx(1.0, abs=1e-6)


# -------------------------------------------------------------- code detect


def test_code_detect_flags_marker_dense_docs(spark):
    rows = [
        ("code", "def f(x): return x;"),     # markers: (, ), :? -> def,(,),;,return
        ("prose", "the quick brown fox jumps over the lazy dog today"),
    ]
    got = {r.source: r for r in text.code_detect_by_source(_docs(spark, rows)).collect()}
    assert got["code"].n_code == 1 and got["code"].code_ratio == 1.0
    assert got["prose"].n_code == 0 and got["prose"].marker_density == 0.0


# ---------------------------------------------------------- repeat screen


def test_repeat_screen_pairs_and_flags(spark):
    import datetime

    def od(d):
        return datetime.datetime(2024, 1, d)

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, od(1), "1-URGENT"),
            (2, 10, "O", 100.0, od(3), "1-URGENT"),   # same amount, 2d gap
            (3, 10, "O", 100.5, od(5), "1-URGENT"),   # near (0.5%), 2d gap
            (4, 10, "O", 500.0, od(20), "1-URGENT"),  # outside window
            (5, 11, "O", 100.0, od(1), "1-URGENT"),   # other customer
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {(r.orderkey_a, r.orderkey_b): r
           for r in analytics.rapid_repeat_orders(orders).collect()}
    assert set(got) == {(1, 2), (2, 3), (1, 3)}
    assert got[(1, 2)].same_amount == 1 and got[(1, 2)].near_amount == 1
    assert got[(2, 3)].same_amount == 0 and got[(2, 3)].near_amount == 1
    assert got[(1, 3)].same_amount == 0 and got[(1, 3)].near_amount == 1
    assert got[(1, 2)].gap_days == 2


# ------------------------------------------------------ multitouch credit


def test_multitouch_u_shape_weights(spark):
    # one user, 4 touches then a purchase: view,click,view,click ->
    # weights .4, .1, .1, .4 by position
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "view"),
        (1, 40, "click"), (1, 50, "purchase"),
    ]
    got = {r.touch_type: r
           for r in analytics.multitouch_attribution(_events(spark, rows)).collect()}
    assert got["view"].credit == pytest.approx(0.5, abs=1e-9)    # .4 + .1
    assert got["click"].credit == pytest.approx(0.5, abs=1e-9)   # .1 + .4
    assert got["view"].n_conversions == 1 and got["view"].n_touches == 2


def test_multitouch_degenerate_counts(spark):
    # single-touch journey -> weight 1.0; two-touch -> 0.5 each
    rows = [
        (1, 10, "click"), (1, 20, "purchase"),
        (2, 10, "view"), (2, 15, "click"), (2, 20, "purchase"),
    ]
    got = {r.touch_type: r
           for r in analytics.multitouch_attribution(_events(spark, rows)).collect()}
    assert got["click"].credit == pytest.approx(1.5, abs=1e-9)  # 1.0 + 0.5
    assert got["view"].credit == pytest.approx(0.5, abs=1e-9)
    assert got["click"].n_conversions == 2


def test_multitouch_lookback_excludes_stale_touches(spark):
    rows = [
        (1, 10, "view"),                 # 2 days before: outside 1d lookback
        (1, 2 * 86400 + 10, "purchase"),
    ]
    got = analytics.multitouch_attribution(_events(spark, rows)).collect()
    assert got == []


# --------------------------------------------------------------- pii redact


def test_pii_redact_scrubs_and_counts(spark):
    import hashlib

    rows = [
        ("s1", "mail me at bob.smith+x@corp.io or call 415-555-0101 now"),
        ("s1", "no pii here at all"),
    ]
    got = {r.doc_id: r for r in text.pii_redact(_docs(spark, rows)).collect()}
    assert got[0].n_emails == 1 and got[0].n_phones == 1
    exp0 = hashlib.md5(
        b"mail me at <EMAIL> or call <PHONE> now"
    ).hexdigest()
    assert got[0].redacted_md5 == exp0
    assert got[1].n_emails == 0 and got[1].n_phones == 0
    exp1 = hashlib.md5(b"no pii here at all").hexdigest()
    assert got[1].redacted_md5 == exp1


def test_pii_redact_multiple_hits_global(spark):
    rows = [("s1", "a@b.co c@d.org 212-555-1234 999-1234-5678")]
    got = text.pii_redact(_docs(spark, rows)).collect()[0]
    assert got.n_emails == 2 and got.n_phones == 2


# --------------------------------------------------------------- theta sketch


def _keyed(spark, rows):
    return spark.createDataFrame(rows, "grp string, uid long")


def test_theta_overlap_exact_mode_unsaturated(spark):
    from gmall_flink_20_spark.operators import sketches

    # |A|=4, |B|=3, A∩B={2,3} — k far above both => theta=M, every
    # estimate collapses to the exact count
    rows = [("a", u) for u in (1, 2, 3, 4)] + [("b", u) for u in (2, 3, 9)]
    got = sketches.theta_overlap(_keyed(spark, rows), "grp", "uid", k=64).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.key_a, r.key_b) == ("a", "b")
    assert (r.n_a, r.n_b, r.exact_inter) == (4, 3, 2)
    assert (r.est_a, r.est_b) == (4.0, 3.0)
    assert r.est_inter == 2.0 and r.est_union == 5.0


def test_theta_overlap_saturated_within_bound(spark):
    from gmall_flink_20_spark.operators import sketches

    # 400 ids per key, 200 shared; k=32 saturates both sketches — the
    # KMV error envelope is ~1/sqrt(k-1): accept 4 sigma on the per-key
    # estimates and a loose band on the set-op estimates
    a = [("a", u) for u in range(400)]
    b = [("b", u) for u in range(200, 600)]
    r = sketches.theta_overlap(_keyed(spark, a + b), "grp", "uid", k=32).collect()[0]
    assert (r.n_a, r.n_b, r.exact_inter) == (400, 400, 200)
    sigma = 1.0 / math.sqrt(31)
    for est, exact in ((r.est_a, 400), (r.est_b, 400)):
        assert abs(est - exact) / exact <= 4 * sigma
    assert 0 < r.est_inter < 600 and r.est_union > max(r.est_a, r.est_b) - 1e-9
    # inclusion-exclusion coherence at theta_ab: inter + union est use the
    # same scale, so est_inter + est_union ~= est of multiset sum
    assert r.est_inter <= r.est_union + 1e-9


def test_theta_overlap_disjoint_sets(spark):
    from gmall_flink_20_spark.operators import sketches

    rows = [("a", u) for u in range(50)] + [("b", u + 1000) for u in range(50)]
    r = sketches.theta_overlap(_keyed(spark, rows), "grp", "uid", k=64).collect()[0]
    assert r.exact_inter == 0 and r.est_inter == 0.0
    assert r.est_union == 100.0  # unsaturated => exact


def test_theta_overlap_pair_count_and_determinism(spark):
    from gmall_flink_20_spark.operators import sketches

    rows = [(g, u) for g in "abcd" for u in range(10)]
    df = _keyed(spark, rows)
    got1 = sorted(map(tuple, sketches.theta_overlap(df, "grp", "uid", k=8).collect()))
    got2 = sorted(map(tuple, sketches.theta_overlap(df, "grp", "uid", k=8).collect()))
    assert len(got1) == 6 and got1 == got2


# ------------------------------------------------------- source minhash sim


def _src_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_source_minhash_identical_sources_full_match(spark):
    from gmall_flink_20_spark.operators import dedup

    t = "the quick brown fox jumps over the lazy dog again and again"
    r = dedup.source_minhash_sim(
        _src_docs(spark, [("a", t), ("b", t)])
    ).collect()[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert r.sig_matches == 64 and r.est_jaccard == 1.0


def test_source_minhash_disjoint_near_zero(spark):
    from gmall_flink_20_spark.operators import dedup

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "one two three four five six seven eight nine ten eleven"
    r = dedup.source_minhash_sim(_src_docs(spark, [("a", a), ("b", b)])).collect()[0]
    assert r.est_jaccard <= 0.1


def test_source_minhash_partial_overlap_in_band(spark):
    from gmall_flink_20_spark.operators import dedup

    # shared middle chunk: true shingle-set Jaccard sits mid-range; the
    # 64-perm estimate must land within a generous 4-sigma band
    shared = " ".join(f"common{i}" for i in range(30))
    a = " ".join(f"aonly{i}" for i in range(15)) + " " + shared
    b = shared + " " + " ".join(f"bonly{i}" for i in range(15))
    r = dedup.source_minhash_sim(_src_docs(spark, [("a", a), ("b", b)])).collect()[0]
    assert 0.1 <= r.est_jaccard <= 0.9


def test_source_minhash_pair_shape(spark):
    from gmall_flink_20_spark.operators import dedup

    rows = [(f"s{i}", f"text body number {i} with words {i} more {i}") for i in range(4)]
    got = dedup.source_minhash_sim(_src_docs(spark, rows)).collect()
    assert len(got) == 6
    assert all(r.source_a < r.source_b for r in got)


# ---------------------------------------------------------- markov stationary


def test_markov_stationary_periodic_chain_converges(spark):
    # deterministic a<->b flip: plain power iteration oscillates forever;
    # the lazy chain converges to the true stationary (0.5, 0.5)
    rows = [(1, t, "a" if t % 2 else "b") for t in range(1, 41)]
    got = {r.state: r for r in analytics.markov_stationary(_events(spark, rows)).collect()}
    assert got["a"].stationary_prob == pytest.approx(0.5, abs=1e-6)
    assert got["b"].stationary_prob == pytest.approx(0.5, abs=1e-6)


def test_markov_stationary_biased_chain(spark):
    # P = [[3/4, 1/4], [1/2, 1/2]] => pi = (2/3, 1/3)
    seq = (
        ["a", "a", "a", "a", "b", "b", "a", "a", "a", "a", "b", "b"] * 6
    )  # empirical counts: a->a 3x per a->b, b->a 1x per b->b
    rows = [(1, t + 1, s) for t, s in enumerate(seq)]
    got = {r.state: r for r in analytics.markov_stationary(_events(spark, rows)).collect()}
    # exact pi from the EMPIRICAL matrix: solve with the observed counts
    import numpy as np

    cnt = {}
    for x, y in zip(seq, seq[1:]):
        cnt[(x, y)] = cnt.get((x, y), 0) + 1
    P = np.array(
        [
            [cnt.get(("a", "a"), 0), cnt.get(("a", "b"), 0)],
            [cnt.get(("b", "a"), 0), cnt.get(("b", "b"), 0)],
        ],
        dtype=float,
    )
    P /= P.sum(axis=1, keepdims=True)
    w, v = np.linalg.eig(P.T)
    pi = np.real(v[:, np.argmax(np.real(w))])
    pi /= pi.sum()
    assert got["a"].stationary_prob == pytest.approx(pi[0], abs=1e-4)
    assert got["b"].stationary_prob == pytest.approx(pi[1], abs=1e-4)
    assert got["a"].n_out + got["b"].n_out == len(seq) - 1


def test_markov_stationary_absorbing_restriction(spark):
    # 'end' never emits, so b loses its only kept target and becomes
    # absorbing: all mass drains a -> b
    rows = []
    for u in range(5):
        rows += [(u, 1, "a"), (u, 2, "b"), (u, 3, "end")]
    # 'end' appears as from_state never (it is each user's last event)
    got = {r.state: r for r in analytics.markov_stationary(_events(spark, rows)).collect()}
    assert set(got) == {"a", "b"}
    assert got["b"].stationary_prob == pytest.approx(1.0, abs=1e-6)
    assert got["a"].stationary_prob == pytest.approx(0.0, abs=1e-6)
    assert got["b"].n_out == 0  # its only raw target was dropped


def test_markov_stationary_sums_to_one(spark):
    rows = [(u, t, s) for u in range(3) for t, s in enumerate(["x", "y", "z", "x", "y"])]
    got = analytics.markov_stationary(_events(spark, rows)).collect()
    assert sum(r.stationary_prob for r in got) == pytest.approx(1.0, abs=1e-5)


# ----------------------------------------------------------------- skyline


def _pts(spark, rows):
    return spark.createDataFrame(
        [(i, float(x), int(y)) for i, (x, y) in enumerate(rows)],
        "pid long, x double, y long",
    )


def test_skyline_basic_frontier(spark):
    rows = [(1, 5), (2, 3), (3, 1), (2, 6), (3, 3)]
    got = sorted(
        (r.x, r.y) for r in analytics.skyline2d(_pts(spark, rows), "x", "y", "pid").collect()
    )
    assert got == [(1.0, 1), (2.0, 3)] or got == [(1.0, 5), (2.0, 3), (3.0, 1)]
    # disambiguate: (1,5),(2,3),(3,1) are mutually non-dominated
    assert got == [(1.0, 5), (2.0, 3), (3.0, 1)]


def test_skyline_equal_coordinate_ties(spark):
    # (1,4) dominates (1,5) (equal x, smaller y); duplicates of the
    # surviving point collapse with n_rows
    rows = [(1, 5), (1, 4), (1, 4)]
    got = analytics.skyline2d(_pts(spark, rows), "x", "y", "pid").collect()
    assert len(got) == 1
    assert (got[0].x, got[0].y, got[0].n_rows) == (1.0, 4, 2)
    assert got[0].min_id == 1


def test_skyline_single_point(spark):
    got = analytics.skyline2d(_pts(spark, [(7, 7)]), "x", "y", "pid").collect()
    assert len(got) == 1 and (got[0].x, got[0].y) == (7.0, 7)


# --------------------------------------------------------------- scd2


def test_scd2_islands_collapse_and_chain(spark):
    rows = [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "a")]
    got = sorted(
        analytics.scd2_intervals(_events(spark, rows)).collect(),
        key=lambda r: r.valid_from_us,
    )
    assert [(r.state, r.n_events) for r in got] == [("a", 2), ("b", 1), ("a", 1)]
    assert got[0].valid_to_us == got[1].valid_from_us
    assert got[1].valid_to_us == got[2].valid_from_us
    assert got[2].valid_to_us is None and got[2].is_current
    assert not got[0].is_current and not got[1].is_current
    assert got[0].valid_from_us == 10_000_000


def test_scd2_tiebreak_on_equal_ts(spark):
    # two events at the same timestamp order by event_id: a(id0) then
    # b(id1) => two intervals, not one
    rows = [(1, 10, "a"), (1, 10, "b")]
    got = sorted(
        analytics.scd2_intervals(_events(spark, rows)).collect(),
        key=lambda r: (r.valid_from_us, r.state),
    )
    assert [(r.state, r.is_current) for r in got] == [("a", False), ("b", True)]


def test_scd2_per_key_independent(spark):
    rows = [(1, 10, "a"), (2, 10, "b"), (1, 20, "b"), (2, 20, "b")]
    got = analytics.scd2_intervals(_events(spark, rows)).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1
    assert by_user[2][0].n_events == 2


# ------------------------------------------------- session gap boundary


def test_session_window_merges_at_exact_gap(spark):
    # Spark's session_window is boundary-INCLUSIVE: events exactly gap
    # apart merge; one second past the gap splits. The oracle's break
    # condition must be strictly >, not >= — the >= form survived three
    # rounds until sf0.1 produced a real 1800 s gap (user 511) and the
    # full-sf0.1 parity sweep caught it.
    from gmall_flink_20_spark.operators.windows import session_count

    df = spark.createDataFrame(
        [(1, 0.0), (1, 1800.0), (2, 0.0), (2, 1801.0)], "user_id long, t double"
    ).select("user_id", F.col("t").cast("timestamp").alias("ts"))
    got = {}
    for r in session_count(df, "ts", 1800, "user_id").collect():
        got.setdefault(r.user_id, []).append(r)
    assert len(got[1]) == 1 and got[1][0].n_events == 2
    assert len(got[2]) == 2


# ------------------------------------------------------------------ k-core


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "item_a long, item_b long"
    )


def test_kcore_path_has_no_2core(spark):
    from gmall_flink_20_spark.operators.graph import kcore

    # a path peels from both ends, one layer per round — multi-round
    # cascade ending empty
    path = [(i, i + 1) for i in range(6)]
    assert kcore(_edges(spark, path), k=2).collect() == []


def test_kcore_cycle_is_its_own_2core(spark):
    from gmall_flink_20_spark.operators.graph import kcore

    cyc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = {r.item_id: r for r in kcore(_edges(spark, cyc), k=2).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert all(r.degree_in_core == 2 and r.k_used == 2 for r in got.values())


def test_kcore_triangle_survives_chain_cascades(spark):
    from gmall_flink_20_spark.operators.graph import kcore

    # triangle {0,1,2} + tail 2-3-4-5: the tail peels over multiple
    # rounds (5 first, then 4, then 3); the triangle is the 2-core
    g = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    got = {r.item_id for r in kcore(_edges(spark, g), k=2).collect()}
    assert got == {0, 1, 2}


def test_kcore_adaptive_k_star_collapses(spark):
    from gmall_flink_20_spark.operators.graph import kcore

    # star: center degree 6, leaves 1 -> adaptive k = 4 -> leaves die,
    # then the center has degree 0 -> empty core
    star = [(0, i) for i in range(1, 7)]
    assert kcore(_edges(spark, star)).collect() == []


def _duckdb_kcore_unrolled(pairs, rounds=30):
    """Replica of the items_kcore oracle's fixed-depth unrolled peel
    (adaptive k = max_degree // 2 + 1) over a literal edge list — the
    DuckDB engine side of the peel-depth boundary tests."""
    import duckdb

    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    ctes = [
        f"e0 AS MATERIALIZED (SELECT a, b FROM (VALUES {values}) t(a, b))",
        "kk AS MATERIALIZED (SELECT CAST(max(c) // 2 + 1 AS BIGINT) AS k FROM ("
        "SELECT node, count(*) AS c FROM (SELECT a AS node FROM e0 "
        "UNION ALL SELECT b AS node FROM e0) GROUP BY 1))",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT node, count(*) AS c FROM "
            f"(SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p}) "
            "GROUP BY 1)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT node FROM d{i} "
            "WHERE c >= (SELECT k FROM kk))"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{p} e "
            f"JOIN a{i} x ON e.a = x.node JOIN a{i} y ON e.b = y.node)"
        )
    sql = (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT node AS item_id, CAST(count(*) AS BIGINT) AS degree_in_core,"
        f" (SELECT k FROM kk) AS k_used FROM (SELECT a AS node FROM e{rounds}"
        f" UNION ALL SELECT b AS node FROM e{rounds}) GROUP BY 1"
    )
    return duckdb.sql(sql).fetchall()


def _chain_graph(chain_len):
    # triangle {0,1,2} + pendant chain off node 2: junction degree 3 →
    # adaptive k = 3 // 2 + 1 = 2; the chain tip (degree 1) dies one
    # node per round — peel depth == chain_len, the cascade boundary
    # instrument (VERDICT r7 item 6)
    tri = [(0, 1), (1, 2), (0, 2)]
    chain = [(2 + i, 3 + i) for i in range(chain_len)]
    return tri + chain


def test_kcore_depth30_boundary_parity(spark):
    # 30 productive peels: the MAXIMUM both engines support — Spark's
    # max_iter=31 budget (30 peels + 1 confirming round) must converge,
    # and the oracle's 30 unrolled rounds must land on the same fixpoint
    from gmall_flink_20_spark.operators.graph import kcore

    g = _chain_graph(30)
    got = sorted(
        (r.item_id, r.degree_in_core, r.k_used)
        for r in kcore(_edges(spark, g)).collect()
    )
    exp = sorted(_duckdb_kcore_unrolled(g))
    assert got == exp == [(0, 2, 2), (1, 2, 2), (2, 2, 2)]


def test_kcore_depth31_raises_where_oracle_goes_silent(spark):
    # ONE peel past the budget: Spark raises (the documented divergence
    # guard) while the oracle's fixed 30-round unroll silently emits a
    # non-fixpoint result (a degree-1 chain remnant) — the asymmetry
    # the kcore docstring documents
    import pytest as _pytest

    from gmall_flink_20_spark.operators.graph import kcore

    g = _chain_graph(31)
    silent = {r[0] for r in _duckdb_kcore_unrolled(g)}
    assert 3 in silent  # non-fixpoint: chain node 3 still present
    with _pytest.raises(RuntimeError, match="did not stabilize"):
        kcore(_edges(spark, g)).collect()
