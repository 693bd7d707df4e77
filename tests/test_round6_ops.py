"""Round-6 operator gates: smoothed-bigram perplexity, DSIR importance
weights, association rules, Markov next-event prediction."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from gmall_flink_20_spark.operators import analytics, lm


# --------------------------------------------------------- perplexity


def test_perplexity_closed_form_tiny(spark):
    # corpus: "a b" x2 and "a c": V = {a,b,c} = 3
    # bigrams: (a b) c=2, (a c) c=1; ctx c(a.) = 3
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in lm.bigram_perplexity(df).collect()}
    p_ab = (2 + 1) / (3 + 3)
    p_ac = (1 + 1) / (3 + 3)
    assert got[1].n_transitions == 1 and got[1].min_bf == 2
    assert got[1].cross_entropy == round(-math.log(p_ab), 6)
    assert got[3].cross_entropy == round(-math.log(p_ac), 6)
    # the rarer transition scores strictly worse (higher H)
    assert got[3].cross_entropy > got[1].cross_entropy


def test_perplexity_word_salad_scores_worse(spark):
    # identical token MULTISET, shuffled order: unigram proxies tie,
    # perplexity must separate them — the reason the op exists
    fluent = "the cat sat on the mat " * 5
    salad = "mat the on sat cat the " * 5
    df = spark.createDataFrame(
        [(1, fluent), (2, salad)] + [(i, fluent) for i in range(3, 10)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cross_entropy for r in lm.bigram_perplexity(df).collect()}
    assert got[2] > got[1]


def test_perplexity_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, "two words")], "doc_id long, text string"
    )
    ids = {r.doc_id for r in lm.bigram_perplexity(df).collect()}
    assert ids == {2}


# --------------------------------------------------------------- DSIR


def test_dsir_target_tokens_weigh_positive(spark):
    # target docs use disjoint vocabulary from raw-only docs: docs made
    # of target-corpus tokens must outscore docs of raw-only tokens
    rows = [(i, "alpha beta gamma", "en") for i in range(10)]
    rows += [(100 + i, "zeta eta theta", "fr") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.dsir_logweight for r in
           lm.dsir_weights(df, F.col("lang") == "en").collect()}
    assert got[0] > got[100]
    assert got[0] > 0 > got[100]


def test_dsir_weight_scales_with_length(spark):
    # doubling a doc's tokens doubles its log-weight (sum form)
    rows = [(1, "alpha beta", "en"), (2, "alpha beta alpha beta", "fr"),
            (3, "alpha beta", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in lm.dsir_weights(df, F.col("lang") == "en").collect()}
    assert got[2].n_tokens == 2 * got[3].n_tokens
    assert abs(got[2].dsir_logweight - 2 * got[3].dsir_logweight) < 1e-5


# -------------------------------------------------- association rules


def test_association_rules_closed_form(spark):
    # 4 users: {1,2} x3, {1} x1 -> supp(1)=4, supp(2)=3, pair=3, n=4
    rows = [(u, i) for u in (10, 11, 12) for i in (1, 2)] + [(13, 1)]
    ev = spark.createDataFrame(rows, "user_id long, item_id long")
    got = {(r.ante, r.cons): r for r in analytics.association_rules(ev).collect()}
    r12 = got[(1, 2)]
    assert (r12.pair_users, r12.supp_a, r12.supp_b) == (3, 4, 3)
    assert r12.confidence == 3 / 4
    assert r12.lift == (3 * 4) / (4 * 3)
    r21 = got[(2, 1)]
    assert r21.confidence == 3 / 3 and r21.lift == r12.lift  # lift symmetric


def test_association_rules_min_support(spark):
    rows = [(1, 1), (1, 2), (2, 1), (2, 3)]  # every pair held by 1 user
    ev = spark.createDataFrame(rows, "user_id long, item_id long")
    assert analytics.association_rules(ev, min_pair_support=2).count() == 0


# ------------------------------------------------------- markov top-k


def test_markov_next_topk_closed_form(spark):
    # one user: a b a b a c  -> from a: b x2, c x1; from b: a x2
    seq = ["a", "b", "a", "b", "a", "c"]
    rows = [(1, i, f"2024-01-01 00:00:{i:02d}", s) for i, s in enumerate(seq)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r.from_state, r.rn): r for r in analytics.markov_next_topk(ev, k=2).collect()}
    assert got[("a", 1)].to_state == "b" and got[("a", 1)].cnt == 2
    assert got[("a", 2)].to_state == "c"
    # smoothing: 3 states; p(a->b) = (2+1)/(3+3)
    assert got[("a", 1)].smoothed_prob == (2 + 1) / (3 + 3)
    assert got[("b", 1)].to_state == "a"


def test_markov_topk_caps_k(spark):
    rows = [(1, i, f"2024-01-01 00:00:{i:02d}", s) for i, s in
            enumerate(["a", "b", "a", "c", "a", "d", "a", "e"])]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = analytics.markov_next_topk(ev, k=3).collect()
    per_from = {}
    for r in out:
        per_from.setdefault(r.from_state, []).append(r.rn)
    assert max(len(v) for v in per_from.values()) <= 3


# ------------------------------------------------------------ zipf fit


def test_zipf_exact_power_law(spark):
    # counts 6/3/2 at ranks 1/2/3 are EXACTLY cnt = 6/rank:
    # ln cnt = ln 6 - 1 * ln rank -> slope == -1, R^2 == 1
    words = ["aa"] * 6 + ["bb"] * 3 + ["cc"] * 2
    df = spark.createDataFrame(
        [(1, " ".join(words), "en")], "doc_id long, text string, lang string"
    )
    from gmall_flink_20_spark.operators.text import zipf_fit

    got = zipf_fit(df, min_count=1).collect()
    assert len(got) == 1
    r = got[0]
    assert r.lang == "en" and r.n_terms == 3 and r.fitted_tokens == 11
    assert r.zipf_slope == -1.0
    assert r.zipf_r2 == 1.0


def test_zipf_min_count_filters_before_rank(spark):
    # a singleton term must not enter the fit when min_count=2; equal
    # counts = horizontal line -> slope 0, R² NULL (vary = 0 guard)
    df = spark.createDataFrame(
        [(1, "aa aa bb bb cc", "en")], "doc_id long, text string, lang string"
    )
    from gmall_flink_20_spark.operators.text import zipf_fit

    got = zipf_fit(df, min_count=2).collect()[0]
    assert got.n_terms == 2 and got.fitted_tokens == 4
    assert got.zipf_slope == 0.0 and got.zipf_r2 is None


def test_zipf_single_term_yields_nulls(spark):
    # one surviving term: varx = 0 -> both slope and R² NULL
    df = spark.createDataFrame(
        [(1, "aa aa aa", "en")], "doc_id long, text string, lang string"
    )
    from gmall_flink_20_spark.operators.text import zipf_fit

    got = zipf_fit(df, min_count=2).collect()[0]
    assert got.n_terms == 1
    assert got.zipf_slope is None and got.zipf_r2 is None


# --------------------------------------------------------- burstiness


def test_burstiness_closed_form(spark):
    # 4 docs; 'x' concentrated in one doc (S=4, Q=16): VMR = 16/4 - 4/4 = 3
    # 'y' one per doc (S=4, Q=4): VMR = 4/4 - 4/4 = 0 (constant => var 0)
    df = spark.createDataFrame(
        [(1, "x x x x y"), (2, "y"), (3, "y"), (4, "y")],
        "doc_id long, text string",
    )
    from gmall_flink_20_spark.operators.text import term_burstiness

    got = {r.term: r for r in term_burstiness(df, min_df=1).collect()}
    assert got["x"].df == 1 and got["x"].total_tf == 4
    assert got["x"].burstiness == 3.0
    assert got["y"].df == 4 and got["y"].burstiness == 0.0
    # ranked by total frequency, ties on term: equal totals -> 'x' first
    assert got["x"].rank == 1 and got["y"].rank == 2


def test_burstiness_min_df_and_topk(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "b")], "doc_id long, text string"
    )
    from gmall_flink_20_spark.operators.text import term_burstiness

    # min_df=3 keeps only 'b' (df 3); 'a' has df 2
    got = term_burstiness(df, min_df=3).collect()
    assert [r.term for r in got] == ["b"]
    got2 = term_burstiness(df, top_k=1, min_df=1).collect()
    assert len(got2) == 1 and got2[0].term == "a"  # total_tf 4 > 3


# -------------------------------------------------------- changepoint


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_type string, ts timestamp, user_id long")


def test_changepoint_level_shift(spark):
    import datetime as dt

    rows = []
    # daily counts [1, 1, 5, 5]: n=4, S=[1,2,7,12], S_n=12
    # D_i = |4*S_i - i*12| = [8, 16, 8, 0] -> break at day 2, stat 16
    for day, cnt in [(1, 1), (2, 1), (3, 5), (4, 5)]:
        for j in range(cnt):
            rows.append(("a", dt.datetime(2024, 3, day, 10, j), 1))
    from gmall_flink_20_spark.operators.analytics import changepoint_cusum

    got = changepoint_cusum(_ev(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.event_type == "a" and r.n_days == 4 and r.total_events == 12
    assert r.cp_day == "2024-03-02" and r.cusum_stat == 16
    assert r.cusum_norm == round(16 / (4 * 12), 6)


def test_changepoint_tie_breaks_earliest_day(spark):
    import datetime as dt

    rows = []
    # [2, 1, 1, 2]: S=[2,3,4,6]; D_i = |4*S_i - i*6| = [2, 0, 2, 0]
    # ties at day 1 and day 3 -> earliest wins
    for day, cnt in [(1, 2), (2, 1), (3, 1), (4, 2)]:
        for j in range(cnt):
            rows.append(("a", dt.datetime(2024, 3, day, 10, j), 1))
    from gmall_flink_20_spark.operators.analytics import changepoint_cusum

    r = changepoint_cusum(_ev(spark, rows)).collect()[0]
    assert r.cp_day == "2024-03-01" and r.cusum_stat == 2


# --------------------------------------------------- matryoshka recall


def test_matryoshka_truncation_loses_neighbor(spark):
    # q=id0=[1,0,1,0]; id1=[0.9,0.9,1,0] is the TRUE full-dim top-1;
    # id2=[1,0,-1,0] is orthogonal at full dim but IDENTICAL to q on the
    # first-2 prefix -> dim-2 recall@1 = 0, dim-4 recall@1 = 1
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 1.0, 0.0]),
            (1, [0.9, 0.9, 1.0, 0.0]),
            (2, [1.0, 0.0, -1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    from gmall_flink_20_spark.operators.similarity import matryoshka_recall

    got = {r.dim: r for r in matryoshka_recall(df, [0], k=1, dims=(2, 4)).collect()}
    assert got[2].total_hits == 0 and got[2].mean_recall == 0.0
    assert got[4].total_hits == 1 and got[4].mean_recall == 1.0
    assert got[2].n_queries == 1


def test_matryoshka_hits_bounded_by_k(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from gmall_flink_20_spark.operators.similarity import matryoshka_recall

    got = matryoshka_recall(df, [0, 1, 2], k=3, dims=(4, 8)).collect()
    for r in got:
        assert 0 <= r.total_hits <= 3 * 3
        assert r.mean_recall == round(r.total_hits / 9.0, 6)
    # full-width truncation is the exact search itself
    full = {r.dim: r for r in got}[8]
    assert full.total_hits == 9 and full.mean_recall == 1.0
