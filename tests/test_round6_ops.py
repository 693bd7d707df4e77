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
