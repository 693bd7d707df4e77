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
