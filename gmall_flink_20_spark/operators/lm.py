"""Unigram language-model scoring and model-based quality gates.

CCNet-style corpus curation (Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data") scores every document
under a language model trained on the corpus itself and buckets the
corpus into head/middle/tail quality terciles. At 100 TB nobody runs a
neural LM over every document first — the standard proxy is a corpus
unigram model: one token-frequency aggregation over the corpus, joined
back per document.

Determinism contract (same as operators/text.py): every emitted score is
exact integer arithmetic or a fixed-order chain of IEEE-754 double
divisions on exact integers, so the DuckDB oracle computes bit-identical
values — no transcendental functions (``ln`` differs in ULPs across
libm implementations), no floating-point summation trees. Exceptions:
``bigram_perplexity`` and ``dsir_weights`` are inherently log-domain and
follow text.bm25_topk's relaxed contract instead (ln of exact-integer
rationals, per-doc sum rounded to 6 decimals).

Scale notes per operator are in the docstrings; the common shape is
map-side-combined token aggregation (one shuffle on token, one on
doc_id) with the vocabulary table — orders of magnitude smaller than
the corpus — on the build side of the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "unigram_lm",
    "bigram_lm",
    "bigram_perplexity",
    "dsir_weights",
    "ccnet_buckets",
    "ccnet_buckets_approx",
    "quality_classifier",
    "CLASSIFIER_WEIGHTS",
]


def unigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document corpus-unigram likelihood statistics — the CCNet
    perplexity proxy.

    Emits per document: ``n_tokens``, ``sum_tf`` (summed corpus
    frequency over the document's token occurrences), ``min_tf`` (the
    rarest token's corpus count — an OOV/typo signal), and ``lm_score``
    = mean corpus frequency of the document's tokens normalized by the
    corpus size: ``sum_tf / n_tokens / total_tokens``. High score ⇒ the
    document is made of common, in-distribution tokens; low score ⇒
    rare-token soup (boilerplate, codes, OCR noise).

    Scale shape: the corpus token stream is collapsed to (doc, token,
    count) FIRST (map-side combine on the dominant duplicate tokens), so
    the token-frequency join moves per-document vocabularies, not raw
    occurrences. The vocabulary table is corpus-global but tiny relative
    to the corpus (Heaps' law); AQE broadcasts it when it fits, else the
    join hash-partitions on token — never on the full text. The corpus
    total is a one-row aggregate broadcast via crossJoin (the TPC-H
    scalar idiom, plans/tpch.py).

    All divisions are a fixed left-associative chain on exact longs —
    bit-identical in both engines; no ``n_tokens * total`` product that
    would overflow int64 at 100 TB.
    """
    dt = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = dt.groupBy("tok").agg(F.sum("c").cast("long").alias("tf"))
    total = tf.agg(F.sum("tf").cast("long").alias("total"))
    return (
        dt.join(tf, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("tf")).cast("long").alias("sum_tf"),
            F.min("tf").cast("long").alias("min_tf"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lm_score",
            F.col("sum_tf").cast("double")
            / F.col("n_tokens").cast("double")
            / F.col("total").cast("double"),
        )
        .drop("total")
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet head/middle/tail terciles per language.

    Documents rank within their language by ``lm_score`` (descending,
    doc-id tiebreak) and split into three equal ``ntile`` buckets:
    ``head`` = most in-distribution third, ``tail`` = the third a
    curation run drops or down-weights. Both engines implement ntile
    with the same spec (earlier buckets take the remainder rows), so the
    assignment is deterministic.

    Scale note: the per-language window is the honest declarative form,
    but a window partitioned by language puts each language's (doc_id,
    score) pairs — narrow rows, but 10^9+ of them for English at 100 TB —
    through one task. The scale-out variant swaps the exact ntile for
    per-language ``approx_percentile(lm_score, [1/3, 2/3])`` cutoffs
    (two tiny aggregates broadcast back, zero windows); the exact form
    is kept here because the correctness gate requires bit-stable
    bucket assignment.
    """
    lm = unigram_lm(df, text_col, id_col)
    langs = df.select(F.col(id_col), F.col(lang_col))
    w = Window.partitionBy(lang_col).orderBy(F.desc("lm_score"), F.asc(id_col))
    return (
        lm.join(langs, id_col)
        .withColumn("_t", F.ntile(3).over(w))
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.col("lm_score"),
            F.when(F.col("_t") == 1, F.lit("head"))
            .when(F.col("_t") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# Fixed linear-model weights (a trained fastText/logistic quality
# classifier distilled to literals — the deployment shape: training
# happens offline, scoring is a pure column expression). Order matters:
# the score is the exact left-associative sum below, mirrored in SQL.
CLASSIFIER_WEIGHTS: dict[str, float] = {
    "bias": -1.0,
    "stopword_ratio": 8.0,
    "mean_token_len": 0.25,
    "digit_ratio": -6.0,
    "n_tokens": 0.001,
}

_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Model-based quality gate: a linear classifier over engineered
    features with literal weights, scored entirely in whole-stage
    codegen — zero shuffle, zero UDF, scales with input splits.

    The score is the linear margin w·x (the sigmoid is monotone, so
    thresholding the margin is the same decision and avoids ``exp``,
    which is not bit-stable across engines). Features are exact ratios:
    stopword ratio, mean token length, digit-character ratio, token
    count. ``kept`` = margin >= threshold.
    """
    toks = tokens(text_col)
    t = F.col(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(t).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("long")
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("long")
    stopword_ratio = n_stop.cast("double") / n_tokens.cast("double")
    mean_token_len = n_chars.cast("double") / n_tokens.cast("double")
    digit_ratio = n_digit.cast("double") / n_chars.cast("double")
    w = CLASSIFIER_WEIGHTS
    score = (
        F.lit(float(w["bias"]))
        + F.lit(float(w["stopword_ratio"])) * stopword_ratio
        + F.lit(float(w["mean_token_len"])) * mean_token_len
        + F.lit(float(w["digit_ratio"])) * digit_ratio
        + F.lit(float(w["n_tokens"])) * n_tokens.cast("double")
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        stopword_ratio.alias("stopword_ratio"),
        mean_token_len.alias("mean_token_len"),
        digit_ratio.alias("digit_ratio"),
        score.alias("clf_score"),
        (score >= F.lit(float(threshold))).cast("long").alias("kept"),
    )


def ccnet_buckets_approx(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    accuracy: int = 10000,
) -> DataFrame:
    """The 100 TB form of ``ccnet_buckets``: per-language tercile CUTOFFS
    from ``approx_percentile`` (a mergeable GK sketch — one map-side-
    combined aggregate, |langs| rows out, broadcast back) instead of the
    exact per-language ntile window. No window operator anywhere, so no
    per-language single-task sort; the corpus is scanned, scored, and
    bucketed by comparing against two broadcast literals per language.

    Bucket boundaries can differ from the exact ntile at sketch
    resolution (ties and ±1/accuracy rank error) — that is the accepted
    trade at scale; `tests/test_lm_ops.py` pins the agreement rate
    against the exact form. Not registry-gated (a sketch cutoff is not
    bit-reproducible across engines); the exact form remains the oracle-
    gated entry.
    """
    lm = unigram_lm(df, text_col, id_col)
    langs = df.select(F.col(id_col), F.col(lang_col))
    scored = lm.join(langs, id_col)
    cuts = scored.groupBy(lang_col).agg(
        F.percentile_approx(
            "lm_score", [2.0 / 3.0, 1.0 / 3.0], accuracy
        ).alias("_cuts")
    )
    return (
        scored.join(F.broadcast(cuts), lang_col)
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.col("lm_score"),
            F.when(F.col("lm_score") >= F.col("_cuts")[0], F.lit("head"))
            .when(F.col("lm_score") >= F.col("_cuts")[1], F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document corpus-BIGRAM likelihood statistics — the next rung
    of the CCNet perplexity-proxy ladder above ``unigram_lm``: a
    document of individually-common tokens in an uncommon ORDER (shuffled
    boilerplate, word-salad spam, template stitching) scores high on the
    unigram proxy but low here.

    Emits per document (documents with ≥ 2 tokens): ``n_bigrams``,
    ``sum_bf`` (summed corpus frequency over the document's bigram
    occurrences), ``min_bf`` (rarest bigram's corpus count — 1 means the
    document contains a transition seen nowhere else), and ``lm2_score``
    = ``sum_bf / n_bigrams / total_bigrams`` — the same exact-integer
    division chain as the unigram score, so the two are directly
    comparable gates.

    Scale shape identical to ``unigram_lm``: bigrams collapse to
    (doc, bigram, count) first (map-side combine), the corpus bigram
    table joins on the bigram key (hash-partitioned; AQE broadcasts it
    when small), and the corpus total is a broadcast scalar. The bigram
    construction is ROW-LOCAL — a zip of the token array with its own
    tail, no window/lag shuffle.
    """
    toks = tokens(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dt = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bf = dt.groupBy("bg").agg(F.sum("c").cast("long").alias("bf"))
    total = bf.agg(F.sum("bf").cast("long").alias("total"))
    return (
        dt.join(bf, "bg")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("bf")).cast("long").alias("sum_bf"),
            F.min("bf").cast("long").alias("min_bf"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lm2_score",
            F.col("sum_bf").cast("double")
            / F.col("n_bigrams").cast("double")
            / F.col("total").cast("double"),
        )
        .drop("total")
    )


def bigram_perplexity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cross-entropy under a Laplace-smoothed corpus bigram
    LM — the actual CCNet quality statistic (Wenzek et al. train KenLM;
    at corpus scale the self-trained smoothed bigram model is the
    standard stand-in, one rung above ``bigram_lm``'s frequency proxy):

        H(d) = −(1/N_d) Σ_trans ln P(b|a),
        P(b|a) = (c(ab) + 1) / (c(a·) + V)

    with c from the whole corpus and V the corpus vocabulary size. Low
    H = fluent under the corpus distribution; high H = word salad /
    template stitching. Emits (doc_id, n_transitions, min_bf,
    cross_entropy) for documents with ≥ 2 tokens.

    Determinism: this op (like text.bm25_topk / tfidf) RELAXES the
    module's no-transcendentals contract — ``ln`` of exact-integer
    rationals, summed per doc and rounded to 6 decimals; reorder error
    is ~1e-13 on sums of O(10²) unit-scale terms, far inside the
    rounding.

    Scale shape: bigram construction is row-local (zip against own
    tail, no lag shuffle); corpus bigram counts, left-context counts,
    and V are token-keyed aggregates (map-side combined) joined back on
    the bigram/context key — the LM tables are vocabulary-sized, not
    corpus-sized, so AQE broadcasts them when small and hash-joins
    otherwise.
    """
    toks = tokens(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dt = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bf = dt.groupBy("bg").agg(F.sum("c").cast("long").alias("bf"))
    ctx = (
        bf.withColumn("a", F.split(F.col("bg"), " ")[0])
        .groupBy("a")
        .agg(F.sum("bf").cast("long").alias("cf"))
    )
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("v"))
    )
    trans = (
        dt.join(bf, "bg")
        .withColumn("a", F.split(F.col("bg"), " ")[0])
        .join(ctx, "a")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_lp",
            F.log(
                (F.col("bf").cast("double") + F.lit(1.0))
                / (F.col("cf").cast("double") + F.col("v").cast("double"))
            ),
        )
    )
    return (
        trans.groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_transitions"),
            F.min("bf").cast("long").alias("min_bf"),
            F.round(
                -F.sum(F.col("c").cast("double") * F.col("_lp"))
                / F.sum("c").cast("double"),
                6,
            ).alias("cross_entropy"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_filter,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by the log-ratio of a TARGET distribution to the RAW
    distribution over hashed n-gram features — the standard cheap
    re-weighting that biases a 100 TB crawl toward a quality domain
    without training a classifier.

        w(d) = Σ_k n_k(d) · [ ln((tc_k+1)/(T+B)) − ln((rc_k+1)/(R+B)) ]

    where n_k(d) is the document's count in hashed-unigram bucket k
    (B = ``n_buckets``), tc/rc are target/raw corpus bucket totals and
    T/R their sums (add-one smoothing on both). ``target_filter`` is a
    boolean Column selecting the target slice of ``df`` (e.g.
    ``col('lang') == 'en'``).

    Buckets use the engine-portable 60-bit md5 hash (the shingle-hash
    parity trick, dedup.jaccard_blocked) mod B, so the oracle buckets
    identically. Emits (doc_id, n_tokens, dsir_logweight) for non-empty
    documents, weight rounded to 6 decimals after the per-doc sum
    (the text.bm25_topk ln-parity precedent).

    Scale shape: one token explode → (doc, bucket) map-side-combined
    counts; the two global bucket tables are B rows each — broadcast
    literals, effectively — so the scoring join adds no corpus shuffle
    beyond the feature aggregation itself.
    """
    tk = (
        df.select(F.col(id_col), F.col(text_col), F.explode(tokens(text_col)).alias("t"))
        .withColumn(
            "k",
            F.pmod(
                F.expr("CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT)"),
                F.lit(n_buckets),
            ),
        )
    )
    doc_feat = tk.groupBy(id_col, "k").agg(F.count(F.lit(1)).alias("n"))
    raw = doc_feat.groupBy("k").agg(F.sum("n").cast("long").alias("rc"))
    target_ids = df.filter(target_filter).select(id_col)
    tgt = (
        doc_feat.join(target_ids, id_col)
        .groupBy("k")
        .agg(F.sum("n").cast("long").alias("tc"))
    )
    totals = raw.join(tgt, "k", "left").agg(
        F.sum("rc").cast("long").alias("rt"),
        F.sum(F.coalesce(F.col("tc"), F.lit(0))).cast("long").alias("tt"),
    )
    scored = (
        doc_feat.join(raw, "k")
        .join(tgt, "k", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_lr",
            F.log(
                (F.coalesce(F.col("tc"), F.lit(0)).cast("double") + F.lit(1.0))
                / (F.col("tt").cast("double") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("rc").cast("double") + F.lit(1.0))
                / (F.col("rt").cast("double") + F.lit(float(n_buckets)))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.round(F.sum(F.col("n").cast("double") * F.col("_lr")), 6).alias(
            "dsir_logweight"
        ),
    )
