"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference scope (per the build brief): language-ID, quality
scoring, token counting, document fingerprinting over the ``documents``
table. Everything is built-in column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in the hot path — so these scale linearly with
input splits and shuffle nothing.

Determinism contract: every score is an integer ratio or an md5 string so
the DuckDB oracle computes bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "oov_rate",
    "pii_stats",
    "tokenizer_fertility",
    "cross_source_contamination",
    "tokens",
    "token_count",
    "token_count_bpe",
    "quality_score",
    "lang_id",
    "fingerprint",
    "winnowing_fingerprints",
    "repetition_features",
    "tfidf_topk",
    "bm25_topk",
    "token_entropy",
    "collocations_topk",
    "vocabulary",
    "overlap_pairs",
    "corpus_stats",
    "phrase_census",
    "vocab_gini",
    "zipf_fit",
    "term_burstiness",
    "LANG_MARKERS",
    "gopher_filter",
    "gopher_feature_cols",
    "gopher_kept_expr",
    "GOPHER_STOPWORDS",
]

_WS = r"\s+"

# Marker words per language for the n-gram/stopword language-ID heuristic.
# Deterministic argmax with fixed iteration order; 'und' when no marker hits.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "que", "de"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "了", "是", "在"],
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenization (the baseline tokenizer; BPE-ish regex
    splitting composes the same way with a different pattern)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), _WS)


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("n_tokens")
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = ("the", "a", "and", "of", "to", "in"),
) -> DataFrame:
    """Length/stopword/mean-token-length quality features.

    All ratios are double divisions of exact integers, so the oracle's
    values are bit-identical.
    """
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (n_chars.cast("double") / n_tokens.cast("double")).alias("mean_token_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: count word-boundary hits per language,
    argmax with deterministic (insertion-order) tie-breaking, 'und' if no
    marker fires. Pure regexp_count — JVM-side, no UDF."""
    score_cols = []
    for lang, words in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        col = F.regexp_count(F.col(text_col), F.lit(pattern)).cast("long").alias(f"score_{lang}")
        score_cols.append((lang, col))
    out = df.select(F.col(id_col), *[c for _, c in score_cols])
    # argmax: max score, then the FIRST language (dict order) reaching it —
    # folding in reverse order makes earlier languages win ties.
    max_score = None
    for lang, _ in score_cols:
        s = F.col(f"score_{lang}")
        max_score = s if max_score is None else F.greatest(max_score, s)
    guess = F.lit("und")
    for lang, _ in reversed(score_cols):
        s = F.col(f"score_{lang}")
        guess = F.when((s == max_score) & (max_score > 0), F.lit(lang)).otherwise(guess)
    return out.select(F.col(id_col), guess.alias("lang_guess"), max_score.alias("lang_score"))


_BPE_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def token_count_bpe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish regex token count: letter runs, single digits, and
    punctuation marks as separate tokens (the GPT-2-style pre-tokenizer
    shape, simplified to an engine-portable character-class regex).
    ``regexp_count`` is JVM-side; the oracle uses
    ``len(regexp_extract_all(...))`` with the identical pattern."""
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(_BPE_PATTERN)).cast("long").alias("n_bpe_tokens"),
    )


def _winnowing_kernel(
    k: int, window: int, text_col: str, id_col: str, fp_int: bool = False
):
    """Arrow-batched winnowing kernel (VERDICT r12 item 2): per
    document, tokenize, md5 every k-gram EXACTLY as the former JVM
    expression did (space-joined tokens, utf-8 bytes, lowercase hex),
    take the sliding-window minimum as one numpy ``S32`` lexicographic
    reduction, and emit the per-doc-deduped (id, fp) frame. A doc is one
    input row, so in-kernel per-doc ``np.unique`` IS the distinct —
    the old explode + window-min + global DISTINCT shuffle disappears
    entirely (the operator becomes shuffle-free). Tokenization parity
    with ``split(trim(text), '\\s+')`` is the same ASCII-\\s contract
    the r12 n-gram kernels pinned."""
    import re

    pat = re.compile(r"\s+", re.ASCII)

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        md5 = hashlib.md5
        sw = np.lib.stride_tricks.sliding_window_view
        for pdf in batches:
            ids: list = []
            fps: list = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                toks = pat.split(t.strip(" "))
                if len(toks) < k + window - 1:
                    continue
                w = len(toks) - k + 1
                # hex digests as fixed-width bytes; numpy can SORT
                # flexible dtypes but not ufunc-reduce them, so the
                # sliding-window minimum runs on int64 RANKS (argsort
                # inverse): min rank per window == lexicographically
                # minimal digest per window, the same ASCII order the
                # JVM string MIN used
                hs = np.array(
                    [
                        md5(" ".join(toks[j : j + k]).encode("utf-8")).hexdigest()
                        for j in range(w)
                    ],
                    dtype="S32",
                )
                order = np.argsort(hs, kind="stable")
                ranks = np.empty(w, dtype=np.int64)
                ranks[order] = np.arange(w)
                # min RANK per window -> back to the element INDEX via
                # order[rank] -> digest
                sel = np.unique(hs[order[sw(ranks, window).min(axis=1)]])
                ids.extend([did] * len(sel))
                if fp_int:
                    fps.extend(int(s[:15], 16) for s in sel)
                else:
                    fps.extend(s.decode("ascii") for s in sel)
            if ids:
                yield pd.DataFrame({id_col: ids, "fp": fps})

    return gen


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_int: bool = False,
) -> DataFrame:
    """Document fingerprinting by winnowing (the MOSS scheme): hash every
    k-gram (k consecutive tokens, a rolling-hash stand-in computed as
    md5), then keep the minimum hash of each sliding window of ``window``
    consecutive k-gram hashes. Output the distinct selected fingerprints
    per doc — a compact, position-robust signature for overlap detection.

    Entirely row-local: one Arrow mapInPandas kernel per scan split
    (``_winnowing_kernel``) emits the final deduped (id, fp) frame with
    ZERO shuffles — the former explode(sequence) + per-gram md5
    expression + window-min + DISTINCT plan paid two wide exchanges and
    per-gram expression evaluation for the same answer
    (docs_overlap_pairs was 4.5× the oracle; VERDICT r12 item 2).
    Arithmetic is bit-identical (same md5 hex over the same utf-8 gram
    bytes, same lexicographic min), so the same exact oracles gate it;
    pinned by test_winnowing_kernel_matches_jvm_expression.

    ``fp_int=True`` emits each SELECTED fingerprint as the first 60
    bits of its digest (hex[:15] as a long) instead of the 32-char hex
    string — selection still uses the FULL digest ordering, so the
    selected set is identical; only the emitted representation narrows.
    For overlap counting (the only consumer) a collision needs two
    distinct selected digests sharing 60 bits — ~|fps|²/2^61,
    vanishing — while join/groupBy keys drop from 32-byte strings to
    longs."""
    id_type = df.schema[id_col].dataType.simpleString()
    fp_type = "long" if fp_int else "string"
    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _winnowing_kernel(k, window, text_col, id_col, fp_int),
        f"{id_col} {id_type}, fp {fp_type}",
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): documents
    dominated by repeated fragments are low-quality training data.

    Emits per doc:
    - ``frac_repeated_tokens`` — 1 − distinct/total tokens (row-local);
    - ``top2gram_char_frac`` — characters covered by the single most
      frequent 2-gram (count × gram length, overlap-counted) over total
      characters; ties break to the lexically smallest gram;
    - ``dup3gram_char_frac`` — characters covered by all 3-grams occurring
      more than once, over total characters.

    Shape for 100 TB: the gram counts shuffle on (doc_id, gram) — fully
    key-parallel, no cross-doc state — then collapse back to one row per
    doc. All values are exact-integer ratios so the DuckDB oracle is
    bit-identical.
    """
    from pyspark.sql import Window as W

    toks = F.split(F.trim(F.col(text_col)), _WS)
    base = df.select(
        F.col(id_col),
        toks.alias("toks"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    ).select(
        F.col(id_col),
        F.col("toks"),
        F.col("n_chars"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )

    def grams(n: int) -> DataFrame:
        return base.filter(F.size("toks") >= n).select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.size("toks") - n)).alias("i"),
            F.col("toks"),
        ).select(
            F.col(id_col),
            F.concat_ws(
                " ", *[F.element_at("toks", F.col("i") + j + 1) for j in range(n)]
            ).alias("gram"),
        )

    g2 = grams(2).groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    top2 = (
        g2.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            (F.col("cnt") * F.length("gram")).cast("long").alias("top2_chars"),
        )
    )
    g3 = grams(3).groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    dup3 = (
        g3.filter(F.col("cnt") >= 2)
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.length("gram")).cast("long").alias("dup3_chars"))
    )
    out = (
        base.drop("toks")
        .join(top2, id_col, "left")
        .join(dup3, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
            ).alias("frac_repeated_tokens"),
            (
                F.coalesce(F.col("top2_chars"), F.lit(0)).cast("double")
                / F.col("n_chars").cast("double")
            ).alias("top2gram_char_frac"),
            (
                F.coalesce(F.col("dup3_chars"), F.lit(0)).cast("double")
                / F.col("n_chars").cast("double")
            ).alias("dup3gram_char_frac"),
        )
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-normalized md5 content fingerprint (md5 so the oracle
    reproduces it exactly; at scale swap for xxhash64 — same plan shape)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")
    return df.select(F.col(id_col), F.md5(normalized.cast("binary")).alias("fp"))


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k keywords per document by smoothed tf-idf
    (idf = ln((1+N)/(1+df)) + 1, the scikit-learn smoothing; score
    rounded to 6 decimals so both engines hash identically).

    Plan shape for 100 TB: terms come from one explode (no self-join);
    document frequency is a map-side-combined two-column aggregate; the
    corpus size N is a broadcast one-row aggregate (no driver collect,
    no single-partition window). Ranking is a window over doc_id — the
    same key the tf aggregate just shuffled on, so Catalyst reuses the
    partitioning and the rank adds no exchange.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs").cast("double"))
                        / (F.lit(1.0) + F.col("df").cast("double"))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def collocations_topk(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k corpus collocations (adjacent word pairs) by PMI.

    PMI = ln( (c12/N_pair) / ((c1/N_tok) * (c2/N_tok)) ) with unigram
    counts c1/c2 over ALL tokens and pair counts over adjacent pairs;
    ``min_count`` guards the low-frequency PMI blowup. The score is
    rounded to 6 decimals and the rank orders by the ROUNDED score (then
    words), so both engines rank identically.

    Plan shape for 100 TB: unigrams and bigrams are each one explode +
    map-side-combined aggregate; the frequency joins run AFTER the
    ``min_count`` filter, so only the surviving (small) pair set joins
    the unigram table, and the two corpus totals are broadcast one-row
    aggregates — no driver collect, no cross join of token streams.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: t != ""
    )
    base = df.select(toks.alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    pairs = (
        base.filter(F.size("toks") >= 2)
        .select(
            F.explode(F.sequence(F.lit(0), F.size("toks") - 2)).alias("i"),
            F.col("toks"),
        )
        .select(
            F.element_at("toks", F.col("i") + 1).alias("w1"),
            F.element_at("toks", F.col("i") + 2).alias("w2"),
        )
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_pair = pc.agg(F.sum("c12").cast("long").alias("n_pair"))
    scored = (
        pc.filter(F.col("c12") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c12").cast("double") / F.col("n_pair").cast("double"))
                    / (
                        (F.col("c1").cast("double") / F.col("n_tok").cast("double"))
                        * (F.col("c2").cast("double") / F.col("n_tok").cast("double"))
                    )
                ),
                6,
            ),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("c2").cast("long").alias("c2"),
            "pmi",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def vocabulary(
    df: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Frequency-thresholded vocabulary with stable ids (count desc, term
    asc) — the deterministic token-vocabulary construction step of a
    tokenizer-training pipeline.

    Plan shape for 100 TB: one explode + map-side-combined count, then
    the ``min_count`` filter BEFORE the ranking window, so the
    single-partition rank only ever sees the surviving vocabulary
    (bounded: vocabularies are ≤ a few million terms however large the
    corpus) — the corpus-sized term stream never passes through a global
    sort.
    """
    terms = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term")
    ).filter(F.col("term") != "")
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        counts.filter(F.col("cnt") >= min_count)
        .withColumn("vocab_id", F.row_number().over(w).cast("long"))
        .select("term", F.col("cnt").cast("long").alias("cnt"), "vocab_id")
    )


def overlap_pairs(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-overlap pairs by shared winnowing fingerprints — the
    MOSS-style plagiarism/containment detector that exact-span dedup
    pipelines run where near-dup (whole-doc) similarity is too coarse.

    Fingerprints appearing in more than ``max_fp_df`` documents are
    dropped before pairing (stop-fingerprints — boilerplate every doc
    shares). That is both the standard precision move AND the scale
    bound: per-fingerprint pair fan-out is capped at max_fp_df²/2, so
    no boilerplate fingerprint can quadratically concentrate a task —
    the same cap discipline as operators/blocking.py, enforced by
    frequency instead of sub-salting because dropped fingerprints
    carry no signal anyway.

    Plan (re-shaped round 13 with the Arrow kernel): the kernel emits
    60-bit LONG fingerprints (selection by full-digest order — same
    selected set as the string form), the stop-fingerprint frequency
    filter is a window count over the SAME fp exchange (no
    count-then-join back), and the surviving (id, fp) long pairs feed
    the self-join directly — NO persist: the kernel is cheap enough
    that recomputing it per join side beats paying the cache
    materialization barrier (measured 2.2 s vs 5.4 s at sf0.1), and
    Catalyst reuses the fp exchange across the branches anyway.
    """
    from pyspark.sql import Window as W

    fps = winnowing_fingerprints(
        df, k=k, window=window, text_col=text_col, id_col=id_col, fp_int=True
    )
    kept = (
        fps.withColumn("_df", F.count(F.lit(1)).over(W.partitionBy("fp")))
        .filter(F.col("_df") <= max_fp_df)
        .select(id_col, "fp")
    )
    # Row-local pair generation (r13 optimization, guide §2.4 — the
    # item_pairs move): the former fp self-join re-executed the kernel
    # subtree per join side and shipped pair rows through the join;
    # collecting each fp's (max_fp_df-bounded) doc set on the SAME fp
    # exchange the stop-filter window established and exploding the
    # ordered combinations in place yields the identical pair multiset
    # with no join — per-row work stays bounded by the same max_fp_df².
    arr = kept.groupBy("fp").agg(F.sort_array(F.collect_set(id_col)).alias("_xs"))
    return (
        arr.select(
            F.explode(
                F.expr(
                    "flatten(transform(_xs, (x, i) -> "
                    "transform(slice(_xs, i + 2, size(_xs)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("_p")
        )
        .select("_p.doc_a", "_p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(source, lang) corpus report: doc count, token totals, mean
    doc length, and the exact median token count (rank ⌈n/2⌉ under a
    deterministic (n_tokens, doc_id) order — no percentile estimator,
    so the oracle matches bit-for-bit).

    One row-local token count, one shuffle to (source, lang) for both
    the aggregate and the median rank — Catalyst shares the exchange.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col("source"),
        F.col("lang"),
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), _WS)).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("source", "lang").orderBy(F.asc("n_tokens"), F.asc(id_col))
    ranked = base.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy("source", "lang"))
    )
    med = ranked.filter(F.col("_rn") == F.ceil(F.col("_n") / 2)).select(
        "source", "lang", F.col("n_tokens").alias("median_tokens")
    )
    agg = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_tokens"
        ),
    )
    return agg.join(med, ["source", "lang"])


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")


def gopher_feature_cols(text_col: str = "text") -> dict[str, Column]:
    """The Gopher rule features as raw Columns, so callers (the filter
    below, composed pipelines) can inline them into any projection
    without a join — they stay row-local codegen expressions."""
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_words = F.size(toks).cast("long")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return {
        "n_words": n_words,
        "mean_word_len": total_chars.cast("double") / n_words.cast("double"),
        "alpha_ratio": F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
        .cast("long")
        .cast("double")
        / n_words.cast("double"),
        "n_stop_hits": F.size(
            F.filter(toks, lambda t: F.array_contains(stop_arr, t))
        ).cast("long"),
    }


def gopher_kept_expr(
    min_words: int = 40,
    max_words: int = 200,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The keep verdict over already-projected feature columns."""
    return (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("n_stop_hits") >= min_stop_hits)
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 40,
    max_words: int = 200,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021, table A1
    subset): word-count bounds, mean-word-length bounds, minimum fraction
    of words containing an alphabetic character, and a minimum stopword
    hit count. Emits the rule features plus kept 0/1 so downstream can
    audit WHICH rule fired, not just the verdict.

    All features are pure codegen expressions over one tokenization —
    zero shuffle, scan-parallel, no UDF. Ratio rules are double
    divisions of exact integers (both engines compute the identical
    double, so threshold compares can't flip cross-engine).
    """
    feats = gopher_feature_cols(text_col)
    base = df.select(F.col(id_col), *[c.alias(n) for n, c in feats.items()])
    kept = gopher_kept_expr(
        min_words, max_words, min_mean_len, max_mean_len, min_alpha_ratio, min_stop_hits
    )
    return base.withColumn("kept", F.when(kept, F.lit(1)).otherwise(F.lit(0)).cast("long"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set — the retrieval
    scorer tf-idf feeds into (Robertson-Spärck Jones):
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene non-negative
    form). Emits each matching doc's score and rank, top ``k`` only.

    Plan shape: the query terms are a tiny literal filter pushed into
    the term explode (only matching term rows survive the first
    aggregate); df and N and avgdl are broadcast one-row/`|q|`-row
    aggregates; the final top-k is a rank over the scored-docs frame.
    Determinism: avgdl derives from an exact integer token-count sum;
    per-term scores round to 6 decimals AFTER the (3-term) sum; ranks
    tie on doc id. ln parity follows the tfidf_topk precedent (both
    engines' libm agree well inside the rounding).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col), toks.alias("_toks")).select(
        F.col(id_col), "_toks", F.size("_toks").cast("long").alias("_dl")
    )
    base = base.filter(F.col("_dl") > 0)
    stats = base.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("_avgdl"),
    )
    qlits = [str(t) for t in query_terms]
    terms = base.select(
        F.col(id_col), F.col("_dl"), F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(qlits))
    tf = terms.groupBy(id_col, "_dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "_tscore",
            F.col("_idf")
            * (F.col("tf").cast("double") * F.lit(float(k1) + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(float(k1))
                * (
                    F.lit(1.0 - float(b))
                    + F.lit(float(b)) * F.col("_dl").cast("double") / F.col("_avgdl")
                )
            ),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("_tscore"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(id_col), "score", "n_terms_hit", F.col("rank").cast("long").alias("rank"))
    )


def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the repetition/quality signal that separates natural prose (high
    entropy) from boilerplate and keyword stuffing (low): 
    H = −Σ_t (tf_t/dl)·ln(tf_t/dl). Emits (id, dl, n_unique, entropy).

    One explode → one (doc, term) count → one per-doc fold; all
    map-side-combined keyed aggregates, no joins. ln parity follows the
    tfidf/BM25 precedent; the entropy sum rounds to 6 after the fold.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("dl"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
            F.sum(F.col("tf").cast("double") * F.log(F.col("tf").cast("double"))).alias("_tlnt"),
        )
        .select(
            F.col(id_col),
            "dl",
            "n_unique",
            # H = ln(dl) - (Σ tf·ln tf)/dl  (algebraically identical to
            # -Σ p ln p, but one fold over the tf rows and an exact
            # expression both engines reproduce)
            F.round(
                F.log(F.col("dl").cast("double")) - F.col("_tlnt") / F.col("dl").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def phrase_census(
    df: DataFrame,
    n: int = 3,
    min_df: int = 2,
    topk: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate phrase census: the ``topk`` word n-grams that recur
    across the most DISTINCT documents — the phrase-level analog of
    CCNet/RefinedWeb line-frequency boilerplate detection (headers,
    footers, licence blurbs, template stitching repeat verbatim across
    documents; novel prose does not). Emits (phrase, n_docs,
    n_occurrences, df_share) for phrases in ≥ ``min_df`` documents,
    ranked by (n_docs desc, n_occurrences desc, phrase asc).

    A curation run anti-joins these phrases back against the shingled
    corpus to strip or down-weight boilerplate spans — the same
    consumption pattern as docs_line_dedup but robust to documents that
    lack line structure.

    Scale shape: n-gram construction is row-local (zip of the token
    array against its shifted self — no window); occurrences collapse to
    (doc, phrase, count) map-side before the phrase-level aggregate, so
    the shuffle moves per-document phrase vocabularies. The final
    ordering ranks only the df-filtered survivors (a tiny frame under
    any real min_df), and the top-k bound keeps the output fixed-size at
    any corpus scale. The doc-count denominator is a broadcast scalar.
    """
    toks = tokens(text_col)
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, width) for i in range(n)]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    per_doc = (
        df.select(F.col(id_col), F.explode(grams).alias("phrase"))
        .groupBy(id_col, "phrase")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_docs_total = df.select(
        F.count(F.lit(1)).cast("long").alias("_nd")
    )
    census = (
        per_doc.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("c").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_df)
    )
    w = Window.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), F.asc("phrase")
    )
    return (
        census.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= topk)
        .crossJoin(F.broadcast(n_docs_total))
        .select(
            "phrase",
            "n_docs",
            "n_occurrences",
            (
                F.round(F.col("n_docs").cast("double") / F.col("_nd").cast("double"), 6)
                + F.lit(0.0)
            ).alias("df_share"),
        )
    )


def vocab_gini(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Vocabulary-concentration report: per language, the Gini
    coefficient of the token-frequency distribution plus vocab size and
    total token count. Natural language is strongly Zipfian (Gini near
    1); a synthetic or templated sub-corpus shows up as an anomalously
    FLAT distribution (low Gini), and a near-duplicate-polluted one as
    even more concentrated than Zipf predicts — the corpus-level
    fingerprint complementing per-document scores, computed with exact
    integer arithmetic (no log-log regression, no transcendentals, per
    the package determinism contract).

    Gini uses the same ascending-rank formula as revenue_concentration:
    G = 2·Σ(r·tf)/(n·Σtf) − (n+1)/n, ties ranked by token.

    Scale shape: the corpus collapses to (lang, token, tf) with map-side
    combine — the |vocab| frame, orders of magnitude smaller than the
    corpus (Heaps' law). The per-language rank window sorts only that
    vocab frame; everything after is a map-side-combined aggregate to
    one row per language.
    """
    tf = (
        df.select(F.col(lang_col).alias("lang"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("tf").asc(), F.col("tok").asc())
    ranked = tf.withColumn("_r", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum("tf").cast("long").alias("total_tokens"),
            F.sum(F.col("_r") * F.col("tf")).cast("long").alias("_rtf"),
        )
        .select(
            "lang",
            "vocab_size",
            "total_tokens",
            (
                F.round(
                    F.lit(2.0) * F.col("_rtf")
                    / (F.col("vocab_size") * F.col("total_tokens"))
                    - (F.col("vocab_size") + 1) / F.col("vocab_size"),
                    6,
                )
                + F.lit(0.0)
            ).alias("gini"),
        )
    )


_GRAM_MULT = 0x9E3779B97F4A7C15  # odd => multiplication is a bijection mod 2^64


def _gram_mask_kernel(n: int, bit: dict, text_col: str, source_col: str):
    """The ≤62-source fast path of the contamination matrix: same
    whole-batch token-hash + rolling-gram vectorization as
    _gram_hash_kernel, but the source dimension rides as a BITMASK and
    each Arrow batch emits per-gram OR-mask PARTIALS (sorted-run
    bitwise_or.at) — so the one shuffle carries (gram hash, long) and
    the downstream aggregate is bit_or, the same mergeable-bitmap move
    as the WA6 UV operator."""
    import re

    pat = re.compile(r"\s+", re.ASCII)
    mult = _GRAM_MULT

    def gen(batches):
        import numpy as np
        import pandas as pd

        m = np.uint64(mult)
        for pdf in batches:
            tok_lists: list = []
            masks: list = []
            for s, t in zip(pdf[source_col], pdf[text_col]):
                if t is None:
                    continue
                toks = pat.split(t.strip(" "))
                if len(toks) >= n:
                    tok_lists.append(toks)
                    masks.append(bit[s])
            if not tok_lists:
                continue
            lens = np.fromiter(
                (len(x) for x in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            flat = np.asarray(
                [tok for toks in tok_lists for tok in toks], dtype=object
            )
            th = pd.util.hash_array(flat)
            big_n = len(th)
            doc = np.repeat(np.arange(len(lens)), lens)
            w = big_n - n + 1
            g = np.zeros(w, dtype=np.uint64)
            for j in range(n):
                g = g * m + th[j : w + j]
            valid = doc[:w] == doc[n - 1 : n - 1 + w]
            g = g[valid]
            dm = np.asarray(masks, dtype=np.int64)[doc[:w][valid]]
            order = np.argsort(g)
            g, dm = g[order], dm[order]
            bound = np.ones(len(g), dtype=bool)
            if len(g) > 1:
                bound[1:] = g[1:] != g[:-1]
            idx = np.cumsum(bound) - 1
            om = np.zeros((idx[-1] + 1) if len(idx) else 0, dtype=np.int64)
            np.bitwise_or.at(om, idx, dm)
            yield pd.DataFrame({"_gram": g[bound].view(np.int64), "m": om})

    return gen


def _gram_hash_kernel(n: int, text_col: str, source_col: str):
    """Arrow-batched n-gram fingerprint kernel (VERDICT r11 item 3):
    per document, hash the TOKENS once (pandas' C-speed siphash over the
    token array), combine them into n-gram fingerprints with a numpy
    rolling polynomial in wrapping uint64 — no gram STRINGS are ever
    materialized — and emit the per-batch-deduped (source, gram_hash)
    frame. Replaces the JVM zip_with/concat_ws gram-string construction
    whose string building + wide-string shuffle kept
    docs_cross_source_contamination 9.4× behind the DuckDB oracle.
    Tokenization is re.split(r"\\s+") with re.ASCII over the
    space-trimmed text — byte-identical token streams to Spark's
    split(trim(text), '\\s+') and DuckDB's string_split_regex (Java and
    RE2 \\s are both the ASCII class), pinned by
    test_gram_kernel_tokens_match_jvm. Distinct-count semantics are
    preserved modulo 64-bit fingerprint collisions (~|vocab|²/2^65 —
    the exact-hash oracle gate would surface one)."""
    import re

    pat = re.compile(r"\s+", re.ASCII)
    mult = _GRAM_MULT

    def gen(batches):
        import numpy as np
        import pandas as pd

        m = np.uint64(mult)
        for pdf in batches:
            # whole-batch vectorization: ONE hash_array call over the
            # concatenated token stream (per-doc calls pay ~100µs each —
            # 0.5 s of pure call overhead per 5k docs), then the rolling
            # combine and the boundary mask as flat numpy ops
            tok_lists: list = []
            srcs: list = []
            for s, t in zip(pdf[source_col], pdf[text_col]):
                if t is None:
                    continue
                toks = pat.split(t.strip(" "))
                if len(toks) >= n:
                    tok_lists.append(toks)
                    srcs.append(s)
            if not tok_lists:
                continue
            lens = np.fromiter(
                (len(x) for x in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            flat = np.asarray(
                [tok for toks in tok_lists for tok in toks], dtype=object
            )
            th = pd.util.hash_array(flat)
            big_n = len(th)
            doc = np.repeat(np.arange(len(lens)), lens)
            w = big_n - n + 1
            g = np.zeros(w, dtype=np.uint64)
            for j in range(n):
                g = g * m + th[j : w + j]
            # grams spanning a document boundary are artifacts of the
            # concatenation — mask them out
            valid = doc[:w] == doc[n - 1 : n - 1 + w]
            g = g[valid]
            codes, uniq = pd.factorize(np.asarray(srcs, dtype=object))
            sc = codes[doc[:w][valid]]
            # (source, gram) dedup via lexsort + adjacent-diff
            order = np.lexsort((g, sc))
            sc, g = sc[order], g[order]
            keep = np.ones(len(g), dtype=bool)
            if len(g) > 1:
                keep[1:] = (sc[1:] != sc[:-1]) | (g[1:] != g[:-1])
            yield pd.DataFrame(
                {"_src": uniq[sc[keep]], "_gram": g[keep].view(np.int64)}
            )

    return gen


def cross_source_contamination(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
    parallelism: int | None = None,
    force_pairwise: bool = False,
) -> DataFrame:
    """Cross-source n-gram containment matrix: for every ORDERED source
    pair (a, b), the share of a's distinct word n-grams that also occur
    in b — the corpus-level contamination/overlap audit run before
    mixing sources (a high containment of an eval source inside a train
    source is exactly the leak ``decontaminate`` removes doc-by-doc).
    Emits (source_a, source_b, grams_a, shared, containment) for ALL
    ordered pairs, zero-overlap pairs included.

    Scale shape (VERDICT r11 item 3): n-gram fingerprinting is
    ROW-LOCAL inside an Arrow mapInPandas kernel — tokens hashed once
    per batch, n-grams combined as uint64 rolling products, no gram
    strings. With ≤62 sources (one tiny distinct-sources job decides)
    the source dimension rides as a BITMASK: the kernel emits per-gram
    OR-mask partials, ONE shuffle bit_or-merges them per gram hash, a
    second tiny aggregate histograms the masks, and the |masks| rows
    (≤ min(2^s, |gram vocab|) — index-metadata scale) expand to the s²
    matrix driver-side: no pairwise join over data AT ALL, the same
    mergeable-bitmap shape as the WA6 UV operator. Beyond 62 sources
    the general path applies: DISTINCT (source, hash) frame, gram-key
    equi-self-join bounded by pairs-per-gram ≤ |sources|², broadcast
    marginals. The full matrix is |sources|² rows — constant-size
    output at any corpus scale.
    """
    spark = df.sparkSession
    # NULL sources do not participate in the matrix (ADVICE r12): a
    # containment row for an unknown source is meaningless, and the two
    # paths previously disagreed (the bitmask path crashed sorting None
    # against str, the join path emitted a null-keyed row). Filtered
    # identically in BOTH paths.
    base = df.filter(F.col(source_col).isNotNull()).select(
        F.col(source_col), F.col(text_col)
    )
    # a small corpus arrives as one file split; spreading the kernel
    # across cores costs one cheap text shuffle (callers pass the
    # session parallelism). At 100 TB the scan has thousands of splits
    # already and callers leave this None.
    if parallelism:
        base = base.repartition(parallelism)

    # the bit assignment may include zero-gram sources (every doc
    # shorter than n tokens) — harmless, their bit is never set; the
    # OUTPUT below is restricted to gram-emitting sources to match the
    # join path, whose marginals frame only ever sees sources that
    # produced at least one gram (ADVICE r12: grams_a=0 rows divided by
    # zero under ANSI mode while the fallback silently omitted them).
    srcs = sorted(
        r[0]
        for r in base.select(F.col(source_col)).distinct().collect()
    )
    if len(srcs) <= 62 and not force_pairwise:
        bit = {s: 1 << i for i, s in enumerate(srcs)}
        masks = (
            base.mapInPandas(
                _gram_mask_kernel(n, bit, text_col, source_col),
                "_gram long, m long",
            )
            .groupBy("_gram")
            .agg(F.bit_or("m").alias("mask"))
            .groupBy("mask")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .collect()
        )
        s_n = len(srcs)
        grams = [0] * s_n
        shared_m = [[0] * s_n for _ in range(s_n)]
        for r in masks:
            mv, c = int(r["mask"]), int(r["cnt"])
            bits = [i for i in range(s_n) if (mv >> i) & 1]
            for a in bits:
                grams[a] += c
                for b_ in bits:
                    if a != b_:
                        shared_m[a][b_] += c
        # restrict to gram-emitting sources — exactly the sources the
        # join path's marginals frame contains (ADVICE r12)
        emitting = [i for i in range(s_n) if grams[i] > 0]
        rows = [
            (srcs[a], srcs[b_], grams[a], shared_m[a][b_])
            for a in emitting
            for b_ in emitting
            if a != b_
        ]
        out = spark.createDataFrame(
            rows, "source_a string, source_b string, grams_a long, shared long"
        )
        # the division + round stay SPARK expressions so the rounding
        # convention matches the join path (and the oracle) exactly
        return out.select(
            "source_a",
            "source_b",
            "grams_a",
            "shared",
            (
                F.round(
                    F.col("shared").cast("double")
                    / F.col("grams_a").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("containment"),
        )

    from ._cache import eager_persist

    # the distinct (source, hash) frame feeds BOTH the marginals and the
    # self-join — persist it so the kernel + distinct run once, not three
    # times (once per branch side)
    g = eager_persist(
        base.mapInPandas(
            _gram_hash_kernel(n, text_col, source_col), "_src string, _gram long"
        ).distinct()
    )
    marg = g.groupBy("_src").agg(F.count(F.lit(1)).cast("long").alias("_grams"))
    shared = (
        g.alias("a")
        .join(g.alias("b"), F.col("a._gram") == F.col("b._gram"))
        .filter(F.col("a._src") != F.col("b._src"))
        .groupBy(F.col("a._src").alias("_sa"), F.col("b._src").alias("_sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("_shared"))
    )
    pairs = (
        marg.alias("ma")
        .crossJoin(F.broadcast(marg.alias("mb")))
        .filter(F.col("ma._src") != F.col("mb._src"))
    )
    return (
        pairs.join(
            shared,
            (F.col("ma._src") == F.col("_sa")) & (F.col("mb._src") == F.col("_sb")),
            "left",
        )
        .select(
            F.col("ma._src").alias("source_a"),
            F.col("mb._src").alias("source_b"),
            F.col("ma._grams").alias("grams_a"),
            F.coalesce(F.col("_shared"), F.lit(0)).cast("long").alias("shared"),
            (
                F.round(
                    F.coalesce(F.col("_shared"), F.lit(0)).cast("double")
                    / F.col("ma._grams").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("containment"),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer-fertility report per language: how many characters a
    whitespace token vs a BPE-ish token spans, and the BPE/whitespace
    fan-out — the per-language efficiency audit run before fixing a
    token budget (languages the tokenizer fragments hardest dominate
    compute per byte of text; CJK-like or highly-inflected subcorpora
    show up immediately).

    Emits per language: n_docs, total_chars, ws_tokens, bpe_tokens,
    chars_per_ws (= chars/ws), chars_per_bpe, bpe_per_ws. All counts are
    exact longs folded map-side; ratios are single double divisions of
    those longs (round-6 + 0.0) — one corpus scan, one tiny aggregate,
    no explode (both token counts are row-local regexp/size expressions).
    """
    ws_count = F.size(tokens(text_col))
    bpe_count = F.regexp_count(F.col(text_col), F.lit(_BPE_PATTERN))
    per = df.select(
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        ws_count.cast("long").alias("_ws"),
        bpe_count.cast("long").alias("_bpe"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.sum("_ws").cast("long").alias("ws_tokens"),
        F.sum("_bpe").cast("long").alias("bpe_tokens"),
    )
    def ratio(a, b):
        return (
            F.round(F.col(a).cast("double") / F.col(b).cast("double"), 6)
            + F.lit(0.0)
        )
    return agg.select(
        "lang", "n_docs", "total_chars", "ws_tokens", "bpe_tokens",
        ratio("total_chars", "ws_tokens").alias("chars_per_ws"),
        ratio("total_chars", "bpe_tokens").alias("chars_per_bpe"),
        ratio("bpe_tokens", "ws_tokens").alias("bpe_per_ws"),
    )


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """PII exposure report per source: documents containing / total
    occurrences of email addresses and phone numbers (the two patterns
    ``cleaning.redact_pii`` removes) — the governance dashboard that
    decides WHICH sources need the redaction pass at all, and verifies
    its effect afterwards (re-run on cleaned output → all zeros).

    Patterns live in cleaning.py (the Java ∩ RE2 subset both engines
    honor identically). One corpus scan of row-local ``regexp_count``
    expressions folding into a map-side-combined per-source aggregate —
    |sources| rows out at any corpus scale.
    """
    from .cleaning import EMAIL_RE, PHONE_RE

    emails = F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long")
    phones = F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).cast("long")
    per = df.select(
        F.col(source_col).alias("source"),
        emails.alias("_em"),
        phones.alias("_ph"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_em") > 0).cast("long")).cast("long").alias("docs_with_email"),
        F.sum("_em").cast("long").alias("email_hits"),
        F.sum((F.col("_ph") > 0).cast("long")).cast("long").alias("docs_with_phone"),
        F.sum("_ph").cast("long").alias("phone_hits"),
        (
            F.round(
                F.sum(((F.col("_em") > 0) | (F.col("_ph") > 0)).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("pii_doc_share"),
    )


def zipf_fit(
    df: DataFrame,
    min_count: int = 5,
    max_rank: int = 500,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Log-log Zipf fit per language: least-squares slope and R² of
    ln(freq) against ln(rank) over the top-``max_rank`` terms — the
    classic corpus-health diagnostic (natural language fits slope ≈ −1;
    templated or synthetic sub-corpora bend the curve, and the fit
    quality drops).  The parametric complement to ``vocab_gini``'s
    nonparametric concentration score (reference analytics scope:
    SURVEY §2.11 scalar pipelines — this is the corpus-level statistic
    a reference user derives from the same word counts).

    Determinism: like ``lm.bigram_perplexity`` this RELAXES the module's
    no-transcendentals contract — ``ln`` of exact integer ranks/counts,
    combined through ONE fixed closed-form expression per language
    (n·Σxy − Σx·Σy over n·Σx² − (Σx)², same shape for R²), rounded to 6
    decimals; reorder error on ≤ ``max_rank`` unit-scale terms is
    ~1e-12, far inside the rounding.

    Scale shape: the corpus collapses to (lang, term, cnt) with map-side
    combine (the |vocab| frame, Heaps-bounded); the ``min_count`` filter
    runs BEFORE the per-language rank window so the sort only sees
    surviving vocabulary; everything after is one map-side-combined
    aggregate to a |langs|-row frame.
    """
    counts = (
        df.select(
            F.col(lang_col).alias("lang"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= max_rank)
        .select(
            "lang",
            "cnt",
            F.log(F.col("rank").cast("double")).alias("_x"),
            F.log(F.col("cnt").cast("double")).alias("_y"),
        )
    )
    agg = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("cnt").cast("long").alias("fitted_tokens"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_terms").cast("double")
    cov_n = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    # degenerate fits (one term, or all counts equal) -> NULL, not a
    # divide-by-zero: varx_n = 0 kills both, vary_n = 0 kills R² only
    return agg.select(
        "lang",
        "n_terms",
        "fitted_tokens",
        F.when(varx_n != 0, F.round(cov_n / varx_n, 6) + F.lit(0.0)).alias(
            "zipf_slope"
        ),
        F.when(
            (varx_n != 0) & (vary_n != 0),
            F.round(cov_n * cov_n / (varx_n * vary_n), 6) + F.lit(0.0),
        ).alias("zipf_r2"),
    )


def term_burstiness(
    df: DataFrame,
    top_k: int = 40,
    min_df: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fano-factor burstiness of the ``top_k`` highest-frequency terms:
    variance-to-mean ratio of the per-document count across ALL
    documents (zeros included).  Function words sit near the Poisson
    floor (≈ 1 − mean); topical/content words are bursty (≫ 1); a
    boilerplate-polluted corpus shows anomalous burstiness on template
    phrases — the church of Katz (1996), run as a corpus QC report.

    Determinism: exact — with S = Σ tf, Q = Σ tf² (BIGINT sums) and N
    total documents, VMR = Q/S − S/N needs no per-document zero rows and
    only two fixed-order double divisions of exact integers, rounded 6.

    Scale shape: one explode to (doc, term) tf with map-side combine,
    one term-keyed aggregate to the |vocab| frame (S, Q, df are all
    algebraic), ``min_df`` filter BEFORE the single top-k rank window,
    and the doc-count scalar joins in as a broadcast literal — the
    corpus is scanned once and never re-shuffled.
    """
    tf = (
        df.select(F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("_doc", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    stats = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.sum(F.col("tf") * F.col("tf")).cast("long").alias("sq_tf"),
        )
        .filter(F.col("df") >= min_df)
    )
    w = Window.orderBy(F.col("total_tf").desc(), F.col("term").asc())
    ranked = stats.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= top_k
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        ranked.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "rank",
            "df",
            "total_tf",
            (
                F.round(
                    F.col("sq_tf").cast("double") / F.col("total_tf").cast("double")
                    - F.col("total_tf").cast("double") / F.col("n_docs").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("burstiness"),
        )
    )


def kl_divergence_by_source(
    df: DataFrame,
    top_m: int = 2000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution —
    the domain-shift dial a mixture designer reads next to
    ``mixture_weights``/``dsir_weights``: KL(P_source ‖ P_corpus) ≈ 0
    means the source looks like the blend; a large value flags a source
    whose token distribution the mixture underrepresents (CCNet/DSIR
    both rank data by exactly this family of scores).

    The event space is the TOP-``top_m`` corpus terms by (frequency
    desc, term asc) — the standard truncated-vocabulary KL: it bounds
    the float summation at ``top_m`` terms per source (cross-engine
    order drift stays orders of magnitude under the round-6 contract,
    where a full-vocabulary sum would not) AND bounds the per-source
    frame at |sources|·top_m rows regardless of corpus size. Add-one
    smoothing over the restricted space keeps every term's mass finite:

        V = min(top_m, |vocab|)            (the realized event space)
        p = (tf_s + 1) / (N_s + V),  q = (tf_c + 1) / (N_c + V)
        kl = Σ_V  p · ln(p / q)            (rounded 6 after the sum)

    Scale shape: one corpus scan collapses to (source, term) counts
    with map-side combine; the top-M vocabulary is one rank over the
    term-frequency frame (broadcast after truncation); the zero-fill
    cross join is |sources|·M — constant in corpus size. No raw text
    ever shuffles.
    """
    tok = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("term"),
    )
    st = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf_s")
    )
    vocab = (
        st.groupBy("term")
        .agg(F.sum("tf_s").cast("long").alias("tf_c"))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.desc("tf_c"), F.asc("term"))
            ),
        )
        .filter(F.col("_rk") <= top_m)
        .drop("_rk")
    )
    # corpus totals over the restricted space: one tiny aggregate. The
    # smoothing constant is the REALIZED event-space size V = min(top_m,
    # |vocab|) — smoothing with the nominal top_m when the corpus has
    # fewer distinct terms breaks Σp = Σq = 1 and lets the "KL" go
    # negative (Gibbs holds only for proper distributions)
    tot_c = vocab.agg(
        F.sum("tf_c").cast("long").alias("n_c"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    sources = st.select("source").distinct()
    grid = sources.crossJoin(F.broadcast(vocab))
    filled = grid.join(st, ["source", "term"], "left").select(
        "source",
        "term",
        "tf_c",
        F.coalesce(F.col("tf_s"), F.lit(0).cast("long")).alias("tf_s"),
    )
    per_src = filled.groupBy("source").agg(
        F.sum("tf_s").cast("long").alias("n_s"),
        F.sum((F.col("tf_s") > 0).cast("long")).cast("long").alias("n_present"),
    )
    joined = (
        filled.join(per_src, "source")
        .crossJoin(F.broadcast(tot_c))
        .select(
            "source",
            "n_s",
            "n_present",
            (
                (F.col("tf_s").cast("double") + F.lit(1.0))
                / (F.col("n_s").cast("double") + F.col("v").cast("double"))
            ).alias("p"),
            (
                (F.col("tf_c").cast("double") + F.lit(1.0))
                / (F.col("n_c").cast("double") + F.col("v").cast("double"))
            ).alias("q"),
        )
    )
    return (
        joined.groupBy("source", "n_s", "n_present")
        .agg(
            (F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6) + F.lit(0.0)).alias(
                "kl_unigram"
            )
        )
        .select(
            "source",
            F.col("n_s").alias("n_tokens_top"),
            F.col("n_present").alias("n_terms_present"),
            "kl_unigram",
        )
    )


def readability_by_source(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source Flesch-reading-ease profile — the classic readability
    screen a curation pipeline runs next to the Gopher length/symbol
    gates: training text that is uniformly impenetrable (legalese, OCR
    shards) or uniformly trivial both shift this score.

    Per document, from integer regexp counts only:

        words     = |whitespace tokens|          (docs with 0 words drop)
        sentences = max(count('[.!?]+' runs), 1)
        syllables = max(count('[aeiouy]+' runs in lower(text)), words)
                     -- every word contributes ≥ 1 syllable, the usual
                        vowel-group proxy floor
        flesch    = 206.835 − 1.015·words/sentences − 84.6·syllables/words

    Emitted per source: n_docs, mean flesch (rounded 6 after the sum),
    n_easy (score ≥ 60) and n_hard (score < 30) — the integer counts
    make the gating decisions drift-proof, the mean is a small-N sum.

    Scale shape: one scan, three row-local ``regexp_count``s (JVM
    codegen, no Python), then a map-side-combined per-source aggregate;
    output is |sources| rows.
    """
    words = F.size(tokens(text_col)).cast("long")
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"),
        F.lit(1).cast("long"),
    )
    syl_raw = F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")).cast("long")
    per_doc = df.select(
        F.col(source_col).alias("source"),
        words.alias("w"),
        sentences.alias("s"),
        syl_raw.alias("y0"),
    ).filter(F.col("w") > 0)
    syl = F.greatest(F.col("y0"), F.col("w"))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * F.col("w").cast("double") / F.col("s").cast("double")
        - F.lit(84.6) * syl.cast("double") / F.col("w").cast("double")
    )
    scored = per_doc.select("source", flesch.alias("f"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.round(F.sum("f") / F.count(F.lit(1)).cast("double"), 6) + F.lit(0.0)).alias(
            "mean_flesch"
        ),
        F.sum((F.col("f") >= 60.0).cast("long")).cast("long").alias("n_easy"),
        F.sum((F.col("f") < 30.0).cast("long")).cast("long").alias("n_hard"),
    )


# code-marker regex shared by operator and docstring'd for the oracle:
# brace/semicolon/operator punctuation plus the highest-signal keywords
CODE_MARKER_RE = r"[{}();\[\]]|=>|::|\bdef\b|\bimport\b|\breturn\b|\bvoid\b|==|!="


def code_detect_by_source(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source code-vs-prose screen — the routing signal an LLM data
    pipeline needs before mixing (code wants different dedup, quality
    gates and tokenizer settings than prose; StarCoder/The-Stack style
    pipelines split on exactly this kind of marker density).

    Per document, two integer counts: whitespace tokens and
    ``CODE_MARKER_RE`` matches (brackets, statement punctuation, ``=>``
    ``::`` ``==`` ``!=``, and the keywords def/import/return/void).
    A document is code-like when markers·10 ≥ tokens (density ≥ 0.1,
    compared in INTEGERS — no float in the gate). Per source:

        n_docs, n_code, code_ratio = n_code/n_docs (one division),
        marker_density = Σmarkers / Σtokens (one division)

    Scale shape: one scan, two row-local ``regexp_count``s (JVM
    codegen), one map-side-combined aggregate; |sources| output rows.
    """
    toks = F.size(tokens(text_col)).cast("long")
    markers = F.regexp_count(F.col(text_col), F.lit(CODE_MARKER_RE)).cast("long")
    per_doc = df.select(
        F.col(source_col).alias("source"),
        toks.alias("t"),
        markers.alias("m"),
    ).filter(F.col("t") > 0)
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("m") * 10 >= F.col("t")).cast("long")).cast("long").alias("n_code"),
        (
            F.round(
                F.sum((F.col("m") * 10 >= F.col("t")).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("code_ratio"),
        (
            F.round(F.sum("m").cast("double") / F.sum("t").cast("double"), 6)
            + F.lit(0.0)
        ).alias("marker_density"),
    )


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII redaction transform — the scrub step a training pipeline runs
    after ``pii_stats`` finds exposure: emails → ``<EMAIL>``, dashed
    phone numbers → ``<PHONE>`` (same ``cleaning.EMAIL_RE``/``PHONE_RE``
    patterns the stats op counts, so the two ops agree on what counts as
    a hit). Emits per document the redaction counts and an md5 of the
    redacted text — the compact proof-of-transform (carrying full texts
    through the gate would dominate the output; the hash pins every
    byte of the result anyway).

    Redaction order is fixed (emails first, then phones) so the
    composition is deterministic even where patterns could overlap.

    Scale shape: one scan, three row-local regexp ops + md5 — JVM
    codegen end to end, no shuffle at all (the per-doc output keeps the
    scan's partitioning).
    """
    from .cleaning import EMAIL_RE, PHONE_RE

    emails = F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long")
    phones = F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus-global
    top-``vocab_size`` vocabulary (count desc, term asc — the stable
    order vocabulary() uses): what fraction of a source's token
    OCCURRENCES a tokenizer trained on the whole corpus would map to
    <unk>. The drift screen run before mixing a new source into a
    training corpus — high OOV = vocabulary mismatch that token
    statistics (docs_token_quantiles) don't see.

    Plan shape: one explode collapses immediately to (source, term)
    counts (map-side combined); the global vocabulary derives from a
    second roll-up of that SAME frame (no second corpus scan), and the
    ranking window runs on the distinct-term frame only — bounded by
    vocabulary size, never corpus size (the vocabulary() argument).
    The membership join broadcasts the top-k term list.
    """
    terms = df.select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")
    st = terms.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("c"))
    gl = st.groupBy("term").agg(F.sum("c").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    vocab = (
        gl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(vocab_size))
        .select("term", F.lit(1).alias("_in_v"))
    )
    return (
        st.join(F.broadcast(vocab), "term", "left")
        .groupBy(group_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_in_v").isNull(), F.col("c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 6
            )
            + F.lit(0.0),
        )
    )
