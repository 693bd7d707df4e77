"""End-to-end training-corpus curation — the composition the individual
text/dedup operators exist for.

One pass selects the documents worth keeping: language filter, length
floor, stopword-ratio floor (quality), and exact-duplicate collapse to
the lowest-id keeper. The whole pipeline is a SINGLE scan of the corpus:
quality and language features are row-local column expressions, and the
dup-keeper decision is one window over the content fingerprint — so at
100 TB this costs one read plus one shuffle (on md5(text), a uniform
key), regardless of how many filters compose on top.

(Reference scope note: the reference has no corpus operators at all —
this is the beyond-reference training-data-pipeline surface from the
build brief, composed from operators/text.py + operators/dedup.py
semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import LANG_MARKERS, tokens

__all__ = [
    "corpus_select",
    "decontaminate",
    "curation_pipeline",
    "corpus_build",
    "corpus_health_report",
    "mixture_weights",
]


def corpus_select(
    df: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.04,
    stopwords: tuple[str, ...] = ("the", "a", "and", "of", "to", "in"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curated (doc_id, n_tokens, stopword_ratio, lang_guess) selection.

    Keeps a document iff it (a) is the lowest-id copy of its exact
    content group, (b) language-IDs as ``lang``, (c) has at least
    ``min_tokens`` tokens, and (d) has stopword density at or above
    ``min_stopword_ratio``. Ratio thresholds compare double divisions of
    exact integers — engine-independent.
    """
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")

    # language argmax (same fold as text.lang_id: first language in
    # marker order wins ties, 'und' when nothing fires)
    scores = {
        lg: F.regexp_count(F.col(text_col), F.lit(r"\b(" + "|".join(ws) + r")\b")).cast("long")
        for lg, ws in LANG_MARKERS.items()
    }
    max_score = None
    for s in scores.values():
        max_score = s if max_score is None else F.greatest(max_score, s)
    guess = F.lit("und")
    for lg in reversed(list(scores)):
        guess = F.when((scores[lg] == max_score) & (max_score > 0), F.lit(lg)).otherwise(guess)

    keeper_rn = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col).cast("binary"))).orderBy(id_col)
    )
    feats = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        guess.alias("lang_guess"),
        keeper_rn.alias("_rn"),
    )
    return (
        feats.filter(
            (F.col("_rn") == 1)
            & (F.col("lang_guess") == lang)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
        )
        .drop("_rn")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    word ``n``-gram with a benchmark (eval) document — the standard
    n-gram-overlap test-set-leak filter applied before training.

    Output: one row per corpus document with the count of distinct
    benchmark-overlapping n-grams and a ``contaminated`` flag.

    Plan shape for 100 TB: corpus grams are one explode + distinct —
    never joined to themselves; the benchmark side (eval suites are
    small: thousands of docs, millions of grams) is deduped and
    BROADCAST, so the contamination check is a map-side hash probe with
    no shuffle of the corpus gram stream beyond the per-doc distinct.
    The gram key is md5 (portable to the DuckDB oracle); at production
    scale swap for xxhash64 — same plan shape.
    """

    def grams(df: DataFrame) -> DataFrame:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        base = df.select(F.col(id_col), toks.alias("toks")).filter(
            F.size("toks") >= n
        )
        return (
            base.select(
                F.col(id_col),
                F.explode(F.sequence(F.lit(0), F.size("toks") - n)).alias("i"),
                F.col("toks"),
            )
            .select(
                F.col(id_col),
                F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at("toks", F.col("i") + j + 1) for j in range(n)],
                    ).cast("binary")
                ).alias("h"),
            )
            .distinct()
        )

    corpus_grams = grams(corpus)
    bench_grams = grams(benchmark).select("h").distinct()
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def curation_pipeline(
    df: DataFrame,
    cap_per_source: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """The end-to-end curation pass as ONE declarative plan: Gopher rule
    gate → exact-dedup (keep the lowest-id copy of each content group) →
    per-domain cap. A corpus team runs exactly this chain before
    training; composing it as a single DataFrame lets Catalyst pipeline
    the stages — the rule gate folds into the scan's filter, the dedup
    window and the cap windows are the only exchanges.

    Emits (id, group, n_words) for the surviving documents.

    Scale shape: rules are row-local codegen (no pre-filter shuffle of
    dropped rows — they die at the scan), dedup shuffles once on the
    content hash, the cap runs the skew-bounded two-level top-k from
    ``sampling.per_group_cap``.
    """
    from pyspark.sql import Window

    from .sampling import per_group_cap
    from .text import gopher_feature_cols, gopher_kept_expr

    feats = gopher_feature_cols(text_col)
    gated = (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.md5(F.col(text_col).cast("binary")).alias("_fp"),
            *[c.alias(n) for n, c in feats.items()],
        )
        .filter(gopher_kept_expr())
        .select(F.col(id_col), F.col(group_col), "_fp", "n_words")
    )
    w = Window.partitionBy("_fp")
    deduped = (
        gated.withColumn("_keeper", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keeper"))
        .select(F.col(id_col), F.col(group_col), "n_words")
    )
    return per_group_cap(deduped, cap_per_source, group_col=group_col, key_col=id_col)


def mixture_weights(
    df: DataFrame,
    budget_frac: float = 0.25,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain sampling weights to hit a global token budget — the
    mixture-planning step before a training run ("sample each domain so
    the total is B tokens, no domain above its equal share").

    The budget is ``budget_frac`` of the corpus's total tokens, split
    equally across domains; each domain's weight is
    ``min(1, per_domain_budget / domain_tokens)`` — undersized domains
    keep everything (weight 1), oversized ones are down-sampled
    proportionally. Emits per domain: document count, token count, the
    sampling weight, and the expected token yield.

    Scale shape: one map-side-combined aggregate over (domain) — token
    counting is a row-local ``size(split(...))`` — then a one-row total
    broadcast back via crossJoin. Output is |domains| rows; the weights
    feed ``hash_sample``-style filters downstream, so planning never
    touches the corpus twice. All arithmetic is a fixed-order chain of
    double operations on exact longs (bit-identical across engines).
    """
    per = (
        df.select(F.col(group_col), F.size(tokens(text_col)).cast("long").alias("_nt"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nsrc"),
    )
    weight = F.least(
        F.lit(1.0),
        F.col("_total").cast("double")
        * F.lit(float(budget_frac))
        / F.col("_nsrc").cast("double")
        / F.col("n_tokens").cast("double"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("weight", weight)
        .withColumn("expected_tokens", F.col("weight") * F.col("n_tokens").cast("double"))
        .drop("_total", "_nsrc")
    )


def corpus_build(
    corpus: DataFrame,
    benchmark: DataFrame,
    cap_per_source: int = 10,
    ngram: int = 5,
    fractions: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """The full corpus-build capstone as ONE declarative plan:
    Gopher gate → exact dedup → benchmark DECONTAMINATION (anti-join on
    the broadcast benchmark-gram set, so removed leaks are backfilled by
    the later cap) → per-domain cap → train/val/test split assignment.
    Emits (id, group, n_words, split) for the documents that would ship
    to training.

    Stage order is the one a corpus team wants: decontamination runs
    BEFORE the cap so a leaked document never consumes a domain slot,
    and the split is assigned last so every surviving doc gets exactly
    one split. Catalyst pipelines the stages: the rules fold into the
    scan filter, the dedup window and the cap's two-level rank are the
    keyed exchanges, the benchmark grams and the split thresholds are
    broadcast/literal. The gated+deduped survivors are PERSISTED before
    the decontamination stage — they feed both anti-join sides (the doc
    rows and their gram probe), and without the cache each branch would
    re-scan and re-gate the corpus (house ``eager_persist`` contract:
    the caller owns cache lifetime until the result materializes).
    """
    from pyspark.sql import Window

    from ._cache import eager_persist
    from .sampling import per_group_cap, split_assign
    from .text import gopher_feature_cols, gopher_kept_expr

    feats = gopher_feature_cols(text_col)
    gated = (
        corpus.select(
            F.col(id_col),
            F.col(group_col),
            F.col(text_col),
            F.md5(F.col(text_col).cast("binary")).alias("_fp"),
            *[c.alias(n) for n, c in feats.items()],
        )
        .filter(gopher_kept_expr())
        .select(F.col(id_col), F.col(group_col), F.col(text_col), "_fp", "n_words")
    )
    w = Window.partitionBy("_fp")
    deduped = eager_persist(
        gated.withColumn("_keeper", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keeper"))
        .select(F.col(id_col), F.col(group_col), F.col(text_col), "n_words")
    )
    # contaminated ids: any shared n-gram with the broadcast benchmark set
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def _grams(df: DataFrame) -> DataFrame:
        base = df.select(F.col(id_col), toks.alias("toks")).filter(
            F.size("toks") >= ngram
        )
        return base.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {ngram}), "
                    f"i -> md5(cast(array_join(slice(toks, i + 1, {ngram}), ' ') as binary)))"
                )
            ).alias("h"),
        ).distinct()

    bench_grams = _grams(benchmark).select("h").distinct()
    clean = deduped.join(
        _grams(deduped).join(F.broadcast(bench_grams), "h").select(id_col).distinct(),
        id_col,
        "left_anti",
    ).select(F.col(id_col), F.col(group_col), "n_words")
    capped = per_group_cap(
        clean, cap_per_source, group_col=group_col, key_col=id_col
    )
    fr = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    return split_assign(capped, fr, key_col=id_col)


def corpus_health_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The one-row corpus health dashboard a data team reads before a
    training run: total docs, exact-duplicate rate, Gopher-gate pass
    rate, benchmark-contamination rate, and mean doc length — each an
    integer count over the same single corpus projection (rates derive
    from the counts with an identical expression tree in the oracle).

    Plan: ONE pass computes the row-local signals (content hash, Gopher
    verdict, token count); the duplicate count needs one keyed window
    on the hash, the contamination flag one broadcast gram probe; the
    final report is a single global aggregate.
    """
    from pyspark.sql import Window

    from ._cache import eager_persist
    from .text import gopher_feature_cols, gopher_kept_expr

    feats = gopher_feature_cols(text_col)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = eager_persist(
        corpus.select(
            F.col(id_col),
            F.col(text_col),
            F.md5(F.col(text_col).cast("binary")).alias("_fp"),
            *[c.alias(n) for n, c in feats.items()],
        ).withColumn("_kept", gopher_kept_expr())
    )
    w = Window.partitionBy("_fp")
    flagged = base.withColumn("_is_dup", (F.count(F.lit(1)).over(w) > 1))

    def _grams(df: DataFrame) -> DataFrame:
        b = df.select(F.col(id_col), toks.alias("toks")).filter(
            F.size("toks") >= ngram
        )
        return b.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {ngram}), "
                    f"i -> md5(cast(array_join(slice(toks, i + 1, {ngram}), ' ') as binary)))"
                )
            ).alias("h"),
        ).distinct()

    bench_grams = _grams(benchmark).select("h").distinct()
    contam_ids = (
        _grams(base)
        .join(F.broadcast(bench_grams), "h")
        .select(id_col)
        .distinct()
        .withColumn("_contam", F.lit(True))
    )
    full = flagged.join(contam_ids, id_col, "left")
    n = F.count(F.lit(1))
    return full.agg(
        n.cast("long").alias("n_docs"),
        F.sum(F.when(F.col("_is_dup"), 1).otherwise(0)).cast("long").alias("n_dup_docs"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).cast("long").alias("n_gate_pass"),
        F.sum(F.when(F.col("_contam").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.round(
            F.sum(F.col("n_words").cast("double")) / n.cast("double"), 6
        ).alias("mean_words"),
    )
