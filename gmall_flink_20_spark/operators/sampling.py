"""Deterministic corpus sampling — the curation primitive a 100 TB
training pipeline runs constantly ("keep 50% of English web, 12% of X").

Spark-first: sampling is a pure FILTER on a salted 60-bit md5 hash of
the row key — zero shuffle, scan-parallel, reproducible across runs,
engines, and retries (unlike ``df.sample``, whose output depends on
partitioning), and composable: two samples with different salts are
independent; the same salt at a higher rate is a strict superset, so a
pipeline can widen a sample without invalidating earlier work.

The hash idiom (``conv(substr(md5(..),1,15),16,10)`` ≡ DuckDB
``CAST(concat('0x',...) AS BIGINT)``) is the repo's established
cross-engine 60-bit uniform; thresholds are integer literals computed
once driver-side, so engine float-cast rounding can never flip a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "HASH_SPACE",
    "sample_hash",
    "hash_sample",
    "stratified_sample",
    "weighted_sample",
    "per_group_cap",
    "lang_balance",
    "split_assign",
    "negative_samples",
]

HASH_SPACE = 1 << 60  # 15 hex chars of md5


def sample_hash(key_col: str, salt: str) -> Column:
    """Uniform in [0, 2^60): the salted sampling coordinate of a row."""
    return F.expr(
        "CAST(conv(substr(md5(CAST("
        f"{key_col} AS STRING) || ':{salt}'), 1, 15), 16, 10) AS BIGINT)"
    )


def threshold(rate: float) -> int:
    """rate → integer keep-threshold. Computed driver-side once so both
    engines compare against the identical literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * HASH_SPACE)


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash."""
    return df.filter(sample_hash(key_col, salt) < F.lit(threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum rates ("50% of en, 12.5% of zh") as ONE filter pass:
    the stratum→threshold map folds into a CASE expression, so the plan
    stays a single scan with the predicate pushed down — no join, no
    shuffle, regardless of how many strata are configured."""
    thr: Column = F.lit(threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(threshold(rate))).otherwise(
            thr
        )
    return df.filter(sample_hash(key_col, salt) < thr)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row gets priority ln(u)/w with u the row's
    salted 60-bit md5 uniform mapped into (0,1); the k LARGEST
    priorities are the sample, each row's inclusion probability
    proportional to its weight.

    Scale shape: the priority is a pure row-local expression (no
    shuffle), and top-k lowers to TakeOrdered — per-partition heaps plus
    a k-row driver merge, never a global sort. Deterministic across
    runs, engines, partitionings, and retries; ties broken by key.
    """
    u = (sample_hash(key_col, salt).cast("double") + F.lit(1.0)) / F.lit(
        float(HASH_SPACE) + 2.0
    )
    pri = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_pri")
    )


def per_group_cap(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
    fanout: int = 64,
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by deterministic salted-
    hash priority — the domain-rebalancing cap every web-scale corpus
    applies ("no domain contributes more than N documents").

    Exact and reproducible: the kept set is the k smallest (priority,
    key) rows of each group, independent of partitioning and retries.

    Skew is the scale hazard: a plain row_number over the group key puts
    a monster domain's every row in ONE task. This runs TWO-LEVEL exact
    top-k instead: rows first rank within (group, key-hash sub-bucket) —
    ``fanout`` parallel tasks per group — and only each sub-bucket's top
    k (≤ fanout·k rows per group, independent of group size) reach the
    final per-group rank. Any global top-k row is necessarily top-k in
    its sub-bucket, so the two-phase result is exactly the one-phase
    result with the heavy window input bounded.
    """
    from pyspark.sql import Window

    pri = sample_hash(key_col, salt)
    sub = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(fanout))
    w1 = Window.partitionBy(group_col, "_sub").orderBy("_pri", key_col)
    w2 = Window.partitionBy(group_col).orderBy("_pri", key_col)
    return (
        df.withColumn("_pri", pri)
        .withColumn("_sub", sub)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_pri", "_sub", "_r1", "_r2")
    )


def lang_balance(
    df: DataFrame,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "balance",
    fanout: int = 64,
) -> DataFrame:
    """Balance the corpus language mixture: cap every language at the
    SMALLEST language's document count, chosen by salted-hash priority —
    the uniform-mixture resampling multilingual corpora apply so one
    dominant language (English at ~half of web text) doesn't drown the
    rest during training.

    Unlike ``per_group_cap`` the cap is DATA-DERIVED: one tiny
    per-language count aggregate reduces to a single min row, broadcast
    back via crossJoin (the scalar-broadcast idiom), so the plan stays
    fully declarative — no driver-side collect of the cap.

    Skew bound (same two-level argument as per_group_cap): rows rank
    first inside ``fanout`` hash sub-buckets per language, and only each
    sub-bucket's top-cap rows reach the per-language rank, so the heavy
    window's input is ≤ fanout·cap rows per language regardless of how
    large the dominant language is. Any global top-cap row is top-cap in
    its sub-bucket, so the result is exactly the one-phase result.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    cap = counts.agg(F.min("_n").cast("long").alias("_cap"))
    from pyspark.sql import Window

    pri = sample_hash(key_col, salt)
    sub = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(fanout))
    w1 = Window.partitionBy(group_col, "_sub").orderBy("_pri", key_col)
    w2 = Window.partitionBy(group_col).orderBy("_pri", key_col)
    return (
        df.crossJoin(F.broadcast(cap))
        .withColumn("_pri", pri)
        .withColumn("_sub", sub)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("_cap"))
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("_cap"))
        .drop("_pri", "_sub", "_r1", "_r2", "_cap")
    )


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row lands in
    exactly one named split by its salted hash coordinate against
    cumulative integer thresholds — reproducible across engines, retries
    and partitionings, and STABLE under corpus growth (a row's split
    never changes when other rows are added, unlike ntile/ratio splits).

    Row-local (zero shuffle, pushable); fractions must sum to 1.
    Emits the input plus a ``split`` column.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = sample_hash(key_col, salt)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def negative_samples(
    df: DataFrame,
    k: int = 3,
    key_col: str = "doc_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor row draws ``k`` pseudo-random negative keys from the corpus
    id space by salted hash — reproducible (no RNG state), row-local
    generation, one broadcast of the single-row id-bound aggregate. A
    draw that hits the anchor itself steps to the next slot (documented,
    mirrored by the oracle), so negatives are always ≠ anchor.

    Emits (anchor key, slot, neg id). Assumes keys are dense-ish
    [0, max]; at 100 TB with sparse ids, join slot hashes against a
    precomputed id index instead (same plan plus one equi-join).
    """
    bounds = df.agg((F.max(F.col(key_col)).cast("long") + 1).alias("_n_ids"))
    slots = df.select(F.col(key_col)).crossJoin(F.broadcast(bounds)).select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(int(k))])).alias("slot"),
        F.col("_n_ids"),
    )
    draw = F.pmod(
        F.expr(
            "CAST(conv(substr(md5(CAST("
            f"{key_col} AS STRING) || ':' || CAST(slot AS STRING) || ':{salt}'"
            "), 1, 15), 16, 10) AS BIGINT)"
        ),
        F.col("_n_ids"),
    )
    return slots.select(
        F.col(key_col),
        F.col("slot").cast("long").alias("slot"),
        F.when(draw == F.col(key_col), F.pmod(draw + 1, F.col("_n_ids")))
        .otherwise(draw)
        .cast("long")
        .alias("neg_id"),
    )
