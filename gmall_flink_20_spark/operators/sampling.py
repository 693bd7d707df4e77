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

__all__ = ["HASH_SPACE", "sample_hash", "hash_sample", "stratified_sample"]

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
