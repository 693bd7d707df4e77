"""Skew-mitigation utilities (SURVEY §2.5 WA4, §4; scale contract).

The reference hand-salts its hot-key PV count (PageViewApp_2.java:63-157).
In Spark, *aggregation* skew is already solved by partial (map-side)
aggregation, and *join* skew by AQE's skew-join splitting — so these
helpers exist for the remaining case: a shuffle join against a skewed key
set where AQE can't act (e.g. a non-AQE environment, or broadcast is
impossible and one key dominates).

Pattern: salt the skewed (big) side N ways, replicate the small side N
times, join on (key, salt) — each hot key's rows spread over N tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "replicate_for_salt", "salted_join"]


def with_salt(df: DataFrame, n: int, salt_col: str = "_salt") -> DataFrame:
    """Random salt in [0, n) (the big/skewed side)."""
    return df.withColumn(salt_col, (F.rand(seed=42) * n).cast("int"))


def replicate_for_salt(df: DataFrame, n: int, salt_col: str = "_salt") -> DataFrame:
    """Explode each row n ways (the small side) so every salt matches."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    big: DataFrame, small: DataFrame, on: list[str], n: int, how: str = "inner"
) -> DataFrame:
    """Equi-join with an n-way salt on the join key: hot keys in ``big``
    spread across n tasks at the cost of replicating ``small`` n times."""
    salted_big = with_salt(big, n)
    salted_small = replicate_for_salt(small, n)
    out = salted_big.join(salted_small, [*on, "_salt"], how)
    return out.drop("_salt")
