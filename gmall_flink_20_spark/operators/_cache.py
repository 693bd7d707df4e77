"""Self-join input caching.

A persisted frame that feeds BOTH sides of a self-join must be
materialized before the join job runs: Spark usually broadcasts one side
(no exchange to reuse), so with a lazy persist the two sides race to
populate the cache and each computes the full lineage. Materializing
eagerly costs one small job and halves the dominant compute of every
banded/blocked pair operator here (measured ~2× on the LSH path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    df.count()  # materialize now so both join sides read the cache
    return df
