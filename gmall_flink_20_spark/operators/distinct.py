"""Distinct-count operators (SURVEY.md §2.5 WA5/WA6 — UV).

Reference parity:
- WA5 exact UV: full-window HashSet of userIds per tumbling hour
  (UniqueVisitorApp.java:53-79).
- WA6 approximate UV: hand-rolled Bloom filter over a Redis bitmap with a
  per-element FIRE_AND_PURGE trigger (UniqueVisitorApp2.java:71-168).

Spark-first design: WA5 is ``countDistinct`` (expands to a two-phase
distinct aggregate — shuffle on (window, userId) partials, then merge);
WA6's intent (memory-bounded approximate distinct at scale) is exactly
HyperLogLog++, built in as ``approx_count_distinct`` — constant memory per
window regardless of cardinality, mergeable across executors, no external
bitmap service needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unique_count",
    "approx_unique_count",
    "approx_unique_count_checked",
    "bitmap_fragments",
    "bitmap_census",
    "bitmap_unique_count",
]


def unique_count(
    df: DataFrame, ts_col: str, size: str, id_col: str, alias: str = "uv"
) -> DataFrame:
    """Exact distinct ``id_col`` per tumbling window."""
    return (
        df.groupBy(F.window(ts_col, size).alias("w"))
        .agg(F.countDistinct(id_col).alias(alias))
        .withColumn("window_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )


def approx_unique_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    id_col: str,
    rsd: float = 0.05,
    alias: str = "uv_approx",
) -> DataFrame:
    """HLL++ distinct per tumbling window (replaces the reference's
    Redis-bitmap Bloom filter, UniqueVisitorApp2.java:93-168)."""
    return (
        df.groupBy(F.window(ts_col, size).alias("w"))
        .agg(F.approx_count_distinct(id_col, rsd).alias(alias))
        .withColumn("window_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )


def approx_unique_count_checked(
    df: DataFrame,
    ts_col: str,
    size: str,
    id_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """WA6 with a value gate: per window, the exact UV plus a boolean
    asserting the HLL++ estimate is within max(3, 3·rsd·exact) of it.

    The estimate itself is estimator-specific (no engine-independent
    oracle exists), but this error-bound form IS oracle-checkable: the
    SQL oracle emits the exact UV and literal TRUE, so a hash match
    proves the bound held for every window. The absolute floor of 3
    covers the linear-counting range (tiny windows), where error is a
    few hash collisions rather than the relative rsd — 3·rsd·uv alone
    would demand an exact estimate whenever uv < 1/(3·rsd)."""
    w = df.groupBy(F.window(ts_col, size).alias("w")).agg(
        F.countDistinct(id_col).alias("uv"),
        F.approx_count_distinct(id_col, rsd).alias("_hll"),
    )
    return (
        w.withColumn("window_end_s", F.col("w.end").cast("long"))
        .withColumn(
            "hll_within_bound",
            F.abs(F.col("_hll") - F.col("uv"))
            <= F.greatest(F.lit(3.0), F.lit(3 * rsd) * F.col("uv")),
        )
        .drop("w", "_hll")
    )


def bitmap_fragments(
    df: DataFrame, ts_col: str, size: str, id_col: str
) -> DataFrame:
    """EXACT-bitmap UV state: 64-bit bitmap fragments per (window,
    bucket), keeping the reference's SETBIT/BITCOUNT state shape
    (UniqueVisitorApp2.java:93-146) while upgrading its accuracy: the
    reference sets the bit at a MyBloomFilter hash of userId masked to
    2^30 (collision-prone, approximate), whereas this operator indexes
    bits by the raw id — exact, strictly better, same bitmap state.
    Here the id space shards into 64-id buckets (bucket = id >> 6) and
    each fragment is one long: bit (id & 63) set iff that id appeared
    in the window.

    Exactness without a distinct aggregate: OR is idempotent, so
    duplicate ids collapse bit-for-bit — the same reason SETBIT is
    retry- and duplicate-safe. Fragments merge associatively (bit_or),
    so partial bitmaps combine map-side, across micro-batches, and
    across executors; state is |distinct ids|/64 longs per window
    (the bitmap's memory bound), never a per-id hash set.

    Requires non-negative ids (ours are synthetic non-negative longs;
    Redis SETBIT has the same constraint — offsets are unsigned)."""
    # SQL expr: the Python shiftleft() only takes a literal shift count
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({id_col}, 64) AS INT))")
    return (
        df.groupBy(
            F.window(ts_col, size).alias("w"),
            F.shiftright(F.col(id_col).cast("long"), 6).alias("bucket"),
        )
        .agg(F.bit_or(mask).alias("bits"))
        .withColumn("window_end_s", F.col("w.end").cast("long"))
        .drop("w")
    )


def bitmap_census(fragments: DataFrame, alias: str = "uv") -> DataFrame:
    """Exact UV per window from bitmap fragments: OR-merge any
    duplicate (window, bucket) fragments (append logs, retried
    batches), then popcount-sum — Redis BITCOUNT over the sharded
    bitmap. Both steps are one shuffle each on keys that shrink with
    every stage."""
    return (
        fragments.groupBy("window_end_s", "bucket")
        .agg(F.bit_or("bits").alias("bits"))
        .groupBy("window_end_s")
        .agg(F.sum(F.bit_count("bits")).cast("long").alias(alias))
    )


def bitmap_unique_count(
    df: DataFrame, ts_col: str, size: str, id_col: str, alias: str = "uv"
) -> DataFrame:
    """WA6's Redis-bitmap UV, batch form: fragment + census in one
    plan. Byte-equal to ``unique_count`` (gated against the exact UV
    oracle) while carrying bitmap state instead of an id set: the
    shuffle volume is one long per 64 ids per window — at 100 TB the
    difference between shuffling every distinct id and 1/64th of
    them, with partial aggregation collapsing repeats map-side."""
    return bitmap_census(bitmap_fragments(df, ts_col, size, id_col), alias)
