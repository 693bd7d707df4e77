"""Multi-dimensional data layout: Z-order (Morton) clustering.

Partition pruning handles ONE dimension; queries that filter on two
(user AND item, lat AND lon) read everything under single-column
layouts. Interleaving the key bits (Morton order) and range-writing on
the interleaved value gives every file a small bounding box in BOTH
dimensions, so min/max footer stats prune scans on either predicate —
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

The z-value is a pure codegen bit expression (no UDF); the write path is
``repartitionByRange(zvalue)`` — Spark's range partitioner samples the
distribution and assigns contiguous z-ranges to files, which IS the
distributed form of the global sort the exact audit query uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_file_stats"]


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: bit b of x lands at position 2b, bit b of y at
    2b+1. Monotone within each dimension, so range-partitioning the
    z-value bounds BOTH dimensions per file. Codegen'd shift/mask sum —
    no UDF, no join. Keys wider than ``bits`` bits alias (the caller
    picks ``bits`` from the key domain)."""
    xs = x.cast("long")
    ys = y.cast("long")
    out = F.lit(0).cast("long")
    for b in range(int(bits)):
        out = (
            out
            + F.shiftleft(F.shiftright(xs, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(ys, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return out


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Audit of what a z-ordered write would produce: rows are laid out
    in Morton order, cut into ``n_files`` equal files, and each file
    reports its row count and bounding box in both dimensions plus the
    box area — the quantity min/max skipping prunes on. Small areas on
    BOTH axes are the whole point; a single-column sort gives tight
    boxes on one axis and full-range boxes on the other.

    This is the EXACT form (one global ntile sort, engine-reproducible
    for the oracle gate); the production write path is
    ``io_sinks.write_zordered`` — ``repartitionByRange`` on the same
    z-value, which distributes the sort and writes real files whose
    footer stats make the pruning automatic.
    """
    z = zvalue(F.col(x_col), F.col(y_col), bits).alias("_z")
    order = [F.col("_z").asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.orderBy(*order)
    return (
        df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"), z,
                  *([F.col(tiebreak_col)] if tiebreak_col else []))
        .withColumn("file_id", F.ntile(n_files).over(w).cast("long"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_x").cast("long").alias("min_x"),
            F.max("_x").cast("long").alias("max_x"),
            F.min("_y").cast("long").alias("min_y"),
            F.max("_y").cast("long").alias("max_y"),
        )
        .select(
            "file_id",
            "n_rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
            (
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            )
            .cast("long")
            .alias("box_area"),
        )
    )
