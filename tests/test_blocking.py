"""Bounded triangle-partitioned self-join (operators/blocking.py):
exact all-pairs membership + the per-task pair bound on a skewed block."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from gmall_flink_20_spark.operators import ann, blocking, dedup


def _mkdf(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for blk, n in sizes.items():
        for _ in range(n):
            rows.append((blk, i, float(i % 7)))
            i += 1
    return spark.createDataFrame(rows, "blk string, id long, payload double")


def test_bounded_pairs_exact_membership_and_task_bound(spark):
    # one monster block (quadratic if unbounded), two small ones
    df = _mkdf(spark, {"big": 250, "s1": 8, "s2": 1})
    cap = 50
    got = blocking.bounded_block_pairs(df, ["blk"], "id", cap_rows=cap, keep_task_cols=True)
    rows = got.collect()

    exp = set()
    base = {r.id: r.blk for r in df.collect()}
    by_blk: dict[str, list[int]] = {}
    for rid, blk in base.items():
        by_blk.setdefault(blk, []).append(rid)
    for ids in by_blk.values():
        exp |= {(a, b) for a, b in combinations(sorted(ids), 2)}

    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs))  # no duplicates
    assert set(pairs) == exp  # exact all-pairs membership
    assert all(r.id_a < r.id_b for r in rows)  # normalized orientation

    # per-task bound: hashed sub-groups are ~cap rows, so each (blk, i, j)
    # task evaluates ~cap^2 pairs; allow 4x slack for hash imbalance
    per_task: dict[tuple, int] = {}
    for r in rows:
        per_task[(r.blk, r._i, r._j)] = per_task.get((r.blk, r._i, r._j), 0) + 1
    assert max(per_task.values()) <= 4 * cap * cap
    # the monster block actually fanned out over multiple tasks
    big_tasks = {k for k in per_task if k[0] == "big"}
    assert len(big_tasks) >= 10  # G=5 -> 15 triangle tasks


def test_jaccard_blocked_capped_equals_uncapped(spark):
    rows = [(i, "en", "web", f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4} tail{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    uncapped = {
        (r.doc_a, r.doc_b, r.inter_sz, r.union_sz)
        for r in dedup.jaccard_blocked(df, n=1, block_cap_rows=10**9).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.inter_sz, r.union_sz)
        for r in dedup.jaccard_blocked(df, n=1, block_cap_rows=16).collect()
    }
    assert capped == uncapped and len(capped) > 0


def test_cosine_neardup_capped_equals_uncapped(spark):
    rows = [
        (i, i % 2, [float(i % 5 + 1), float((i + 1) % 3 + 1), 1.0])
        for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    uncapped = {
        (r.vec_a, r.vec_b)
        for r in ann.cosine_near_dup_blocked(emb, 0.95, block_cap_rows=10**9).collect()
    }
    capped = {
        (r.vec_a, r.vec_b)
        for r in ann.cosine_near_dup_blocked(emb, 0.95, block_cap_rows=12).collect()
    }
    assert capped == uncapped and len(capped) > 0
