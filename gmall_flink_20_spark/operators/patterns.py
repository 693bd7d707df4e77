"""Pattern detection — login-fail family (SURVEY.md §2.8, C1–C4) and the
order-timeout state machine (§2.7 J3/J4), batch semantics.

Reference parity:
- C2/C3 two *consecutive* fails ≤ gap apart: ValueState pairwise check
  (LoginFailWithState2.java:52-81) ≡ CEP ``begin(fail).next(fail)
  .within(2s)`` (LoginFailwithStateCEP.java:48-65). Strict contiguity over
  the full event stream → ``lag`` over (key ORDER BY ts) with no
  intervening event, then filter both-fail & diff ≤ gap.
- C1/C4 ≥n fails within a horizon of the first fail
  (LoginFailWithState.java:51-111, LoginFailwithStateCEP_More.java:46-57):
  anchor each fail, count fails in [anchor, anchor+horizon).
- J3/J4 create→pay within 15 min else timeout
  (OrderTimeOutWithCepApp.java:53-99, OrderTimeOutStateApp.java:57-113):
  per create, matched iff a pay exists in (create, create+horizon].

Spark-first design: window functions (``lag``) express strict contiguity
with a single shuffle on the user key; the ≥n-in-horizon variant is a
self-join on the key with a time-range residual (same shape as J1).
Streaming equivalents via applyInPandasWithState live in
``streaming/stateful.py``; these batch forms are their oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "consecutive_event_pairs",
    "consecutive_n_events",
    "events_within_horizon",
    "match_or_timeout",
]


def consecutive_event_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    event_col: str,
    target: str,
    max_gap_s: int,
    order_tiebreak: str,
) -> DataFrame:
    """Adjacent (strict contiguity) pairs of ``target`` events ≤ gap apart.

    C3's ``next()`` means *no intervening event of any type*, so the lag
    runs over ALL events, not just the target type
    (LoginFailwithStateCEP.java:56-60).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(order_tiebreak))
    prev_type = F.lag(event_col).over(w)
    prev_ts = F.lag(ts_col).over(w)
    return (
        df.withColumn("prev_type", prev_type)
        .withColumn("prev_ts", prev_ts)
        .filter(
            (F.col(event_col) == target)
            & (F.col("prev_type") == target)
            & (F.col(ts_col).cast("long") - F.col("prev_ts").cast("long") <= max_gap_s)
        )
        .select(
            F.col(key),
            F.col("prev_ts").cast("long").alias("first_fail_s"),
            F.col(ts_col).cast("long").alias("last_fail_s"),
        )
    )


def consecutive_n_events(
    df: DataFrame,
    key: str,
    ts_col: str,
    event_col: str,
    target: str,
    n: int,
    within_s: int,
    order_tiebreak: str,
) -> DataFrame:
    """CEP ``times(n).consecutive().within(w)`` generalization
    (LoginFailwithStateCEP_More.java:46-57): n strictly-adjacent
    ``target`` events whose first→last span is ≤ ``within_s``.

    A chain of n−1 lags over the per-key event order — one shuffle, no
    self-joins; generalizes C3 (n=2).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(order_tiebreak))
    out = df.withColumn("cur_ts_s", F.col(ts_col).cast("long"))
    conds = F.col(event_col) == target
    for i in range(1, n):
        out = out.withColumn(f"lag_type_{i}", F.lag(event_col, i).over(w))
        out = out.withColumn(f"lag_ts_{i}", F.lag(F.col(ts_col).cast("long"), i).over(w))
        conds = conds & (F.col(f"lag_type_{i}") == target)
    first_ts = F.col(f"lag_ts_{n-1}")
    return (
        out.filter(conds & (F.col("cur_ts_s") - first_ts <= within_s))
        .select(
            F.col(key),
            first_ts.alias("first_fail_s"),
            F.col("cur_ts_s").alias("last_fail_s"),
            F.lit(n).cast("long").alias("times"),
        )
    )


def events_within_horizon(
    df: DataFrame,
    key: str,
    ts_col: str,
    event_col: str,
    target: str,
    horizon_s: int,
    min_count: int,
) -> DataFrame:
    """Anchored count: per ``target`` event, #targets in [ts, ts+horizon);
    keep anchors reaching ``min_count`` (C1's timer-at-first-fail check,
    LoginFailWithState.java:99-110)."""
    fails = df.filter(F.col(event_col) == target).select(
        F.col(key), F.col(ts_col).cast("long").alias("ts_s")
    )
    # Time-bucketed equi-join: a fail in [anchor, anchor+h) lives in the
    # anchor's h-sized bucket or the next one, so replicating the probe
    # side ×2 turns the range join into an equi join on (key, bucket) —
    # per-task work is then bounded by fails-per-key-per-horizon rather
    # than fails-per-key (the all-pairs blowup a pure range residual
    # leaves on a hot key).
    anchors = fails.withColumn("bucket", F.expr(f"ts_s DIV {horizon_s}"))
    probes = fails.withColumn(
        "bucket", F.explode(F.array(F.expr(f"ts_s DIV {horizon_s}"), F.expr(f"ts_s DIV {horizon_s} - 1")))
    )
    a = anchors.alias("a")
    b = probes.alias("b")
    cond = (
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("b.ts_s") >= F.col("a.ts_s"))
        & (F.col("b.ts_s") < F.col("a.ts_s") + horizon_s)
    )
    return (
        a.join(b, cond)
        .groupBy(F.col(f"a.{key}").alias(key), F.col("a.ts_s").alias("anchor_s"))
        .agg(F.count(F.lit(1)).alias("fail_cnt"))
        .filter(F.col("fail_cnt") >= min_count)
    )


def match_or_timeout(
    df: DataFrame,
    key: str,
    ts_col: str,
    event_col: str,
    create_type: str,
    pay_type: str,
    horizon_s: int,
    id_col: str,
) -> DataFrame:
    """Per ``create_type`` event: 'payed' iff a ``pay_type`` by the same key
    occurs in (ts, ts+horizon], else 'timeout' (OrderTimeOutStateApp
    semantics; side-output alerts become the status column).

    Implemented as semi/anti joins on the key (one shuffle each, both
    reusing the same partitioning) rather than a row-exploding outer join.
    """
    creates = df.filter(F.col(event_col) == create_type).select(
        F.col(id_col).alias("create_id"),
        F.col(key),
        F.col(ts_col).cast("long").alias("create_ts_s"),
    )
    pays = df.filter(F.col(event_col) == pay_type).select(
        F.col(key).alias("p_key"), F.col(ts_col).cast("long").alias("pay_ts_s")
    )
    cond = (
        (creates[key] == pays["p_key"])
        & (pays["pay_ts_s"] > creates["create_ts_s"])
        & (pays["pay_ts_s"] <= creates["create_ts_s"] + horizon_s)
    )
    payed = creates.join(pays, cond, "left_semi").withColumn("status", F.lit("payed"))
    timed_out = creates.join(pays, cond, "left_anti").withColumn("status", F.lit("timeout"))
    return payed.unionByName(timed_out)
