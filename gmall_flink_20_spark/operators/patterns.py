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

    C3's ``next()`` means *no intervening event of any type*, so strict
    contiguity runs over ALL events, not just the target type
    (LoginFailwithStateCEP.java:56-60).

    Round 13: expressed through the composable CEP surface —
    ``Pattern(target).next(target).within(gap)`` (operators/cep.py); the
    all-strict pattern compiles back to the identical one-window-pass
    lead-chain plan, gated by the unchanged oracle."""
    from . import cep

    pat = (
        cep.Pattern("f1", F.col(event_col) == target)
        .next("f2", F.col(event_col) == target)
        .within(max_gap_s)
    )
    out = cep.detect(df, pat, key, ts_col, order_tiebreak)
    return out.select(
        F.col(key),
        F.col("ts_f1_s").alias("first_fail_s"),
        F.col("ts_f2_s").alias("last_fail_s"),
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

    Round 13: expressed through the composable CEP surface —
    ``Pattern(target).times(n).within(within_s)`` (operators/cep.py);
    all-strict, so it compiles to the same single-shuffle lead-chain
    plan the hand-built lag chain used (anchor flips from the last to
    the first event of each run — same match set, same output values),
    gated by the unchanged oracle."""
    from . import cep

    pat = (
        cep.Pattern("f", F.col(event_col) == target).times(n).within(within_s)
    )
    out = cep.detect(df, pat, key, ts_col, order_tiebreak)
    last_name = f"ts_f_{n}_s" if n > 1 else "ts_f_s"
    return out.select(
        F.col(key),
        F.col("ts_f_s").alias("first_fail_s"),
        F.col(last_name).alias("last_fail_s"),
        F.lit(n).cast("long").alias("times"),
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

    Round 13: expressed through the composable CEP surface —
    ``Pattern(create).followed_by(pay, min_ts_gap=1).within(horizon)``
    with timeout capture (operators/cep.py). Relaxed contiguity picks
    the EARLIEST strictly-later pay; within-filtering the earliest match
    is equivalent to the former exists-in-(ts, ts+horizon] semi/anti
    join because the earliest pay minimizes the span (monotone), and
    ``min_ts_gap=1`` reproduces the strict ``pay_ts > create_ts`` bound
    over integer-second timestamps. Gated by the unchanged oracle."""
    from . import cep

    pat = (
        cep.Pattern("create", F.col(event_col) == create_type)
        .followed_by("pay", F.col(event_col) == pay_type, min_ts_gap=1)
        .within(horizon_s)
    )
    out = cep.detect(
        df,
        pat,
        key,
        ts_col,
        order_tiebreak=id_col,
        carry=((id_col, "create_id"),),
        emit_timeouts=True,
    )
    return out.select(
        "create_id",
        F.col(key),
        F.col("ts_create_s").alias("create_ts_s"),
        F.when(F.col("status") == "match", F.lit("payed"))
        .otherwise(F.lit("timeout"))
        .alias("status"),
    )
