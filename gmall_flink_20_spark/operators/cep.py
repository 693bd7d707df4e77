"""Composable CEP pattern surface (SURVEY §2.7/§2.8; VERDICT r12 item 7).

Reference parity: flink-cep's fluent pattern API —
``Pattern.begin("start").where(...).times(n).consecutive().within(...)``
(LoginFailwithStateCEP_More.java:46-57),
``begin("create").where(...).followedBy("pay").within(Time.minutes(15))``
(OrderTimeOutWithCepApp.java:53-69). The four specialized detectors in
``operators/patterns.py`` are re-expressed as thin wrappers over this
surface; their oracles gate the compilation unchanged.

Semantics (Flink contiguity modes, batch-compiled):

- ``next`` — STRICT contiguity: the step matches the event at the
  immediately following per-key stream position (stream order =
  (ts, tiebreak), the same total order every detector here uses).
- ``followed_by`` — RELAXED contiguity: the step matches the FIRST
  later event satisfying its predicate. Flink's relaxed contiguity
  takes only the first match; ``followedByAny`` (all alternatives,
  combinatorial) is intentionally out of scope.
- ``times(n)`` + consecutive — expands the last step into n strict
  repetitions (flink-cep ``times(n).consecutive()``).
- ``within(s)`` — final-step ts − anchor ts ≤ s.
- timeout capture (``emit_timeouts``) — anchors whose chain breaks or
  breaches ``within`` emit ``status='timeout'`` (flink-cep's
  ``OutputTag`` timeout side output become a status column, the same
  convention as operators/patterns.match_or_timeout).

Compile shape, scale-first:

- An ALL-STRICT pattern compiles to one window pass with a lead()
  chain — single shuffle on the key, no joins (the exact plan the
  specialized C2/C3/C4 detectors used).
- A mixed pattern compiles to per-key stream positions (row_number)
  plus, for every relaxed step, a next-match-position column (min over
  the FOLLOWING rows frame — or a strictly-later RANGE frame when
  ``min_ts_gap`` is set) computed in the SAME window pass; each step
  then resolves with an equi-join on (key, position). Candidate
  resolution is positional: no range joins, no per-key quadratics, and
  every join key starts with the stream key so AQE co-partitions the
  chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["Pattern", "detect"]


@dataclass
class _Step:
    name: str
    pred: Column
    contiguity: str  # 'begin' | 'next' | 'followed_by'
    min_ts_gap: int | None = None  # relaxed only: require ts ≥ prev ts + gap


@dataclass
class Pattern:
    """Fluent pattern spec. ``Pattern("f", pred)`` ≡ flink-cep
    ``Pattern.begin("f").where(pred)``; chain ``.next`` /
    ``.followed_by`` / ``.times`` / ``.within``."""

    steps: list[_Step] = field(default_factory=list)
    within_s: int | None = None

    def __init__(self, name: str, pred: Column):
        self.steps = [_Step(name, pred, "begin")]
        self.within_s = None

    def next(self, name: str, pred: Column) -> "Pattern":
        self.steps.append(_Step(name, pred, "next"))
        return self

    def followed_by(
        self, name: str, pred: Column, min_ts_gap: int | None = None
    ) -> "Pattern":
        """Relaxed contiguity. ``min_ts_gap`` additionally requires the
        match's (integer-seconds) ts ≥ previous step ts + gap — the
        strictly-later-in-TIME variant match_or_timeout's reconciliation
        semantics need (a same-ts later-position event is then skipped)."""
        self.steps.append(_Step(name, pred, "followed_by", min_ts_gap))
        return self

    def times(self, n: int) -> "Pattern":
        """``times(n).consecutive()``: expand the LAST step into n
        strictly-adjacent repetitions of the same predicate."""
        last = self.steps[-1]
        for i in range(2, n + 1):
            self.steps.append(_Step(f"{last.name}_{i}", last.pred, "next"))
        return self

    def within(self, seconds: int) -> "Pattern":
        self.within_s = seconds
        return self


def _ts_cols(steps: list[_Step]) -> list[str]:
    return [f"ts_{s.name}_s" for s in steps]


def _detect_two_step_relaxed(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    carry: tuple[tuple[str, str], ...],
    emit_timeouts: bool,
) -> DataFrame:
    """Specialized compile for ``begin(a).followed_by(b)`` (the
    match_or_timeout shape): the first later b per anchor is
    min(struct(ts, tiebreak)) over one key-equi join with the
    later-than residual — one join + one map-side-combining aggregate
    instead of the positional pipeline's window pass + step join.
    Equivalent because position order IS (ts, tiebreak) order, so the
    minimal (ts, tiebreak) candidate is the positional first match;
    with ``min_ts_gap`` the residual becomes ts_b ≥ ts_a + gap
    (strictly-later-in-time), same as the generic path's range frame."""
    s0, s1 = pattern.steps
    tsn = _ts_cols(pattern.steps)
    anchors = df.filter(s0.pred).select(
        F.col(key).alias("_k"),
        *[F.col(src).alias(dst) for src, dst in carry],
        F.col(ts_col).cast("long").alias("_ts0"),
        F.col(order_tiebreak).alias("_tb0"),
    )
    cands = df.filter(s1.pred).select(
        F.col(key).alias("_kc"),
        F.col(ts_col).cast("long").alias("_ts1"),
        F.col(order_tiebreak).alias("_tb1"),
    )
    if s1.min_ts_gap is not None:
        residual = F.col("_ts1") >= F.col("_ts0") + int(s1.min_ts_gap)
    else:
        residual = (F.col("_ts1") > F.col("_ts0")) | (
            (F.col("_ts1") == F.col("_ts0")) & (F.col("_tb1") > F.col("_tb0"))
        )
    joined = anchors.join(
        cands, (F.col("_k") == F.col("_kc")) & residual, "left"
    )
    carry_names = [dst for _, dst in carry]
    first = joined.groupBy(
        "_k", *carry_names, "_ts0", "_tb0"
    ).agg(F.min(F.struct("_ts1", "_tb1")).alias("_m"))
    ts1 = F.col("_m._ts1")
    within_ok = (
        F.lit(True)
        if pattern.within_s is None
        else (ts1 - F.col("_ts0") <= pattern.within_s)
    )
    base = [
        F.col("_k").alias(key),
        *[F.col(c) for c in carry_names],
        F.col("_ts0").alias(tsn[0]),
    ]
    if emit_timeouts:
        matched = ts1.isNotNull() & within_ok
        return first.select(
            *base,
            F.when(matched, ts1).alias(tsn[1]),
            F.when(matched, F.lit("match")).otherwise(F.lit("timeout")).alias("status"),
        )
    return first.filter(ts1.isNotNull() & within_ok).select(
        *base, ts1.alias(tsn[1])
    )


def detect(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    carry: tuple[tuple[str, str], ...] = (),
    emit_timeouts: bool = False,
) -> DataFrame:
    """Compile and run ``pattern`` over ``df``. Emits one row per match:
    ``key``, the ``carry`` columns ``(src, alias)`` taken from the ANCHOR
    event, one ``ts_<step>_s`` long column per step, and — when
    ``emit_timeouts`` — a ``status`` column ('match'/'timeout'; timeout
    rows carry NULL ts for unreached steps)."""
    steps = pattern.steps
    m = len(steps)
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(order_tiebreak))
    ts_long = F.col(ts_col).cast("long")

    if all(s.contiguity != "followed_by" for s in steps) and not emit_timeouts:
        # all-strict fast path: one window pass, lead() chain — the plan
        # shape the specialized detectors used (single shuffle, no joins)
        out = df.withColumn("_ts0", ts_long)
        conds = steps[0].pred
        tss = [F.col("_ts0")]
        for i in range(1, m):
            out = out.withColumn(f"_p{i}", F.lead(steps[i].pred.cast("int"), i).over(w))
            out = out.withColumn(f"_ts{i}", F.lead("_ts0", i).over(w))
            conds = conds & (F.col(f"_p{i}") == 1)
            tss.append(F.col(f"_ts{i}"))
        if pattern.within_s is not None:
            conds = conds & (tss[-1] - tss[0] <= pattern.within_s)
        return out.filter(conds).select(
            F.col(key),
            *[F.col(src).alias(dst) for src, dst in carry],
            *[t.alias(n) for t, n in zip(tss, _ts_cols(steps))],
        )

    if m == 2 and steps[1].contiguity == "followed_by":
        return _detect_two_step_relaxed(
            df, pattern, key, ts_col, order_tiebreak, carry, emit_timeouts
        )

    # mixed / timeout-capturing path: positional compile
    pos_cols = [
        F.col(key).alias("_k"),
        F.row_number().over(w).alias("_rn"),
        ts_long.alias("_ts"),
        *[s.pred.cast("boolean").alias(f"_p{i}") for i, s in enumerate(steps)],
    ]
    for i, s in enumerate(steps):
        if s.contiguity != "followed_by":
            continue
        if s.min_ts_gap is None:
            frame = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(order_tiebreak)).rowsBetween(
                1, Window.unboundedFollowing
            )
        else:
            # strictly-later-in-time frame: integer-second range
            frame = Window.partitionBy(key).orderBy(ts_long).rangeBetween(
                int(s.min_ts_gap), Window.unboundedFollowing
            )
        pos_cols.append(
            F.min(F.when(s.pred, F.row_number().over(w))).over(frame).alias(f"_nm{i}")
        )
    # no persist: the window pass is cheap JVM work and Catalyst reuses
    # the exchange across the step branches — cache materialization
    # costs more than recomputation here (same lesson as overlap_pairs)
    pos = df.select(*pos_cols, *[F.col(src) for src, _ in carry])

    tsn = _ts_cols(steps)
    # frontier: anchor rows
    front = pos.filter(F.col("_p0")).select(
        F.col("_k"),
        *[F.col(src).alias(dst) for src, dst in carry],
        F.col("_ts").alias(tsn[0]),
        F.col("_rn").alias("_prev_rn"),
        *[
            F.col(f"_nm{i}").alias(f"_tgt{i}")
            for i, s in enumerate(steps)
            if s.contiguity == "followed_by" and i == 1
        ],
    )
    carry_names = [dst for _, dst in carry]
    for i in range(1, m):
        s = steps[i]
        nm_next = [
            j
            for j, s2 in enumerate(steps)
            if s2.contiguity == "followed_by" and j == i + 1
        ]
        side = pos.select(
            F.col("_k").alias("_k_r"),
            F.col("_rn").alias("_rn_r"),
            F.col("_ts").alias("_ts_r"),
            F.col(f"_p{i}").alias("_p_r"),
            *[F.col(f"_nm{j}").alias(f"_nm_r{j}") for j in nm_next],
        )
        if s.contiguity == "next":
            cond = (F.col("_k") == F.col("_k_r")) & (
                F.col("_rn_r") == F.col("_prev_rn") + 1
            )
            match_ok = F.col("_p_r")
        else:
            cond = (F.col("_k") == F.col("_k_r")) & (
                F.col("_rn_r") == F.col(f"_tgt{i}")
            )
            match_ok = F.lit(True)
        how = "left" if emit_timeouts else "inner"
        front = (
            front.join(side, cond, how)
            .withColumn("_ok", match_ok & F.col("_rn_r").isNotNull())
            .select(
                F.col("_k"),
                *[F.col(c) for c in carry_names],
                *[F.col(c) for c in tsn[:i]],
                F.when(F.col("_ok"), F.col("_ts_r")).alias(tsn[i]),
                F.when(F.col("_ok"), F.col("_rn_r")).alias("_prev_rn"),
                *[
                    F.when(F.col("_ok"), F.col(f"_nm_r{j}")).alias(f"_tgt{j}")
                    for j in nm_next
                ],
                *([] if not emit_timeouts else [F.col("_ok")]),
            )
        )
        if not emit_timeouts:
            front = front.filter(F.col(tsn[i]).isNotNull())
        else:
            # a broken chain keeps its row (nulls forward); later joins
            # on NULL _prev_rn/_tgt can't match, so the nulls persist
            front = front.drop("_ok")

    within_ok = (
        F.lit(True)
        if pattern.within_s is None
        else (F.col(tsn[-1]) - F.col(tsn[0]) <= pattern.within_s)
    )
    if emit_timeouts:
        matched = F.col(tsn[-1]).isNotNull() & within_ok
        return front.select(
            F.col("_k").alias(key),
            *[F.col(c) for c in carry_names],
            *[F.col(c) for c in tsn],
            F.when(matched, F.lit("match")).otherwise(F.lit("timeout")).alias("status"),
        )
    return front.filter(within_ok).select(
        F.col("_k").alias(key),
        *[F.col(c) for c in carry_names],
        *[F.col(c) for c in tsn],
    )
