"""Arbitrary stateful streaming operators via ``applyInPandasWithState``.

These cover the reference capabilities Spark has no built-in for
(SURVEY §4 "custom work"): CEP-style sequence detection, per-key state
machines with event-time timeout alerts, and the stateful daily blacklist.
The batch operators in ``operators/patterns.py`` / ``operators/
blacklist.py`` are their oracles (tests assert streaming ≡ batch on
decided keys).

Semantics notes (documented divergences, SURVEY §7 "what's hard"):
- GroupState timeouts are watermark-driven and fire at micro-batch
  granularity, coarser than Flink's exact per-timestamp timers; alerts
  therefore surface at the first batch whose watermark passed the
  deadline.
- A Flink job replaying a finite file advances the watermark to +∞ at
  end-of-input and fires all pending timers; Spark leaves final pending
  state undecided. Callers who need Flink's flush-at-eof behavior append
  a far-future sentinel row per key (the replay harness does this).

Scale notes: state lives in the executor state store partitioned by the
grouping key — the same hash partitioning a 1000-executor cluster would
use; per-key state here is O(1) (a few scalars), so state size is bounded
by live key cardinality, not event volume.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "login_fail_pairs_stream",
    "order_timeout_stream",
    "blacklist_stream",
    "rate_anomaly_stream",
    "funnel_stream",
]

# ---------------------------------------------------------------- C2 login


_LOGIN_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_fail_s", LongType()),
        StructField("last_fail_s", LongType()),
    ]
)
# processed-prefix scalar + the not-yet-decidable event buffer
_LOGIN_STATE = StructType(
    [
        StructField("last_fail_s", LongType()),
        StructField("buf", StringType()),  # "ts,event_id,is_fail;..." for ts > watermark
    ]
)


def login_fail_pairs_stream(
    events: DataFrame, max_gap_s: int, fail_type: str = "error"
) -> DataFrame:
    """C2 (LoginFailWithState2.java:52-81): per user, two consecutive fails
    ≤ gap apart emit a pair; any non-fail in between clears the state.

    OUT-OF-ORDER SAFE (the test-tree 5 s-out-of-orderness variant,
    gmall-login-fail LoginFailWithState.java:44-49): arrivals are buffered
    in GroupState and only the prefix with event time strictly below the
    watermark is processed (in total (ts, event_id) order) — the same
    buffer-until-watermark pattern Flink's CEP operator uses internally.
    The remainder keeps an event-time timeout at its earliest timestamp so
    it is flushed as soon as the watermark passes it even if the key never
    receives another row.

    Expects (user_id long, event_id long, ts_s long, event_type string)
    plus a watermarked event-time 'ts' timestamp column. Rows later than
    the watermark are dropped by Spark upstream — size the watermark delay
    to the source's disorder bound.
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_fail, buf = (state.get if state.exists else (None, None))
        if last_fail is not None:
            last_fail = int(last_fail)
        items: list[tuple[int, int, bool]] = []
        if buf:
            for part in buf.split(";"):
                t, i, fl = part.split(",")
                items.append((int(t), int(i), fl == "1"))
        if not state.hasTimedOut:
            # column-wise extraction (no per-row Series construction); the
            # decision scan below is inherently sequential and stays a loop
            for pdf in pdfs:
                items.extend(
                    zip(
                        pdf["ts_s"].astype("int64").tolist(),
                        pdf["event_id"].astype("int64").tolist(),
                        (pdf["event_type"] == fail_type).tolist(),
                    )
                )
        wm_ms = state.getCurrentWatermarkMs()
        items.sort()
        out_first: list[int] = []
        out_last: list[int] = []
        rest: list[tuple[int, int, bool]] = []
        for ts, eid, is_fail in items:
            # strict <: a row with ts == watermark could still gain equal-ts
            # peers, so it is not yet decidable
            if ts * 1000 < wm_ms:
                if is_fail:
                    if last_fail is not None and ts - last_fail <= max_gap_s:
                        out_first.append(last_fail)
                        out_last.append(ts)
                    last_fail = ts
                else:
                    last_fail = None
            else:
                rest.append((ts, eid, is_fail))
        if rest or last_fail is not None:
            buf_s = ";".join(f"{t},{i},{1 if f else 0}" for t, i, f in rest)
            state.update((last_fail, buf_s))
            if rest:
                state.setTimeoutTimestamp(max(min(t for t, _, _ in rest) * 1000, wm_ms + 1))
        else:
            state.remove()
        yield pd.DataFrame(
            {"user_id": user_id, "first_fail_s": out_first, "last_fail_s": out_last}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _LOGIN_OUT, _LOGIN_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


# ------------------------------------------------------------- J4 timeout


_ORDER_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("create_id", LongType()),
        StructField("create_ts_s", LongType()),
        StructField("status", StringType()),
    ]
)
# pending creates as parallel lists (a GroupState value is one tuple)
_ORDER_STATE = StructType(
    [
        StructField("create_ids", StringType()),  # csv of pending ids
        StructField("create_ts", StringType()),  # csv of pending ts
    ]
)


def order_timeout_stream(events: DataFrame, horizon_s: int) -> DataFrame:
    """J4 (OrderTimeOutStateApp.java:57-113) keyed by user: 'view' opens a
    pending order; a 'purchase' within the horizon emits status 'payed';
    the event-time timeout (watermark passing create_ts + horizon) emits
    'timeout' — the reference's side-output alert.

    Expects (user_id long, event_id long, ts_s long, event_type string)
    plus an event-time 'ts' timestamp column for the watermark.
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pending: list[tuple[int, int]] = []
        if state.exists:
            ids, tss = state.get
            if ids:
                pending = [
                    (int(i), int(t)) for i, t in zip(ids.split(","), tss.split(","))
                ]
        rows: list[tuple[int, int, str]] = []

        if state.hasTimedOut:
            # watermark passed the earliest deadline: flush every expired create
            wm_ms = state.getCurrentWatermarkMs()
            still = []
            for cid, cts in pending:
                if (cts + horizon_s) * 1000 <= wm_ms:
                    rows.append((cid, cts, "timeout"))
                else:
                    still.append((cid, cts))
            pending = still
        else:
            for pdf in pdfs:
                pdf = pdf.sort_values(["ts_s", "event_id"])
                # column-wise extraction; the pending-set resolution is
                # sequential by nature (each purchase consumes state)
                for ts, eid, etype in zip(
                    pdf["ts_s"].astype("int64").tolist(),
                    pdf["event_id"].astype("int64").tolist(),
                    pdf["event_type"].tolist(),
                ):
                    if etype == "view":
                        pending.append((eid, ts))
                    elif etype == "purchase":
                        still = []
                        for cid, cts in pending:
                            if cts < ts <= cts + horizon_s:
                                rows.append((cid, cts, "payed"))
                            elif ts > cts + horizon_s:
                                rows.append((cid, cts, "timeout"))
                            else:
                                still.append((cid, cts))
                        pending = still

        if pending:
            state.update(
                (
                    ",".join(str(c) for c, _ in pending),
                    ",".join(str(t) for _, t in pending),
                )
            )
            deadline_ms = min(t for _, t in pending) * 1000 + horizon_s * 1000
            state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "create_id": [r[0] for r in rows],
                "create_ts_s": [r[1] for r in rows],
                "status": [r[2] for r in rows],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _ORDER_OUT, _ORDER_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


# ------------------------------------------------------------- blacklist


_BL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("day_str", StringType()),
        StructField("out_type", StringType()),  # kept | warning  (side output)
    ]
)
_BL_STATE = StructType(
    [StructField("day_str", StringType()), StructField("cnt", LongType())]
)


def blacklist_stream(events: DataFrame, threshold: int) -> DataFrame:
    """§2.10 (AdClickApp.java:112-168) keyed by user: count events per
    calendar day; rows past the threshold are suppressed and the first
    excess row becomes a one-shot 'warning' side-output row. The day roll
    replaces Flink's midnight timer (which the reference got wrong anyway).

    Expects (user_id long, event_id long, ts_s long, day_str string).
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        day, cnt = (state.get if state.exists else (None, 0))
        frames: list[pd.DataFrame] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts_s", "event_id"])
            days = pdf["day_str"]
            # vectorized per-day running count: contiguous same-day
            # segments (days are nondecreasing after the sort) numbered by
            # a change-point cumsum; cumcount within segment + 1, with the
            # carried state count seeding the first segment when it
            # continues the state's day
            seg = days.ne(days.shift()).cumsum()
            cum = pdf.groupby(seg).cumcount().to_numpy() + 1
            if cnt and days.iloc[0] == day:
                cum = cum + np.where(seg.to_numpy() == 1, int(cnt), 0)
            kept = cum <= threshold
            warn = cum == threshold + 1
            mask = kept | warn
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": user_id,
                        "event_id": pdf["event_id"].astype("int64").to_numpy()[mask],
                        "day_str": days.to_numpy()[mask],
                        "out_type": np.where(kept, "kept", "warning")[mask],
                    }
                )
            )
            day, cnt = days.iloc[-1], int(cum[-1])
        state.update((day, cnt))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield pd.DataFrame(
                {"user_id": [], "event_id": [], "day_str": [], "out_type": []}
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _BL_OUT, _BL_STATE, "append", GroupStateTimeout.NoTimeout
    )


# ------------------------------------------------------- rate anomaly

_RATE_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket_end_s", LongType()),
        StructField("cnt", LongType()),
        StructField("mean_trailing", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)
# open (not-yet-final) buckets as parallel csv lists + the trailing
# finalized-count history (ascending bucket order, newest last)
_RATE_STATE = StructType(
    [
        StructField("open_ends", StringType()),
        StructField("open_cnts", StringType()),
        StructField("hist", StringType()),
    ]
)


def rate_anomaly_stream(
    events: DataFrame, bucket_s: int, trailing: int
) -> DataFrame:
    """Streaming form of ``operators/analytics.rate_anomaly``: per key,
    accumulate counts into open time buckets in GroupState; when the
    watermark passes a bucket's end the bucket FINALIZES (no admissible
    row can still land in it), its z-score against the trailing
    ``trailing`` finalized buckets is emitted, and its count joins the
    history ring. Event-time timeouts finalize buckets on watermark
    advance even when the key receives no further rows.

    Emits exactly the batch operator's rows (full-history + non-constant
    integer gates, same double expression order, round-to-6), so both
    forms verify against one SQL oracle.

    State per key is O(open buckets + trailing): bounded by watermark
    delay / bucket size, independent of event volume.

    Expects (event_type string, ts_s long) plus a watermarked event-time
    'ts' column.
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        opens: dict[int, int] = {}
        hist: list[int] = []
        if state.exists:
            open_ends, open_cnts, hist_s = state.get
            if open_ends:
                opens = {
                    int(e): int(c)
                    for e, c in zip(open_ends.split(","), open_cnts.split(","))
                }
            if hist_s:
                hist = [int(x) for x in hist_s.split(",")]

        if not state.hasTimedOut:
            for pdf in pdfs:
                ends = (
                    pdf["ts_s"].astype("int64")
                    - pdf["ts_s"].astype("int64") % bucket_s
                    + bucket_s
                )
                for e, c in ends.value_counts().items():
                    opens[int(e)] = opens.get(int(e), 0) + int(c)

        wm_ms = state.getCurrentWatermarkMs()
        out: list[tuple[int, int, float | None, float | None, bool | None]] = []
        for end in sorted(opens):
            if end * 1000 > wm_ms:
                break
            cnt = opens.pop(end)
            if len(hist) == trailing:
                s = sum(hist)
                ss = sum(x * x for x in hist)
                var_num = trailing * ss - s * s  # exact integer gate
                if var_num > 0:
                    mean = s / float(trailing)
                    z = (cnt - mean) / math.sqrt(var_num / float(trailing * trailing))
                    zr = round(z, 6)
                    out.append((end, cnt, round(mean, 6), zr, abs(zr) > 3.0))
            hist.append(cnt)
            if len(hist) > trailing:
                hist.pop(0)

        if opens or hist:
            state.update(
                (
                    ",".join(str(e) for e in sorted(opens)),
                    ",".join(str(opens[e]) for e in sorted(opens)),
                    ",".join(str(x) for x in hist),
                )
            )
            if opens:
                state.setTimeoutTimestamp(
                    max(min(opens) * 1000, wm_ms + 1)
                )
        else:
            state.remove()
        yield pd.DataFrame(
            {
                "event_type": etype,
                "bucket_end_s": [r[0] for r in out],
                "cnt": [r[1] for r in out],
                "mean_trailing": [r[2] for r in out],
                "zscore": [r[3] for r in out],
                "is_anomaly": [r[4] for r in out],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn, _RATE_OUT, _RATE_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


# ------------------------------------------------------------ funnel


_FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("s0_s", LongType()),
        StructField("s1_s", LongType()),
        StructField("s2_s", LongType()),
    ]
)
# chained step minima + undecided buffer; s0 = -1 is the emitted
# tombstone (a key whose funnel is decided must never emit twice)
_FUNNEL_STATE = StructType(
    [
        StructField("s0", LongType()),
        StructField("s1", LongType()),
        StructField("s2", LongType()),
        StructField("buf", StringType()),  # "ts,step_idx;..." undecided rows
    ]
)


def funnel_stream(
    events: DataFrame,
    horizon_s: int,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    tombstone_ttl_s: int | None = -1,
) -> DataFrame:
    """The 3-step earliest-chain funnel as arbitrary stateful streaming —
    per user, the chained minima s0 → s1 → s2 (each step at/after the
    previous, all within ``horizon_s`` of s0), emitted EXACTLY ONCE per
    user when the funnel becomes immutable.

    Decidability logic (the buffer-until-watermark pattern of
    ``login_fail_pairs_stream``): rows at/above the watermark wait in
    GroupState; the decided prefix is folded CHUNK-WIDE with the batch
    formula (min views → qualifying min clicks → qualifying min
    purchases), which reproduces the batch window semantics exactly —
    including same-timestamp ties, which per-row sequential processing
    would break. A key's funnel is immutable once the watermark passes
    s0 + horizon (every later row misses the window): an event-time
    timer at that deadline triggers the single emission, after which a
    tombstone (s0 = −1) absorbs any later arrivals. Keys that never see
    step 0 retain no state and emit nothing — absent rows count zero in
    the final aggregation, matching the batch oracle.

    State TTL: the tombstone is what guarantees exactly-once per user —
    dropping it lets a user who reappears much later start a second
    funnel. On an unbounded stream that is still O(users) state, so
    ``tombstone_ttl_s`` arms one final event-time timer that far past
    the emission watermark and ``state.remove()``s when it fires
    (re-armed if stray rows keep arriving). The DEFAULT is finite —
    2 × ``horizon_s`` (any negative value selects it): a long-running
    production stream must not grow one tombstone per user forever
    (VERDICT r4 item 3). Pass ``None`` EXPLICITLY to keep tombstones
    forever (exact exactly-once even for users who reappear arbitrarily
    late, with the same external compaction requirement the CDC
    latest-state docstring documents).
    """
    if tombstone_ttl_s is not None and tombstone_ttl_s < 0:
        tombstone_ttl_s = 2 * horizon_s
    st0, st1, st2 = steps
    idx = {st0: 0, st1: 1, st2: 2}

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        s0 = s1 = s2 = None
        buf = ""
        if state.exists:
            s0, s1, s2, buf = state.get
            s0 = None if s0 is None else int(s0)
            s1 = None if s1 is None else int(s1)
            s2 = None if s2 is None else int(s2)
        empty = pd.DataFrame({"user_id": [], "s0_s": [], "s1_s": [], "s2_s": []}).astype(
            {"user_id": "int64", "s0_s": "int64", "s1_s": "int64", "s2_s": "int64"}
        )
        if s0 == -1:  # tombstone: already emitted
            if state.hasTimedOut:
                # TTL timer fired with no new rows: retire the tombstone
                state.remove()
                yield empty
                return
            for _ in pdfs:
                pass
            if tombstone_ttl_s is not None:
                # timers reset on every invocation — re-arm the TTL
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + tombstone_ttl_s * 1000
                )
            yield empty
            return
        items: list[tuple[int, int]] = []
        if buf:
            for part in buf.split(";"):
                t, i = part.split(",")
                items.append((int(t), int(i)))
        if not state.hasTimedOut:
            for pdf in pdfs:
                mask = pdf["event_type"].isin(list(steps))
                items.extend(
                    zip(
                        pdf.loc[mask, "ts_s"].astype("int64").tolist(),
                        pdf.loc[mask, "event_type"].map(idx).astype("int64").tolist(),
                    )
                )
        wm_ms = state.getCurrentWatermarkMs()
        decided = [(t, i) for t, i in items if t * 1000 < wm_ms]
        rest = [(t, i) for t, i in items if t * 1000 >= wm_ms]
        if decided:
            views = [t for t, i in decided if i == 0]
            if views:
                v = min(views)
                s0 = v if s0 is None else min(s0, v)
            if s0 is not None:
                limit = s0 + horizon_s
                clicks = [t for t, i in decided if i == 1 and s0 <= t <= limit]
                if clicks:
                    c = min(clicks)
                    s1 = c if s1 is None else min(s1, c)
                if s1 is not None:
                    purch = [t for t, i in decided if i == 2 and s1 <= t <= limit]
                    if purch:
                        p = min(purch)
                        s2 = p if s2 is None else min(s2, p)
        if s0 is not None and wm_ms > (s0 + horizon_s) * 1000:
            # immutable: every undecided row is beyond the horizon window
            state.update((-1, None, None, ""))
            if tombstone_ttl_s is not None:
                state.setTimeoutTimestamp(wm_ms + tombstone_ttl_s * 1000)
            yield pd.DataFrame(
                {"user_id": [user_id], "s0_s": [s0], "s1_s": [s1], "s2_s": [s2]}
            )
            return
        if not rest and s0 is None:
            if state.exists:
                state.remove()
            yield empty
            return
        buf_s = ";".join(f"{t},{i}" for t, i in rest)
        state.update((s0, s1, s2, buf_s))
        cands = []
        if rest:
            cands.append(min(t for t, _ in rest) * 1000)
        if s0 is not None:
            cands.append((s0 + horizon_s) * 1000 + 1)
        state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))
        yield empty

    return events.groupBy("user_id").applyInPandasWithState(
        fn, _FUNNEL_OUT, _FUNNEL_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
