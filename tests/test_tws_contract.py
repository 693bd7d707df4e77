"""transformWithStateInPandas contract harness (VERDICT r7 item 2).

The live TWS runtime cannot boot in this sandbox (its state protocol
needs google.protobuf — absent, installs disallowed; see
streaming/tws.py). These tests pin everything short of that boundary:

1. the TWS PLAN builds against a real replay stream (analysis passes —
   the failure is at runner boot, not plan time);
2. the processor's full lifecycle (init / handleInputRows /
   handleExpiredTimer / ListState / timers) run through a faithful
   in-process replica of the documented TWS handle contract produces
   EXACTLY the batch oracle's decisions on real data — the same
   streaming ≡ batch gate the live GroupState run passes.

The replica implements only the documented surface the processor uses
(getListState, registerTimer, listTimers, deleteTimer,
TimerValues.getCurrentWatermarkInMs) with TWS's semantics: timers fire
when the watermark passes them, per key, between micro-batches.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gmall_flink_20_spark.io import load_events
from gmall_flink_20_spark.queries import QUERIES
from gmall_flink_20_spark.streaming import tws

HORIZON = 7200


# ------------------------------------------------ handle/timer replica


class _ListState:
    def __init__(self):
        self._rows: list[tuple] = []

    def get(self):
        return iter(self._rows)

    def put(self, rows):
        self._rows = [tuple(r) for r in rows]

    def appendList(self, rows):
        self._rows.extend(tuple(r) for r in rows)

    def clear(self):
        self._rows = []


class _Handle:
    """Per-KEY handle replica: TWS scopes state and timers to the
    current grouping key implicitly; the harness swaps the active key
    before each call, mirroring that contract."""

    def __init__(self):
        self._states: dict[tuple, dict[str, _ListState]] = {}
        self._timers: dict[tuple, set[int]] = {}
        self._active: tuple = ()

    def activate(self, key: tuple):
        self._active = key

    def getListState(self, name, schema, ttlDurationMs=None):
        per_key = self._states.setdefault(self._active, {})
        if name not in per_key:
            per_key[name] = _ListState()
        return _KeyedListState(self, name)

    def registerTimer(self, expiry_ms: int):
        self._timers.setdefault(self._active, set()).add(int(expiry_ms))

    def deleteTimer(self, expiry_ms: int):
        self._timers.get(self._active, set()).discard(int(expiry_ms))

    def listTimers(self):
        return iter(sorted(self._timers.get(self._active, set())))


class _KeyedListState:
    """Dispatches through the handle's active key — state follows the
    key even though the processor holds one state object."""

    def __init__(self, handle: _Handle, name: str):
        self._h = handle
        self._name = name

    def _s(self) -> _ListState:
        return self._h._states.setdefault(self._h._active, {}).setdefault(
            self._name, _ListState()
        )

    def get(self):
        return self._s().get()

    def put(self, rows):
        self._s().put(rows)

    def clear(self):
        self._s().clear()


class _TimerValues:
    def __init__(self, wm_ms: int):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):
        return 0


class _ExpiredTimerInfo:
    def __init__(self, expiry_ms: int):
        self._e = expiry_ms

    def getExpiryTimeInMs(self):
        return self._e


def _drive(processor, chunks, wm_delay_ms=2000):
    """Micro-batch driver with TWS semantics: per batch, route rows to
    keys (handleInputRows), then advance the watermark to
    max-event-time − delay and fire every timer it passed
    (handleExpiredTimer). A final +inf watermark flushes the rest —
    what the replay harness's sentinel pair does for the live run."""
    handle = _Handle()
    processor.init(handle)
    out: list[pd.DataFrame] = []
    wm = -(10**15)

    def fire_due():
        while True:
            due = [
                (exp, key)
                for key, timers in handle._timers.items()
                for exp in timers
                if exp <= wm
            ]
            if not due:
                return
            for exp, key in sorted(due):
                handle.activate(key)
                handle.deleteTimer(exp)
                out.extend(
                    processor.handleExpiredTimer(
                        key, _TimerValues(wm), _ExpiredTimerInfo(exp)
                    )
                )

    for chunk in chunks:
        for key, grp in chunk.groupby("user_id"):
            key = (int(key),)
            handle.activate(key)
            out.extend(
                processor.handleInputRows(key, iter([grp]), _TimerValues(wm))
            )
        wm = max(wm, int(chunk["ts_s"].max()) * 1000 - wm_delay_ms)
        fire_due()
    wm = 10**15
    fire_due()
    processor.close()
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=["user_id", "create_id", "create_ts_s", "status"])
    )


# ------------------------------------------------------------- tests


def test_tws_plan_builds_on_replay_stream(spark, sf_dir):
    # plan-time analysis succeeds; only the runner boot needs protobuf
    from gmall_flink_20_spark.streaming import replay

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("ts_s"),
        "event_type", "ts",
    )
    stream = replay.replay_stream(spark, ev, "ts", num_chunks=2)
    out = tws.order_timeout_stream_tws(
        stream.withWatermark("ts", "2 seconds"), horizon_s=HORIZON
    )
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "create_id", "create_ts_s", "status",
    ]


def test_tws_runtime_gated_on_protobuf():
    # the documented environmental ceiling: if this ever passes, the
    # live A/B is unblocked and the gate note in tws.py is stale
    with pytest.raises(ImportError):
        import google.protobuf  # noqa: F401


def test_tws_processor_matches_batch_oracle(spark, sf_dir):
    ev = (
        load_events(spark, sf_dir)
        .select(
            "user_id", "event_id", F.col("ts").cast("long").alias("ts_s"),
            "event_type",
        )
        .orderBy("ts_s", "event_id")
        .toPandas()
    )
    n = len(ev)
    chunks = [ev.iloc[: n // 3], ev.iloc[n // 3 : 2 * n // 3], ev.iloc[2 * n // 3 :]]
    got = _drive(tws.make_order_timeout_processor(HORIZON), chunks)
    exp = QUERIES["order_timeout"](spark, sf_dir).toPandas()
    key = ["user_id", "create_id", "create_ts_s", "status"]
    got_s = sorted(map(tuple, got[key].astype(object).values.tolist()))
    exp_s = sorted(map(tuple, exp[key].astype(object).values.tolist()))
    assert got_s == exp_s


def test_tws_processor_timer_rearm(spark):
    # two pendings with different deadlines: the first flush must re-arm
    # the timer for the second (the single-timer discipline), and a
    # purchase between them must consume only the in-horizon pending
    rows = pd.DataFrame(
        {
            "user_id": [1, 1],
            "event_id": [10, 11],
            "ts_s": [0, 20000],
            "event_type": ["view", "view"],
        }
    )
    out = _drive(tws.make_order_timeout_processor(HORIZON), [rows])
    assert sorted(out["create_id"].tolist()) == [10, 11]
    assert set(out["status"]) == {"timeout"}
